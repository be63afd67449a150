"""Schemas and constants for the vector-index data model.

Mirrors the reference's record shapes (SURVEY.md §1):

- ``UpsertData {id, values, metadata, namespace}`` (reference
  upsert/upsert.go:31-36) → :data:`VECTOR_RECORD_SCHEMA`, extended with the
  reference's own declared TODO of storing the source text with the vector
  (reference upsert/upsert.go:32, README.md:18).
- index DDL ``{name, dimension, metric}`` (reference upsert/upsert.go:68-72)
  → :data:`INDEX_REGISTRY_SCHEMA`.
- metrics ``cosine | euclidean | dotproduct`` (reference main.go:28,
  upsert/upsert.go:27).

The engine never hard-codes the reference's dimension 1536 (main.go:27);
dimension is a per-index property (testdata uses 64).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

METRICS = ("cosine", "euclidean", "dotproduct")

DEFAULT_METRIC = "cosine"

# One embedded record in a vector index (reference upsert/upsert.go:31-36,
# query-side main.go:41-55). `text` realizes the reference's metadata TODO.
VECTOR_RECORD_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("embedding", ArrayType(FloatType()), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("metadata", MapType(StringType(), StringType()), nullable=True),
        StructField("namespace", StringType(), nullable=True),
    ]
)

# Sparse vectors are modeled by the reference but never produced
# (main.go:45-48); kept for schema parity.
SPARSE_VECTOR_SCHEMA = StructType(
    [
        StructField("indices", ArrayType(IntegerType()), nullable=True),
        StructField("values", ArrayType(FloatType()), nullable=True),
    ]
)

INDEX_REGISTRY_SCHEMA = StructType(
    [
        StructField("name", StringType(), nullable=False),
        StructField("dimension", IntegerType(), nullable=False),
        StructField("metric", StringType(), nullable=False),
        StructField("created_at", TimestampType(), nullable=False),
    ]
)

# Parsed WhatsApp chat line (intent of reference embed/embed.go:98-111 +
# README.md:12 — typed columns the reference never materialized).
CHAT_MESSAGE_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), nullable=True),
        StructField("sender", StringType(), nullable=True),
        StructField("message", StringType(), nullable=True),
        StructField("parse_ok", StringType(), nullable=False),
    ]
)

# Driver-provided fixture tables (FIXTURES.md §2-3).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
