"""whatsapp_vectordb_spark — a PySpark-native vector analytics engine.

A from-scratch rebuild of the *capabilities* of the reference system
(Pisush/whatsapp-vectorDB: WhatsApp chat → embeddings → vector index →
top-k similarity queries; see SURVEY.md) as an idiomatic Spark engine:

- DataFrame/SQL declarative plans everywhere (Catalyst optimizes; no RDDs).
- Vector math via built-in higher-order functions (JVM-side, codegen'd).
- The single UDF surface (text → embedding) is an Arrow-batched pandas UDF.
- A parquet-backed vector index with upsert/fetch/stats (the Pinecone
  analog, reference upsert/upsert.go:38-215), partitionable by namespace.
- Extended LLM-data-pipeline surface: dedup (exact/MinHash/SimHash/
  Jaccard/embedding), ANN search (LSH / IVF), text analysis, multimodal
  column plumbing — all designed for 100 TB scale (broadcast small sides,
  partial aggregation, two-phase top-k, banded LSH instead of O(n^2)).
"""

__version__ = "0.1.0"

from whatsapp_vectordb_spark.session import get_spark  # noqa: F401
from whatsapp_vectordb_spark.embedder import embed_text, with_embedding  # noqa: F401
from whatsapp_vectordb_spark.index import VectorIndex  # noqa: F401
from whatsapp_vectordb_spark.operators.search import (  # noqa: F401
    search_text,
    topk,
    topk_batched,
)
