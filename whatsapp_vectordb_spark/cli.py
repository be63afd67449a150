"""The reference's action surface (SURVEY.md §2.8 C1-C4) as a thin CLI:
``embed``, ``upsert``, ``query`` — a user of the reference runs the same
three verbs here, minus the bugs (unreachable ``en`` branch, timestamp-
suffixed filenames the next step can't find, per-row HTTP).

    python -m whatsapp_vectordb_spark.cli embed  --input chat.txt --output emb/
    python -m whatsapp_vectordb_spark.cli upsert --root idx/ --index whatsapp-chat --input emb/
    python -m whatsapp_vectordb_spark.cli query  --root idx/ --index whatsapp-chat --text "hello" -k 5

``embed`` parses + embeds a chat export to parquet (and optionally the
reference's float-CSV for interchange); ``upsert`` loads records into a
named index (get-or-create, replace-by-id); ``query`` runs the flagship
top-k. Multiple actions per invocation work like the reference's
``strings.Fields`` dispatch: pass them comma-separated to ``--actions``.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

DEFAULT_INDEX = "whatsapp-chat"  # reference main.go:26
DEFAULT_DIM = 64


def embed_action(spark, input_path: str, output_path: str, dim: int, csv_compat: bool) -> dict:
    """3.1 restated: read.text → parse → filter(parse_ok) → pandas-UDF embed
    → parquet sink, counters as one aggregate (vs. the reference's per-row
    HTTP loop)."""
    from whatsapp_vectordb_spark.embedder import with_embedding
    from whatsapp_vectordb_spark.parse import parse_chat_lines, parse_counters, with_line_ids
    from whatsapp_vectordb_spark.sources.compat import write_embeddings_csv

    parsed = parse_chat_lines(spark.read.text(input_path))
    counters = parse_counters(parsed).head().asDict()
    ok = with_line_ids(parsed.where(F.col("parse_ok")))
    records = with_embedding(ok, "message", "embedding", dim=dim).select(
        "id",
        "ts",
        "sender",
        F.col("message").alias("text"),
        "embedding",
    )
    records.write.mode("overwrite").parquet(output_path)
    if csv_compat:
        write_embeddings_csv(records.where(F.col("embedding").isNotNull()), output_path + "_csv")
    return counters


def upsert_action(spark, root: str, index_name: str, input_path: str, dim: int) -> dict:
    """3.2 restated: embeddings parquet → get-or-create index →
    replace-by-id merge (vs. one HTTP POST per vector)."""
    from whatsapp_vectordb_spark.index import VectorIndex

    idx = VectorIndex.create_or_get(spark, root, index_name, dimension=dim)
    batch = spark.read.parquet(input_path)
    before = idx.read().count()
    idx.upsert(batch.select("id", "embedding", "text").withColumn("namespace", F.lit("")))
    after = idx.read().count()
    return {"index": index_name, "before": before, "after": after, "batch": batch.count()}


def query_action(spark, root: str, index_name: str, text: str, k: int, dim: int):
    """3.3 restated: embed query text, exact top-k with payload in the same
    select (no per-match fetch loops)."""
    from whatsapp_vectordb_spark.index import VectorIndex

    idx = VectorIndex.create_or_get(spark, root, index_name, dimension=dim)
    return idx.query(text, k=k)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="whatsapp_vectordb_spark")
    ap.add_argument("actions", help="comma-separated: embed,upsert,query")
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", default="embeddings_out")
    ap.add_argument("--root", default="vector_store")
    ap.add_argument("--index", default=DEFAULT_INDEX)
    ap.add_argument("--text", default=None)
    ap.add_argument("-k", type=int, default=1)  # reference topK=1, main.go:29
    ap.add_argument("--dim", type=int, default=DEFAULT_DIM)
    ap.add_argument("--csv-compat", action="store_true")
    args = ap.parse_args(argv)

    actions = [a.strip() for a in args.actions.split(",")]
    unknown = [a for a in actions if a not in ("embed", "upsert", "query")]
    if unknown:
        print(f"unknown action(s) {unknown} (embed|upsert|query)", file=sys.stderr)
        return 2

    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="wvs-cli")
    try:
        for action in actions:
            if action == "embed":
                out = embed_action(spark, args.input, args.output, args.dim, args.csv_compat)
                print(f"embed: {out}")
            elif action == "upsert":
                out = upsert_action(spark, args.root, args.index, args.output, args.dim)
                print(f"upsert: {out}")
            elif action == "query":
                rows = query_action(spark, args.root, args.index, args.text, args.k, args.dim)
                for r in rows.collect():
                    print(f"{r['id']}\t{r['score']:.6f}\t{r['text']}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
