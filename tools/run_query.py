"""Run any registered query by name and show its result (dev loop).

    python tools/run_query.py <name> [sf_dir] [--explain] [--oracle]

- default sf_dir: /root/testdata/sf0.001 (fast)
- --explain: also print the formatted physical plan
- --oracle:  also run the DuckDB oracle side-by-side
- no name:   list all registered query names
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}

    from whatsapp_vectordb_spark.harness import ORACLES, QUERIES

    if not args:
        for n in sorted(QUERIES):
            print(n)
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    if name not in QUERIES:
        sys.exit(f"unknown query {name!r}; run with no args to list all")

    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name=f"run-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    if "--explain" in flags:
        em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        print(df._jdf.queryExecution().explainString(em))
    df.show(50, truncate=120)
    print(f"rows: {df.count()}")

    if "--oracle" in flags and name in ORACLES:
        import duckdb

        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        res = con.sql(ORACLES[name])
        print("oracle:")
        print(res.df().head(50).to_string())
    spark.stop()


if __name__ == "__main__":
    main()
