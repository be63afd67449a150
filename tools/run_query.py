"""Run any registered query by name and show its result (dev loop).

    python tools/run_query.py <name> [sf_dir] [--explain] [--oracle] [--time[=N]]

- default sf_dir: /root/testdata/sf0.001 (fast)
- --explain: also print the formatted physical plan
- --oracle:  also run the DuckDB oracle side-by-side
- --time[=N]: quiet-box timing mode — N reps (default 3) of
  ``.count()`` on a fresh plan each rep (the bench protocol's action for
  count-style entries), print per-rep seconds + median, skip the
  show/oracle output. Used to (re)level BASELINE.md tripwires.
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

    timing = next((a for a in flags if a.startswith("--time")), None)
    if timing is not None:
        import time

        n_reps = int(timing.split("=", 1)[1]) if "=" in timing else 3
        spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
        times = []
        for i in range(n_reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
            print(f"rep {i + 1}: {times[-1]}s", flush=True)
        print(f"median: {sorted(times)[len(times) // 2]}s over {n_reps} reps")
        return

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
