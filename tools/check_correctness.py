"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value multiset (floats pre-rounded by the queries
themselves). Usage::

    python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _scratch_root():
    from whatsapp_vectordb_spark.session import local_scratch_root

    return local_scratch_root()


# Per-process oracle-scratch isolation (VERDICT r8 #3): two concurrent
# harness processes on one box must not share the fixed persisted-oracle
# scratch (paths are baked into oracle SQL at harness import time, below).
# Respects an explicit caller override.
if "SPARK_GRAFT_ORACLE_SCRATCH" not in os.environ:
    import atexit
    import shutil
    import tempfile

    _scratch = tempfile.mkdtemp(prefix="wvs-scratch-gate-", dir=_scratch_root())
    os.environ["SPARK_GRAFT_ORACLE_SCRATCH"] = _scratch
    atexit.register(shutil.rmtree, _scratch, ignore_errors=True)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _type_problems(scols, sschema, ocols, otypes):
    """Round-4 lesson: the driver's value-hash is TYPE-sensitive (it goes
    through Arrow), while this gate's Python-value compare is type-blind.
    Three oracles whose final projection returned DuckDB HUGEINT (un-CAST
    SUM of integers / ``//`` results) passed here and hash-failed at the
    driver. Flag any final oracle column whose DuckDB type can't land in
    the same Arrow type as the Spark column: HUGEINT/UHUGEINT always,
    DECIMAL unless Spark is decimal, and int-vs-float family mismatches.
    """
    spark_types = {f.name: f.dataType.simpleString() for f in sschema.fields}
    INT = {"tinyint", "smallint", "int", "bigint"}
    problems = []
    for c, t in zip(ocols, otypes):
        ot = str(t).upper()
        st = spark_types.get(c, "")
        if ot in ("HUGEINT", "UHUGEINT"):
            problems.append(f"{c}: oracle {ot} (add CAST(... AS BIGINT))")
        elif ot.startswith("DECIMAL") and not st.startswith("decimal"):
            problems.append(f"{c}: oracle {ot} vs spark {st}")
        elif ot in ("DOUBLE", "FLOAT", "REAL") and st in INT:
            problems.append(f"{c}: oracle {ot} vs spark {st}")
        elif ot in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") and st == "double":
            problems.append(f"{c}: oracle {ot} vs spark {st}")
    return problems


def _multiset(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(_norm_cell(d[c]) for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> int:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # DRIVER-FAITHFUL session: the driver's gate runs a vanilla
    # SparkSession — no nanosAsLong, no pinned timezone, default shuffle
    # partitions. Any config a query NEEDS must be set by the query itself
    # (e.g. harness._events sets nanosAsLong at runtime). Round-3 lesson:
    # a tuned local session here masked an environment break that failed
    # at the driver.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.appName("correctness-check")
        .master(f"local[{cpus}]")
        # UI nicety only (keeps \r progress bars out of piped gate output);
        # not a query-semantics conf, so driver parity is unaffected
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # Fixture-contract preflight (round-5 verdict item 3): several oracles
    # hard-code structural constants of the testdata — embedding dim 64
    # (`CROSS JOIN range(0, 64)` unnests), while all doc-length synthesis
    # is exact per-row LATERAL (no caps left). If the driver regenerates
    # testdata with a different shape, fail HERE loudly instead of letting
    # a truncated oracle silently hash-mismatch (or worse, match on the
    # truncated prefix).
    ORACLE_DIM = 64
    try:
        dims = con.sql(
            "SELECT MIN(len(embedding)) AS lo, MAX(len(embedding)) AS hi FROM embeddings"
        ).fetchone()
    except Exception:
        dims = None  # partial sf dir without embeddings — vector queries will fail loudly themselves
    if dims is not None and dims != (ORACLE_DIM, ORACLE_DIM):
        print(
            f"FATAL fixture contract: embeddings dim min/max={dims}, but "
            f"oracles unnest exactly range(0, {ORACLE_DIM}) — regenerate "
            "the oracles' dim constant before trusting any vector query."
        )
        return 1

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sschema = sdf.schema
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            otypes = list(rel.types)
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        tp = _type_problems(scols, sschema, ocols, otypes)
        if tp:
            print(f"FAIL {name}: driver-hash-unsafe oracle types: {tp}")
            ok = False
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            ok = False
        else:
            sm, om = _multiset(srows, scols), _multiset(orows, ocols)
            if sm != om:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        else:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
