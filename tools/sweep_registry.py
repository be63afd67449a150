"""Once-per-round wall-clock sweep of the ENTIRE query registry at sf0.01.

bench.py times ~40 headline queries with a median-of-reps protocol; the
other ~150 registry entries had no timing record at all, so a pathological
regression (a lost broadcast, an accidental cartesian) in a non-headline
query would be invisible until it timed out the driver gate. This sweep
runs every ``queries()`` entry ONCE (single rep, wall clock only — it is a
tripwire, not a benchmark), writes ``SWEEP_r{N}.json`` at the repo root,
and flags any query whose time grew more than ``FLAG_RATIO``× over the
newest previous sweep (single-run noise on this shared box is ±50%, so 3×
is far outside noise for all but sub-100ms entries; those are additionally
guarded by the absolute floor).

CADENCE RULE (VERDICT r10 item 8): run the sweep EVERY ROUND, or at the
latest every other round, so the 3× tripwire always compares against a
≤2-round-old baseline (r8 → r10 → r11 → …). A sweep older than that
re-opens the blind spot this tool exists to close.

PARITY RULE (VERDICT r11 item 4): the sweep records the exact query-name
set it ran (``query_names``), and ``--check`` compares the CURRENT
registry against the newest sweep — exit 1 if any registered query has
no sweep row (the r11 gap: ann_sq8_euclidean_topk registered after the
sweep ran, and nothing flagged it). Run ``--check`` as the LAST gate of
a round, after the final registration and the final sweep.

Usage::

    python tools/sweep_registry.py [sf_dir] [out_json]
    python tools/sweep_registry.py --check

Defaults: sf_dir=/root/testdata/sf0.01, out=SWEEP_r{max_round+1}.json
(round inferred from existing CORRECTNESS_r*.json). Exit code 1 if any
query errored or was flagged.
"""

from __future__ import annotations

import glob
import json
import os
import re
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

    _scratch = tempfile.mkdtemp(prefix="wvs-scratch-sweep-", dir=_scratch_root())
    os.environ["SPARK_GRAFT_ORACLE_SCRATCH"] = _scratch
    atexit.register(shutil.rmtree, _scratch, ignore_errors=True)

FLAG_RATIO = 3.0
FLAG_FLOOR_S = 0.5  # both runs under this → timer noise, never flag


def _next_round(repo: str = REPO) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)", os.path.basename(p)))
    ]
    return (max(rounds) + 1) if rounds else 1


def _flag_regressions(times: dict, prev_times: dict) -> dict:
    """Queries whose time grew > FLAG_RATIO× vs the previous sweep.
    Sub-floor pairs (both runs < FLAG_FLOOR_S) are timer noise and never
    flag; queries absent from the previous sweep have no baseline."""
    flagged = {}
    for name, sec in times.items():
        old = prev_times.get(name)
        if (
            old is not None
            and max(old, sec) >= FLAG_FLOOR_S
            and old > 0
            and sec / old > FLAG_RATIO
        ):
            flagged[name] = {"prev_s": old, "now_s": sec, "ratio": round(sec / old, 2)}
    return flagged


def _prev_sweep(repo: str = REPO) -> tuple[str, dict] | tuple[None, None]:
    paths = sorted(
        glob.glob(os.path.join(repo, "SWEEP_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not paths:
        return None, None
    with open(paths[-1]) as f:
        return os.path.basename(paths[-1]), json.load(f)


def registry_sweep_gap(registry_names: set, sweep: dict | None) -> list[str]:
    """Names in the current registry with NO row in the given sweep —
    the set that must be empty for the round to close. Uses the sweep's
    recorded ``query_names`` when present (r12+), else falls back to
    times∪errors keys (older sweeps)."""
    if sweep is None:
        return sorted(registry_names)
    covered = set(
        sweep.get("query_names")
        or (list(sweep.get("times", {})) + list(sweep.get("errors", {})))
    )
    return sorted(registry_names - covered)


def check() -> None:
    """--check: refuse a round whose newest registration postdates the
    newest sweep. Imports the registry WITHOUT starting Spark."""
    prev_name, prev = _prev_sweep()
    import __spark_entry__ as entry

    gap = registry_sweep_gap(set(entry.queries()), prev)
    if gap:
        print(
            f"PARITY FAIL: {len(gap)} registered quer"
            f"{'y has' if len(gap) == 1 else 'ies have'} no row in "
            f"{prev_name or '<no sweep found>'}: {', '.join(gap)}\n"
            "Run tools/sweep_registry.py again before closing the round.",
            file=sys.stderr,
        )
        sys.exit(1)
    print(f"parity OK: every registry query has a row in {prev_name}")
    sys.exit(0)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--check":
        check()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    explicit_out = len(sys.argv) > 2
    out_path = (
        sys.argv[2]
        if explicit_out
        else os.path.join(REPO, f"SWEEP_r{_next_round():02d}.json")
    )
    if not explicit_out and os.path.exists(out_path):
        # _next_round infers from CORRECTNESS files, which lag the sweep
        # within a round — a same-round rerun would silently destroy the
        # committed baseline it is ABOUT to compare against
        print(
            f"refusing to overwrite {out_path} — pass an explicit out path "
            "(e.g. /tmp/sweep.json) for a same-round re-run",
            file=sys.stderr,
        )
        sys.exit(2)
    prev_name, prev = _prev_sweep()
    prev_times = (prev or {}).get("times", {})

    import __spark_entry__ as entry
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="wvs-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM/py-worker warmup

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    qs = entry.queries()
    for i, (name, fn) in enumerate(sorted(qs.items()), 1):
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            errors[name] = f"{type(e).__name__}: {e}"[:300]
        spark.catalog.clearCache()
        if i % 20 == 0:
            print(f"... {i}/{len(qs)}", file=sys.stderr, flush=True)

    flagged = _flag_regressions(times, prev_times)

    out = {
        "metric": "registry_sweep",
        "sf_dir": sf_dir,
        "query_names": sorted(qs),
        "n_queries": len(qs),
        "n_ok": len(times),
        "total_s": round(sum(times.values()), 1),
        "prev_sweep": prev_name,
        "flag_ratio": FLAG_RATIO,
        "flagged": flagged,
        "errors": errors,
        "times": times,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(
        json.dumps(
            {k: out[k] for k in ("n_queries", "n_ok", "total_s", "prev_sweep", "flagged", "errors")}
        )
    )
    print(f"wrote {out_path}", file=sys.stderr)
    spark.stop()
    sys.exit(1 if (flagged or errors) else 0)


if __name__ == "__main__":
    main()
