"""Band-width sensitivity for the slowest sweep query (VERDICT r11 #6).

``multimodal_decode_phash_near_dup`` was the r11 sweep's slowest row
(20.3 s at sf0.01, 13,679 verified pairs). This records pair count and
wall time at band_bits ∈ {8, 16} so the output volume is demonstrably
the cost driver, not an accidental band collapse:

- recall is pigeonhole-GUARANTEED at both settings (n_bands = 8 resp. 4,
  both > max_hamming = 3), so the VERIFIED pair set must be identical —
  asserted in-run; a difference means a banding bug, not tuning.
- candidate volume is what moves: 8-bit bands have only 256 distinct
  values per band, so bands go hot and the equi-join fans out; 16-bit
  bands keep candidates near the true pair count.

    python tools/stress_phash_bands.py [sf_dir] [reps]

Prints one JSON line per setting (reps timed after one untimed warm-up;
median reported) and a final combined line for BASELINE.md.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _scratch_root():
    from whatsapp_vectordb_spark.session import local_scratch_root

    return local_scratch_root()


if "SPARK_GRAFT_ORACLE_SCRATCH" not in os.environ:
    import atexit
    import shutil
    import tempfile

    _scratch = tempfile.mkdtemp(prefix="wvs-scratch-phash-", dir=_scratch_root())
    os.environ["SPARK_GRAFT_ORACLE_SCRATCH"] = _scratch
    atexit.register(shutil.rmtree, _scratch, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from whatsapp_vectordb_spark.harness.multimodal import (
        multimodal_decode_phash_near_dup,
    )
    from whatsapp_vectordb_spark.session import get_spark

    spark = get_spark(app_name="phash-band-sensitivity")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup

    out: dict = {"sf_dir": sf_dir, "reps": reps}
    pair_sets: dict[int, frozenset] = {}
    for band_bits in (16, 8):
        rows = multimodal_decode_phash_near_dup(
            spark, sf_dir, band_bits=band_bits
        ).collect()  # untimed warm-up + the pair set for the equality assert
        pair_sets[band_bits] = frozenset(
            (r["id_a"], r["id_b"], r["hamming"]) for r in rows
        )
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n = multimodal_decode_phash_near_dup(
                spark, sf_dir, band_bits=band_bits
            ).count()
            times.append(round(time.perf_counter() - t0, 2))
        out[f"bb{band_bits}_pairs"] = len(pair_sets[band_bits])
        out[f"bb{band_bits}_count_check"] = n
        out[f"bb{band_bits}_times"] = times
        out[f"bb{band_bits}_median_s"] = round(statistics.median(times), 2)
        print(json.dumps(out), flush=True)

    # pigeonhole guarantee: the verified sets are the SAME at both widths
    assert pair_sets[8] == pair_sets[16], (
        f"verified pair sets differ: {len(pair_sets[8])} vs {len(pair_sets[16])}"
    )
    out["pair_sets_equal"] = True
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
