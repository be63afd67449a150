"""Unit tests for the driver-side tooling (no Spark session needed)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "sweep_registry", os.path.join(REPO, "tools", "sweep_registry.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sweep_flags_only_material_regressions():
    sweep = _load_sweep()
    prev = {"a": 1.0, "b": 0.1, "c": 2.0, "d": 0.2}
    now = {
        "a": 3.5,   # 3.5x over floor -> flagged
        "b": 0.35,  # 3.5x but both sub-floor -> noise, not flagged
        "c": 2.5,   # 1.25x -> fine
        "d": 0.9,   # 4.5x, new value over floor -> flagged
        "e": 9.9,   # no baseline -> never flagged
    }
    got = sweep._flag_regressions(now, prev)
    assert set(got) == {"a", "d"}
    assert got["a"]["ratio"] == 3.5
    assert got["d"]["prev_s"] == 0.2 and got["d"]["now_s"] == 0.9


def test_sweep_next_round_tracks_correctness_files():
    sweep = _load_sweep()
    # this repo has CORRECTNESS_r01..r07 -> the sweep labels itself r08
    assert sweep._next_round() == 8


def test_sweep_prev_sweep_reads_newest():
    sweep = _load_sweep()
    name, data = sweep._prev_sweep()
    assert name == "SWEEP_r08.json"
    assert data["n_queries"] == 190 and len(data["times"]) == 190
