"""Unit tests for bench.py's round-over-round comparison helpers.

No SparkSession: these exercise the pure-Python regression accounting that
decides what BENCH_r{N}.json reports, so a bug here silently corrupts the
per-round perf evidence rather than any query result.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _names(entries):
    return [e["query"] for e in entries]


def test_regression_requires_both_bounds():
    prev = {"_round": 6, "qa": 1.0, "qb": 0.05, "qc": 10.0}
    # qa: +40 % and +0.4 s -> regression; qb: +300 % but only +0.15 s
    # (absolute bound saves sub-second noise); qc: +1 s but only +10 %
    # (relative bound saves big plans from fixed drift).
    timings = {"qa": 1.4, "qb": 0.2, "qc": 11.0}
    deltas, raw, norm = bench._compare_to_previous(timings, prev)
    assert _names(raw) == ["qa"]
    assert deltas == {"qa": 0.4, "qb": 0.15, "qc": 1.0}
    # No calibration ratio: the normalized list must equal the raw one.
    assert _names(norm) == ["qa"]


def test_calibration_ratio_explains_uniform_drift():
    prev = {"_round": 6, "qa": 1.0}
    timings = {"qa": 1.4}
    # Box measured 1.5x slower: 1.4/1.5 = 0.93 < 1.0 -> environment.
    _, raw, norm = bench._compare_to_previous(timings, prev, calib_ratio=1.5)
    assert _names(raw) == ["qa"] and norm == []
    # A genuine regression survives normalization.
    _, raw, norm = bench._compare_to_previous(
        {"qa": 2.5}, prev, calib_ratio=1.5
    )
    assert _names(raw) == _names(norm) == ["qa"]
    assert norm[0]["now_normalized_sec"] == round(2.5 / 1.5, 3)


def test_faster_box_never_hides_regressions():
    # calib_ratio < 1 (box FASTER than prev round) must clamp to 1 --
    # dividing by a sub-1 ratio would inflate `now` and manufacture
    # regressions; scaling the other way would hide real ones.
    prev = {"_round": 6, "qa": 1.0, "qb": 1.0}
    timings = {"qa": 1.4, "qb": 1.1}
    _, raw, norm = bench._compare_to_previous(timings, prev, calib_ratio=0.5)
    assert _names(raw) == _names(norm) == ["qa"]


def test_prev_round_skips_non_numeric_entries():
    prev = {"_round": 6, "qa": "err: boom", "qb": 0.0}
    deltas, raw, norm = bench._compare_to_previous({"qa": 1.0, "qb": 1.0}, prev)
    assert deltas == {} and raw == [] and norm == []
