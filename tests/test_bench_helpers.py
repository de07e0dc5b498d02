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


def test_prev_round_merges_summary_with_salvage_and_sidecar(tmp_path, monkeypatch):
    """Since r7 the driver-parsed final line holds only the 12 slowest
    queries; _load_previous_round must union it with the tail-salvaged
    full line and, when still below the coverage threshold, top up from
    the committed BENCH_LOCAL.json sidecar of the same sf."""
    import json

    # The coverage threshold scales with the real HEADLINE; pin a small
    # one so the 14-query fixture exercises accept-after-top-up.
    monkeypatch.setattr(bench, "HEADLINE", [f"q_{i}" for i in range(20)])

    # Driver round file: summary-parsed (2 queries) + a tail fragment of
    # the full line carrying 2 more.
    tail = '"q_c":0.30,"q_d":0.40,"errors":{},"n_ok":4,"sf":0.1}'
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps(
            {
                "rc": 0,
                "tail": tail,
                "parsed": {
                    "sf": 0.1,
                    "queries": {"q_a": 1.0, "q_b": 0.5},
                    "calib_sec": 0.3,
                },
            }
        )
    )
    # Committed sidecar: the full set, same sf.
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {f"q_{c}": 0.1 * i for i, c in enumerate("abcdefghijklmn")},
            }
        )
    )
    prev = bench._load_previous_round(0.1, here=str(tmp_path))
    assert prev["_round"] == 7 and prev["_calib_sec"] == 0.3
    # Parsed entries win over sidecar values; salvage fills q_c/q_d;
    # sidecar fills the rest.
    assert prev["q_a"] == 1.0 and prev["q_b"] == 0.5
    assert prev["q_c"] == 0.30 and prev["q_d"] == 0.40
    assert "q_n" in prev and len([k for k in prev if k.startswith("q_")]) == 14


def test_prev_round_skips_other_sf_sidecar(tmp_path):
    import json

    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"rc": 0, "tail": "", "parsed": {"sf": 0.1, "queries": {"q_a": 1.0}}})
    )
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"sf": 0.01, "queries": {f"q_{i}": 1.0 for i in range(50)}})
    )
    # Sidecar is another sf: no top-up, coverage too small, round skipped.
    assert bench._load_previous_round(0.1, here=str(tmp_path)) == {}


def test_at_risk_since_checked_rule():
    """Synthetic case for the changed-since-checked parity rule (r11 verdict
    #4): a file committed AFTER a query's latest driver-check round marks
    that query at risk; uncommitted edits always do; untouched files never
    do; queries without a driver row are the never-checked tier's job."""
    from .oracle_util import at_risk_since_checked

    latest = {"q_a": 6, "q_b": 6, "q_c": 11}
    files = {"q_a": "/r/mod1.py", "q_b": "/r/mod2.py", "q_c": "/r/mod2.py"}
    round_ts = {6: 1000.0, 11: 2000.0}
    # mod1 last committed before r6 evidence landed; mod2 after it (the r11
    # refactor-over-r6-evidence case) but before r11's evidence.
    file_ts = {"/r/mod1.py": 900.0, "/r/mod2.py": 1500.0}
    got = at_risk_since_checked(latest, files, file_ts, round_ts, dirty_files=set())
    assert got == {"q_b"}  # q_a untouched, q_c's evidence postdates the edit

    # Uncommitted edits trump commit timestamps entirely.
    got = at_risk_since_checked(
        latest, files, file_ts, round_ts, dirty_files={"/r/mod1.py"}
    )
    assert got == {"q_a", "q_b"}

    # Missing timestamps (shallow clone, unreadable file) fail open: no flag.
    got = at_risk_since_checked(latest, files, {}, round_ts, dirty_files=set())
    assert got == set()
