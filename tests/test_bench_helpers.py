"""Pure-driver tests for bench.py's A/B self-adjudication lookups (r12
verdict #3) and the one-string SQL literal renderer (r12 verdict #7) —
no SparkSession needed."""

from __future__ import annotations

import json

import pytest

from crypto_trading_data_pipeline_spark.operators.scale import render_sql_literal


def test_render_sql_literal_shapes():
    assert render_sql_literal(3) == "3L"
    assert render_sql_literal(-7) == "-7L"
    assert render_sql_literal(True) == "true"
    assert render_sql_literal(1.5) == "CAST(1.5 AS DOUBLE)"
    assert render_sql_literal("o'k") == r"'o\'k'"
    assert render_sql_literal([1, 2]) == "array(1L,2L)"
    assert (
        render_sql_literal({"a": 1, "b": [0.5]})
        == "named_struct('a', 1L, 'b', array(CAST(0.5 AS DOUBLE)))"
    )


def test_render_sql_literal_float_repr_roundtrips():
    # The exactness contract: repr() is the shortest round-tripping
    # decimal, so the rendered token re-parses to the identical binary64.
    for x in (0.1, 1e-20, 123456.789012345, -2.5e300, 3.0000000000000004):
        tok = render_sql_literal(x)
        inner = tok[len("CAST(") : -len(" AS DOUBLE)")]
        assert float(inner) == x


def test_render_sql_literal_rejects_nonfinite_and_bad_names():
    with pytest.raises(ValueError):
        render_sql_literal(float("nan"))
    with pytest.raises(ValueError):
        render_sql_literal(float("inf"))
    with pytest.raises(ValueError):
        render_sql_literal({"not an ident!": 1})
    with pytest.raises(TypeError):
        render_sql_literal(object())


def _write(dirpath, name, rec):
    with open(dirpath / name, "w") as f:
        json.dump(rec, f)


def test_ab_adjudication_reads_both_record_shapes(tmp_path):
    import bench

    # Old shape: historical tree-name keys (r9), queries_best per label.
    _write(
        tmp_path,
        "SCALE_AB_OLD.json",
        {
            "r9_sha": "abc1234",
            "head": {"queries_best": {"q_x": 1.0}},
            "r9": {"queries_best": {"q_x": 2.0}},
        },
    )
    got = bench._ab_adjudication("q_x", str(tmp_path), "deadbee")
    assert got == {
        "file": "SCALE_AB_OLD.json",
        "head_best_sec": 1.0,
        "baseline_best_sec": 2.0,
        "baseline_sha": "abc1234",
        "ab_is_current_head": None,  # old record has no head_sha
    }
    # No coverage for an unknown query -> None (caller writes the
    # explicit "unadjudicated" marker).
    assert bench._ab_adjudication("q_missing", str(tmp_path), None) is None


def test_ab_adjudication_prefers_worst_deltas_and_head_sha(tmp_path):
    import bench

    _write(
        tmp_path,
        "SCALE_AB_SWEEPY.json",
        {
            "baseline_sha": "96e2d8e",
            "head_sha": "feedf00",
            "head": {"walls": [1]},
            "baseline": {"walls": [2]},
            "head_over_baseline_pct_shared": 0.5,
            "shared_n": 10,
            "worst_deltas": [
                {"q": "q_y", "head": 3.0, "baseline": 4.0, "delta": -1.0}
            ],
        },
    )
    got = bench._ab_adjudication("q_y", str(tmp_path), "feedf00")
    assert got["head_best_sec"] == 3.0
    assert got["baseline_best_sec"] == 4.0
    assert got["ab_is_current_head"] is True
    sweep = bench._sweep_ab_summary(str(tmp_path))
    assert sweep == {
        "file": "SCALE_AB_SWEEPY.json",
        "head_over_baseline_pct_shared": 0.5,
        "shared_n": 10,
        "baseline_sha": "96e2d8e",
    }
