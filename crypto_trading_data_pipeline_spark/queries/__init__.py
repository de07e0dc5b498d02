"""Declared-query registry: name → (Spark callable, DuckDB oracle SQL).

This is the driver-facing inventory (SURVEY.md §2 "declared query" column).
Every operator the engine claims is registered here with

- a Spark implementation ``fn(spark, sf_dir) -> DataFrame``, and
- (when SQL-expressible) an equivalent ANSI-SQL string DuckDB runs on the
  same parquet fixtures for the order-insensitive hash-match check.

Oracle-matching conventions (SURVEY.md §5):
- alias every computed column identically on both sides;
- deterministic aggregates only (min_by/max_by ↔ arg_min/arg_max; unique ts);
- ROUND any double aggregate whose summation order differs between engines;
- timestamps emitted as TIMESTAMP_NTZ (session tz pinned UTC) ↔ DuckDB
  TIMESTAMP;
- integer widths matched (Spark int ↔ INTEGER, long ↔ BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a declared query."""

    def wrap(fn):
        # The decorated function must BE the query (same name, driver
        # signature). Catches the misplaced-decorator refactor bug at import
        # time instead of as a TypeError deep inside the driver run.
        if fn.__name__ != name:
            raise ValueError(
                f"@query({name!r}) applied to {fn.__name__!r} — decorator misplaced"
            )
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Importing the domain modules populates REGISTRY (order = SURVEY §2 order).
from . import reference_surface  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import llmdata  # noqa: E402,F401
from . import dedup_advanced  # noqa: E402,F401
from . import finance  # noqa: E402,F401
from . import corpus_ops  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver correctness-window rotation.
#
# The driver hash-checks only the FIRST 50 registry entries per round.
# Round 1 covered insertion-order entries 0-49; round 2 rotated the
# llmdata/dedup_advanced set + relational tail into the window
# (CORRECTNESS_r02.json: 47 green / 3 no_oracle-by-contract, zero
# mismatches). Round 3 (this window) rotates in the 23 queries that have
# never had a driver row — the whole finance family plus the r2-session
# additions — and every query NEWLY registered this round, padded to 50
# with r1-head entries (re-confirming the reference surface). Queries
# outside the window retain the identical DuckDB-oracle check in
# tests/test_oracle_parity.py. Keep
# tests/test_properties.py::test_driver_window_holds_rotated_queries in
# sync (it asserts the first 50 == _DRIVER_WINDOW).
# ---------------------------------------------------------------------------
_R3_NEVER_CHECKED = [
    # finance family — the only SURVEY §2 component (X22) with zero hard
    # driver signal before this round
    "q_rsi", "q_bollinger", "q_returns_volatility", "q_max_drawdown",
    # r2-session additions, registered after the r2 window cut
    "q_tfidf", "q_repetition_ratio", "q_bigram_freq", "q_containment",
    "q_contamination", "q_dedup_incremental", "q_map_funcs",
    "q_variant_json", "q_mode_per_group", "q_asof_nearest", "q_hll_union",
    "q_sessionize_islands", "q_event_paths", "q_rolling_dau",
    "q_winsorize", "q_equidepth", "q_sample_weighted",
    "q_disjunctive_filter", "q_idle_customers",
]

#: Queries first registered in round 3 — go straight into the window so
#: their first driver row lands the same round they ship.
_R3_NEW = [
    "q_neardup_components_star",
    "q_quality_gopher",
    "q_mixture_sample",
    "q_corpus_profile",
    "q_embed_outliers",
    "q_semdedup",
    "q_ann_pq",
]

#: r1-head entries used to pad the window to 50 (all driver-green in r1;
#: re-checking them re-confirms the reference surface stayed green).
_R1_PAD = [
    "q_ohlcv_1min", "q_scan_events", "q_cast_string", "q_json_extract",
    "q_decimal_cast_arith", "q_epoch_to_ts", "q_filter_eq",
    "q_filter_ts_range", "q_count_rows", "q_count_filtered", "q_group_sum",
    "q_open_close_minby", "q_upsert_last_wins", "q_candle_rollup_5min",
    "q_candle_gap_fill", "q_join_inner", "q_join_broadcast", "q_join_semi",
    "q_join_anti", "q_join_range", "q_join_range_asof", "q_topk_per_group",
    "q_topk_global", "q_set_ops", "q_rollup", "q_cube",
    "q_window_moving_avg", "q_count_distinct", "q_sliding_window",
    "q_session_window", "q_grouping_sets", "q_pricing_summary",
]

_WINDOW_SIZE = 50
_prio = _R3_NEVER_CHECKED + _R3_NEW
_DRIVER_WINDOW = (_prio + [n for n in _R1_PAD if n not in _prio])[:_WINDOW_SIZE]


def _rotate_window(priority: list[str]) -> None:
    head = [n for n in priority if n in REGISTRY]
    ordered = {n: REGISTRY[n] for n in head}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_window(_DRIVER_WINDOW)
