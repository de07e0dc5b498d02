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

# ---------------------------------------------------------------------------
# Driver correctness-window rotation.
#
# The driver hash-checks only the FIRST 50 registry entries per round.
# Round 1 (CORRECTNESS_r01.json) covered insertion-order entries 0-49 —
# all green — leaving the entire llmdata/dedup_advanced set and the
# relational tail with local-pytest oracle coverage only. Rotate those 49
# (plus the new q_kmeans_assign) into the window so round 2 gets hard
# driver signal on the LLM-data north-star set; the r1-green head retains
# the identical DuckDB-oracle check in tests/test_oracle_parity.py.
#
# ROUND 3 PLAN: once CORRECTNESS_r02 lands green for this window, rotate
# again — replace _R2_WINDOW with the queries that have never had a driver
# row: everything registered AFTER the window (r2 additions: q_tfidf,
# q_repetition_ratio, q_bigram_freq, q_disjunctive_filter,
# q_idle_customers, q_sessionize_islands, q_event_paths, q_containment,
# q_contamination, q_rolling_dau, q_rsi, q_bollinger,
# q_returns_volatility, q_max_drawdown, q_winsorize, q_equidepth,
# q_sample_weighted, q_map_funcs, q_variant_json, q_hll_union,
# q_dedup_incremental, q_mode_per_group, q_asof_nearest, ...), padding the
# remainder of the 50 with r1-head entries. Keep
# tests/test_properties.py::test_driver_window_holds_rotated_queries in
# sync.
# ---------------------------------------------------------------------------
_R2_WINDOW = [
    # dedup / near-dup family
    "q_dedup_exact", "q_dedup_norm", "q_dedup_keep_best",
    "q_minhash_sig", "q_lsh_pairs", "q_ngram_jaccard", "q_simhash",
    "q_simhash_pairs", "q_minhash_est_jaccard", "q_embed_neardup",
    "q_neardup_dedup", "q_neardup_components",
    # similarity search / clustering
    "q_cosine_topk", "q_cosine_topk_pandas", "q_ann_ivf", "q_ann_lsh",
    "q_kmeans_assign", "q_kmeans_ivf",
    # text analysis
    "q_token_stats", "q_token_regex", "q_term_freq", "q_doc_fingerprint",
    "q_fingerprint_rolling", "q_lang_id", "q_quality_score",
    "q_edit_distance",
    # chunking / packing / sampling / e2e
    "q_chunk_docs", "q_pack_greedy", "q_split_assign", "q_sample_hash",
    "q_sample_stratified", "q_corpus_prep", "q_array_funcs",
    "q_multimodal_features",
    # relational tail unchecked in r1
    "q_retention_cohort", "q_ship_priority", "q_exists_subquery",
    "q_having_in", "q_window_range_frame", "q_unpivot", "q_not_exists",
    "q_scd2_intervals", "q_dq_profile", "q_math_funcs", "q_regression",
    "q_anomaly_zscore", "q_approx_percentile", "q_histogram", "q_cumsum",
    "q_new_vs_returning",
]


def _rotate_window(priority: list[str]) -> None:
    head = [n for n in priority if n in REGISTRY]
    ordered = {n: REGISTRY[n] for n in head}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_window(_R2_WINDOW)
