"""Physical-plan quality gates (the 100 TB posture, asserted).

Correctness tests prove the small-SF answer; these prove the PLAN is the
one we'd want on a 1000-executor cluster: filters reach the parquet scan,
dimension joins broadcast instead of shuffling the fact side, aggregates
are partial+final around a single exchange, and no registered query ever
falls back to row-at-a-time Python.
"""

from __future__ import annotations

import pytest

from crypto_trading_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def all_plans(spark):
    """One registry-wide plan pass shared by every sweep gate: building
    136 physical plans costs ~45 s, and doing it once instead of once per
    gate is most of the suite-runtime budget (VERDICT r5 #7). Returns
    (plans, build_failures) — a failed build is a finding for EVERY gate,
    so each sweep re-reports it."""
    from concurrent.futures import ThreadPoolExecutor

    plans: dict[str, str] = {}
    build_failures: dict[str, str] = {}

    def build(name):
        try:
            return name, plan_of(spark, name), None
        except Exception as exc:  # noqa: BLE001 — a broken plan IS the finding
            return name, None, (
                f"PLAN BUILD FAILED: {(str(exc).splitlines() or [''])[0][:200]}"
            )

    # Plan building is driver-side Catalyst work behind py4j (GIL released
    # during the JVM call), so a thread pool cuts the registry-wide pass
    # ~4x. DataFrame construction and planning are thread-safe.
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, plan, err in pool.map(build, list(REGISTRY)):
            if err:
                build_failures[name] = err
            else:
                plans[name] = plan
    return plans, build_failures


def sweep_plans(all_plans, check) -> None:
    """Run ``check(name, plan)`` over the shared plan pass, collecting
    failures instead of dying at the first one. In round 4 a single
    plan-time AnalysisException made all three registry-wide gates fail
    with the same opaque traceback; now one broken query costs one named
    entry in one failure message and every other query still gets checked."""
    plans, build_failures = all_plans
    failures: list[str] = [f"{n}: {m}" for n, m in build_failures.items()]
    for name, plan in plans.items():
        try:
            check(name, plan)
        except AssertionError as exc:
            failures.append(f"{name}: {exc}")
    if failures:
        pytest.fail(
            f"{len(failures)}/{len(REGISTRY)} queries failed the gate:\n"
            + "\n".join(failures)
        )



def cached_plan(all_plans, name: str) -> str:
    plans, build_failures = all_plans
    assert name not in build_failures, build_failures[name]
    return plans[name]

def test_filter_pushdown_reaches_parquet(all_plans):
    plan = cached_plan(all_plans, "q_filter_eq")
    assert "PushedFilters: [" in plan
    # The equality predicate itself must be pushed, not just IsNotNull.
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "EqualTo" in pushed, pushed


def test_ts_range_pushdown(all_plans):
    """The nanos->timestamp conversion must not hide the range predicate
    from parquet (io.events_between exists exactly for this)."""
    plan = cached_plan(all_plans, "q_filter_ts_range")
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual" in pushed or "LessThan" in pushed, pushed


def test_dim_joins_broadcast_not_shuffle(all_plans):
    """Star joins against region/nation/supplier must be broadcast: a
    sort-merge join here would shuffle the fact table once PER DIM."""
    for q in ["q_join_broadcast", "q_revenue_by_nation"]:
        plan = cached_plan(all_plans, q)
        assert "BroadcastHashJoin" in plan, q
    plan = cached_plan(all_plans, "q_join_broadcast")
    assert "SortMergeJoin" not in plan, "dim join degraded to shuffle join"


def test_aggregate_is_partial_final(all_plans):
    """Keyed aggregates must map-side combine: two HashAggregate levels
    around exactly one key exchange, so the shuffle carries one row per
    (key x input partition), not one per input row."""
    plan = cached_plan(all_plans, "q_group_sum")
    assert plan.count("HashAggregate") >= 2, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_ohlcv_single_shuffle(all_plans):
    plan = cached_plan(all_plans, "q_ohlcv_1min")
    assert plan.count("Exchange hashpartitioning") == 1, (
        "flagship candle agg must shuffle exactly once"
    )


def test_no_row_python_anywhere(all_plans):
    """Row-at-a-time Python UDFs (BatchEvalPython) are banned in every
    registered query; Python is allowed only Arrow-batched (mapInPandas /
    applyInPandas show as *InPandas operators)."""

    def check(name, plan):
        assert "BatchEvalPython" not in plan, "uses row-Python"

    sweep_plans(all_plans, check)


def test_global_topk_avoids_full_sort(all_plans):
    """Global top-k must plan as TakeOrderedAndProject (per-partition heap +
    driver merge), never a full Sort + Limit."""
    plan = cached_plan(all_plans, "q_topk_global")
    assert "TakeOrderedAndProject" in plan, plan


def test_scan_prunes_columns(all_plans):
    """q_dedup_exact touches doc metadata but never the embedding-sized
    props payloads of events — its documents scan must read only the
    referenced columns."""
    plan = cached_plan(all_plans, "q_count_filtered")
    scan = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "props" not in scan and "value" not in scan, scan


def test_sql_broadcast_hint(spark):
    """The SQL hint surface must reach the planner: /*+ BROADCAST */ on a
    dim table plans a BroadcastHashJoin even with auto-broadcast off."""
    from crypto_trading_data_pipeline_spark.io import read_table

    read_table(spark, SF, "lineitem").createOrReplaceTempView("li_hint")
    read_table(spark, SF, "supplier").createOrReplaceTempView("s_hint")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.sql(
            """
            SELECT /*+ BROADCAST(s_hint) */ s_name, count(*) AS n
            FROM li_hint JOIN s_hint ON l_suppkey = s_suppkey
            GROUP BY s_name
            """
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_exists_decorrelates_to_semi_join(all_plans):
    """Correlated EXISTS must plan as one LEFT SEMI join, not a per-row
    subquery (RewritePredicateSubquery)."""
    plan = cached_plan(all_plans, "q_exists_subquery")
    assert "LeftSemi" in plan, plan


def test_having_in_plans_semi_join(all_plans):
    plan = cached_plan(all_plans, "q_having_in")
    assert "LeftSemi" in plan, plan


def test_ship_priority_topk_and_broadcast(all_plans):
    """Q3 shape: global top-10 must be TakeOrderedAndProject and the
    customer dim must broadcast."""
    plan = cached_plan(all_plans, "q_ship_priority")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_unpivot_is_narrow(all_plans):
    """Unpivot is an Expand — 3 output rows per input row, zero shuffles."""
    plan = cached_plan(all_plans, "q_unpivot")
    assert "Expand" in plan, plan
    assert "Exchange" not in plan, "unpivot must not shuffle"


def test_range_frame_single_shuffle(all_plans):
    """Rolling 1-hour window: one exchange on user_id, one Window node —
    never a time self-join."""
    plan = cached_plan(all_plans, "q_window_range_frame")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan, plan
    assert "Join" not in plan, "range frame degraded to self-join"


def test_pack_greedy_sharded_window(all_plans):
    """The packing running sum must be sharded: a global ORDER BY window
    plans an Exchange SinglePartition and serializes the table through one
    task — the r1 scale-killer, fixed by hash-sharding the window key."""
    plan = cached_plan(all_plans, "q_pack_greedy")
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" in plan, plan


def test_not_exists_plans_anti_join(all_plans):
    """Correlated NOT EXISTS must rewrite to one LEFT ANTI join with the
    inequality riding in the join condition."""
    plan = cached_plan(all_plans, "q_not_exists")
    assert "LeftAnti" in plan, plan


def test_scd2_single_shuffle(all_plans):
    """lead() intervals: one exchange on user_id, no self-join."""
    plan = cached_plan(all_plans, "q_scd2_intervals")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_blocked_pair_joins_key_on_length_bucket(all_plans):
    """Candidate-pair self-joins must shuffle on (lang, length-bucket), not
    lang alone: a handful of languages as the only equi-key is a guaranteed
    hot-key shuffle at corpus scale. bkt_a/bkt_b exist solely as join keys,
    so their presence proves the bucketed key reached the physical join."""
    for q in ["q_ngram_jaccard", "q_edit_distance", "q_containment"]:
        plan = cached_plan(all_plans, q)
        assert "bkt_a" in plan and "bkt_b" in plan, q


#: Queries allowed an Exchange SinglePartition: each computes a global
#: scalar aggregate somewhere in the plan (a one-row exchange is the
#: correct way to finalize it). Everything else must stay key-partitioned.
_SINGLE_PARTITION_OK = {
    "q_count_rows",        # global count
    "q_count_filtered",    # global count
    "q_dq_profile",        # whole-table profile row
    "q_disjunctive_filter",# global revenue scalar
    "q_idle_customers",    # uncorrelated avg(acctbal) scalar subquery
    "q_tfidf",             # corpus-size scalar
    "q_hll_union",         # global sketch-union row (|langs| sketches -> 1)
    "q_mixture_sample",    # corpus budget/quota scalar (one-row broadcast)
    "q_dq_orphans",        # five global orphan-count scalars, unioned
    "q_global_shuffle",    # 256-row bucket-offset cumsum (bounded)
    "q_skyline",           # ~50-row bucket-max cumulative pass (bounded)
    "q_unigram_lm",        # one-row (total, vocab) LM normalizer scalar
    "q_benford",           # 9-row digit-frequency normalizing window
    "q_psi",               # 11-row bin-proportion normalizing window
    "q_lorenz",            # 1-row stats + 256-row offset cumsum + 10-row
                           # decile cumulative (all bounded)
    "q_hll_portable",      # global exact-countDistinct comparison scalar
                           # (the sketch side itself stays key-partitioned)
    "q_triangle_count",    # three global scalar counts (edges/wedges/
                           # triangles) finalized into the one audit row
    "q_target_encoding",   # one-row global (n_tot, pos_tot) prior broadcast
    "q_embed_covariance",  # one-row global n scalar in the centering step
    "q_bm25",              # one-row (n, avgdl) scalar + 10-row rank window
                           # over the already-limited top-k
    "q_cooccur_ppmi",      # one-row t1/tp PPMI normalizer scalars
    "q_cooccur_ppmi_pruned",  # same one-row t1/tp scalars, pruned world
    "q_ks_test",           # one-row (n_ref, n_cur) totals + <=201-row
                           # bucket-offset cumsum + one-row final D max
    "q_chi_square",        # one-row n / dof scalars + one-row chi2 sum
    "q_mutual_info",       # one-row corpus-count normalizer scalar
    "q_bigram_lm",         # one-row vocab-size smoothing scalar
    "q_temperature_mix",   # one-row mixing-denominator scalar
    "q_auc_roc",           # one-row (n_pos, n_neg) totals + ~1e3-row
                           # score-bucket-offset cumsum + one-row AUC sum
                           # (the q_ks_test construction)
    "q_rfm_segments",      # three 1-row rank stats + three <=256-row
                           # offset cumsums (exact_global_rank x3)
    "q_market_basket",     # 1-row n_orders scalar
    "q_vocab_coverage",    # 1-row occurrence total + <=1000-row rank
                           # window over the already-limited top-k
    "q_funnel_windowed",   # three 1-row step-count scalars joined into
                           # the one funnel report row
    "q_rrf_fusion",        # inherits q_bm25's one-row (n, avgdl) scalar;
                           # every rank window sorts an already-limited
                           # <=50-row pool
    "q_pairs_spread",      # 1-row pair-moment + hedge-ratio + stats
                           # scalars, each broadcast back onto the pair rows
    "q_heavy_hitters",     # 1-row token-total scalar the threshold rides
    "q_naive_bayes",       # 1-row (vocab, n_train) smoothing scalar
    "q_dsir_weights",      # 1-row (r_tot, t_tot) distribution totals
    "q_kneser_ney",        # 1-row bigram-type total scalar
    "q_kaplan_meier",      # windows over the |distinct durations| table,
                           # bounded by the observation span in days
    "q_ab_test",           # 4-count experiment rollup into the 1-row report
    "q_ndcg",              # inherits q_bm25's one-row (n, avgdl) scalar;
                           # grade histogram is a one-row global count and
                           # DCG/IDCG finalize over <=10-row tables
    "q_skew_audit",        # 1-row (n_rows, n_keys) totals + the global
                           # top-10 limit finalize (both bounded)
    "q_woe_iv",            # 1-row (g_tot, b_tot) smoothing totals over
                           # the <=10-bin cell table
    "q_lift_gain",         # one-row (n_tot, p_tot) totals + ~1e3-row
                           # score-bucket-offset cumsum (the q_auc_roc
                           # construction)
    "q_mrr",               # inherits q_bm25's one-row (n, avgdl) scalar;
                           # the mrr finalize aggregates the |terms|-row
                           # (=3) rank table into the 1-row mean
    "q_semdedup",          # 1-row coarse-stride scalar (floor(sqrt(k2)))
                           # riding the plan instead of a driver count()
                           # action — BNLJ onto the k2-row fine table
    "q_semdedup_capacity", # inherits q_semdedup's 1-row coarse-stride
                           # scalar (same _ivf_assign_hier assignment);
                           # its own finalize groups on the 6-value
                           # size_class key, bounded by construction
    "q_pq_train",          # 4 one-row per-subspace SSE scalars over the
                           # FIXED 500-row training sample, broadcast-
                           # joined onto the 512-row codebook table
    "q_index_rebalance",   # 1-row max/sum imbalance scalar over the
                           # localCheckpointed k-row population table
}


def test_no_unjustified_single_partition_or_cartesian(all_plans):
    """Global sweep: Exchange SinglePartition only where a one-row scalar
    aggregate justifies it (the q_pack_greedy lesson, enforced registry-
    wide), and CartesianProduct nowhere — a cross join must ride a
    broadcast nested-loop, never a full shuffle product."""
    def check(name, plan):
        assert "CartesianProduct" not in plan, "plans a CartesianProduct"
        if name not in _SINGLE_PARTITION_OK:
            assert "Exchange SinglePartition" not in plan, (
                "unjustified Exchange SinglePartition"
            )

    sweep_plans(all_plans, check)


def test_tfidf_vocab_join_not_hint_broadcast(spark):
    """The term->document-frequency aggregate is |vocab| rows — tens of GB
    on a web corpus, over Spark's broadcast cap — so q_tfidf must NOT pin
    it with a broadcast hint (the r2 scale-killer). A hint forces
    BroadcastHashJoin even with auto-broadcast off; a stats-driven choice
    reverts to a shuffled term join. Assert the revert happens: with the
    threshold at -1 the vocab join plans as SortMergeJoin and no
    BroadcastHashJoin appears (the one-row corpus-count broadcast rides a
    BroadcastNestedLoopJoin and is fine).

    Conf is flipped AFTER building the DataFrame: read_table re-applies the
    engine runtime conf (including the 64 MB threshold), so setting it
    first would be silently undone; planning reads the conf lazily at
    executedPlan access."""
    df = REGISTRY["q_tfidf"].fn(spark, SF)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "BroadcastHashJoin" not in plan, (
        "vocab aggregate is hint-broadcast — dies at web-corpus scale:\n" + plan
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_triangle_degree_tables_not_hint_broadcast(spark):
    """q_triangle_count's degree tables are |V|-sized — a broadcast HINT on
    them OOMs the driver at power-law-graph vertex cardinalities (VERDICT
    r7 #3; the hints were removed, this pins the removal). Same probe as
    the tfidf vocab test: with auto-broadcast off, a hint would still
    force BroadcastHashJoin; hint-free, every |V|- or |E|-scaling join
    must revert to a shuffle join. The 1-row scalar-count finalizers may
    keep their BroadcastNestedLoopJoin."""
    df = REGISTRY["q_triangle_count"].fn(spark, SF)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "BroadcastHashJoin" not in plan, (
        "a |V|-scaling table is hint-broadcast — driver OOM at graph scale:\n"
        + plan
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_no_expensive_expressions_in_scan_filters(all_plans):
    """InferFiltersFromGenerate can push a size(<expensive expr>) > 0
    predicate from an explode() all the way into the parquet scan filter,
    re-evaluating the whole array expression per input row inside the scan
    task — measured 4x+ on q_contamination before switching to
    explode_outer. Gate: no scan DataFilter may contain an array
    transform/distinct expression.

    q_corpus_prep is exempt: its scan filter IS the user-written quality
    predicate (ttr needs array_distinct) — a genuinely selective filter
    that must run somewhere, and earliest is cheapest; the gate targets
    only REDUNDANT inferred predicates that duplicate a downstream
    projection."""
    def check(name, plan):
        if name == "q_corpus_prep":
            return
        for line in plan.splitlines():
            s = line.strip()
            if "FileScan" in s and "DataFilters" in s:
                assert "transform(" not in s, s[:200]
                assert "array_distinct(" not in s, s[:200]

    sweep_plans(all_plans, check)


def test_mixture_sample_no_per_source_global_sort(all_plans):
    """The r4 rewrite's contract, asserted: selection ranks rows only
    WITHIN the (source, boundary-bucket) slice, never across a whole
    source. A row_number window partitioned on source alone is the r3
    scale-killer (one task sorts an entire source, ~1 TB at corpus scale);
    the two-phase histogram plan partitions its row_number on
    (source, bucket) so the sorted slice is ~1/256 of one source."""
    import re

    plan = cached_plan(all_plans, "q_mixture_sample")
    specs = [
        m.group(1)
        for m in re.finditer(
            r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan
        )
    ]
    assert specs, "expected the boundary-bucket row_number window:\n" + plan
    for spec in specs:
        # windowspecdefinition lists partition cols first, then ordering
        # cols tagged ASC/DESC: two+ columns before the first ordered one
        # means the partition key is finer than source alone.
        n_part_cols = len(re.split(r" ASC| DESC", spec)[0].split(","))
        assert n_part_cols >= 2, f"row_number partitioned on source alone: {spec}"


def test_quality_gopher_no_quadratic_top_share(all_plans):
    """The r4 rewrite's contract, asserted: the top-token-share rule is a
    sort + longest-run fold (O(n log n) per row), never the r3
    transform(array_distinct(toks), t -> count-equal) projection that
    re-scans the token array once per DISTINCT token (O(d*n) per row —
    unbounded on long documents)."""
    plan = cached_plan(all_plans, "q_quality_gopher")
    assert "transform(array_distinct(" not in plan, plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Runtime row-level filtering: with a selective filter on the build
    side of a shuffle join, Catalyst injects a bloom filter
    (bloom_filter_agg on the small side, might_contain on the probe side)
    so the big side drops non-joining rows BEFORE the shuffle — at 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the matching slice. Thresholds are lowered to fixture scale
    and broadcast is disabled (bloom applies to shuffle joins); both knobs
    restored after."""
    from pyspark.sql import functions as F

    from crypto_trading_data_pipeline_spark.io import read_table

    # Read BEFORE setting the knobs: read_table re-applies the engine's
    # 64 MB auto-broadcast default (apply_runtime_conf), and a creation
    # side the optimizer considers broadcastable makes InjectRuntimeFilter
    # classify the join as non-shuffle and skip injection. Conf is read at
    # optimization time, so setting the knobs after reading is sufficient.
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    knobs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {}
    for k, v in knobs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        joined = li.join(part, li.l_partkey == part.p_partkey).groupBy("p_brand").agg(
            F.sum("l_quantity").alias("qty")
        )
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
