"""Near-duplicate detection queries (SURVEY.md §2.6 X2 + BASELINE.json
north star): MinHash signatures, LSH candidate pairs, n-gram Jaccard,
SimHash, embedding-cosine near-dup, IVF-style clustered ANN, language ID.

Every query is oracle-checked: the hashing is built from primitives both
engines share (operators/dedup_hash.py), and the DuckDB SQL is GENERATED
from the same constants as the Spark code, so the two sides cannot drift.
"""

from __future__ import annotations

from itertools import count

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..io import parquet_row_count, read_table
from ..operators import dedup_hash as dh
from ..operators.scale import (
    configured_shuffle_partitions,
    fan_out,
    inline_literal,
    render_sql_literal,
)
from ..operators.similarity import as_double_vec, dot, l2_norm
from . import query

_SIG_COLS = [f"m{i}" for i in range(len(dh.MINHASH_PERMS))]

# Shared oracle fragments ---------------------------------------------------

_SQL_SHINGLES = dh.sql_word_shingles("text", k=3)
_SQL_SIG = dh.sql_minhash_values("sh")
_SQL_SIG_SELECT = ",\n             ".join(
    f"{expr} AS m{i}" for i, expr in enumerate(_SQL_SIG)
)
_SQL_BANDS = dh.sql_band_hash([f"m{i}" for i in range(16)])


def _shingle_hashes(docs):
    """doc_id + materialized shingle-hash array (md5 computed exactly once).

    fan_out first: the md5-per-shingle cost dominates the scan, so
    parallelism must come from cores, not input splits (see scale.fan_out).
    """
    # SQL-text construction (r14 fixed-floor work): identical expressions
    # to the Column builders (dh.word_shingles / dh.token_hash), rendered
    # JVM-side in two selectExpr calls instead of ~100 py4j round trips —
    # this helper sits under SIX near-dup queries, so its construction
    # chatter multiplied across the whole family.
    return (
        fan_out(docs.select("doc_id", "text"))
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .selectExpr("doc_id", f"{dh.sparksql_word_shingles('text', 3)} AS sh")
        .selectExpr(
            "doc_id", f"transform(sh, t -> {dh.sparksql_token_hash('t')}) AS hs"
        )
    )


@query(
    "q_minhash_sig",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT doc_id,
             {_SQL_SIG_SELECT}
    FROM sh
    """,
    doc="16-permutation MinHash signature per document over word 3-gram shingles (portable md5-based hashing).",
)
def q_minhash_sig(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    return _shingle_hashes(docs).selectExpr(
        "doc_id", *dh.sparksql_minhash_signature("hs")
    )


#: Per-bucket candidate cap. A band bucket of n docs expands to C(n,2)
#: pairs, so one pathological bucket (thousands of byte-identical docs all
#: sharing every band) would dominate the whole job: 10k copies = 50M pairs
#: from ONE collect_set row. Capping keeps expansion bounded at C(cap,2);
#: the kept subset is deterministic (lowest doc_ids of the sorted bucket).
#: Exact duplicates should be removed BEFORE near-dup LSH (the standard
#: pipeline order — q_dedup_exact, and what corpus_prep does), which makes
#: genuine cap overflow vanish; observed max bucket size on the fixtures is
#: 4 (sf0.1), so 64 never binds there and oracles stay exact.
_LSH_BUCKET_CAP = 64


#: Monotonic suffix making each CollectMetrics node name unique — a plan
#: that embeds _lsh_candidate_pairs twice must not collide on the name.
_LSH_OBSERVE_SEQ = count()


def _observe_bucket_cap(buckets, bucket_cap, observation, name_prefix):
    """Shared cap-overflow observability: CollectMetrics counting buckets
    whose uncapped membership (column ``all_ids``) exceeded ``bucket_cap``,
    plus the max uncapped size. One contract for every capped bucket
    structure (LSH pair buckets, the incremental corpus band index)."""
    metrics = [
        F.sum((F.size("all_ids") > bucket_cap).cast("long")).alias("truncated_buckets"),
        F.max(F.size("all_ids")).alias("max_bucket_size"),
    ]
    if observation is not None:
        return buckets.observe(observation, *metrics)
    return buckets.observe(f"{name_prefix}_{next(_LSH_OBSERVE_SEQ)}", *metrics)


def _lsh_candidate_pairs(
    docs, bucket_cap: int = _LSH_BUCKET_CAP, observation=None, sig=None
):
    """Distinct (doc_a < doc_b) pairs sharing any LSH band bucket — the
    shared candidate-generation stage for q_lsh_pairs and q_neardup_dedup.

    Cap overflow is OBSERVABLE, not silent: a CollectMetrics node counts
    buckets whose uncapped membership exceeded ``bucket_cap`` (and the max
    uncapped bucket size), emitted to the Spark UI / QueryExecutionListener
    on every action — zero extra passes, the stats ride the aggregate that
    already built the bucket. Pass a ``pyspark.sql.Observation`` to read
    the metrics programmatically (tests do; production monitors listen).
    A non-zero truncated_buckets means real candidate pairs were dropped —
    the fix is upstream exact dedup, not a bigger cap.

    ``sig``: an optional precomputed (doc_id, m0..m15) signature frame —
    callers that ALSO consume the signatures (q_minhash_est_jaccard's
    per-pair match count, _candidate_pair_overlap's verify sides)
    materialize the signature pass once (localCheckpoint) and share it
    here, instead of Catalyst re-running the full shingle+md5+minhash
    subtree per consumer (r13 optimization: the est-Jaccard plan carried
    THREE documents scans, one per consumer — guide §1.2/§2.4, don't
    compute things twice). Values are identical by construction: the
    default is exactly this expression."""
    if sig is None:
        sig = _shingle_hashes(docs).selectExpr(
            "doc_id", *dh.sparksql_minhash_signature("hs")
        )
    bands = sig.selectExpr(
        "doc_id",
        "posexplode(array("
        + ", ".join(dh.sparksql_band_hashes(_SIG_COLS))
        + ")) AS (band_id, band_hash)",
    )
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("all_ids"))
        .withColumn("ids", F.slice(F.col("all_ids"), 1, bucket_cap))
        .filter(F.size("ids") >= 2)
    )
    buckets = _observe_bucket_cap(buckets, bucket_cap, observation, "lsh_bucket_cap")
    # ids is sorted, so pairing each element with everything after it emits
    # each unordered pair exactly once with doc_a < doc_b.
    return (
        buckets.selectExpr(
            "explode(flatten(transform(ids, (a, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "b -> struct(a AS doc_a, b AS doc_b))))) AS p"
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def _candidate_pair_overlap(docs):
    """LSH candidate pairs with exact shingle-overlap counts — ONE
    candidate-verify scaffold for every consumer (q_neardup_dedup's 0.8
    verify, q_neardup_threshold_sweep's cutoff grid): cap-bounded LSH
    candidates joined to each side's word-3-gram shingles, emitting
    (doc_a, doc_b, inter, uni) as exact longs. Factored so the sweep can
    never silently tune a threshold against DIFFERENT pairs than the
    dedup acts on (shingle k, the >=3-token filter, and the candidate
    join live here, once).

    Deliberately NOT materialized (r13 A/B): localCheckpointing the
    string shingle-array table to share it across the three consumers
    took q_neardup_dedup's isolated best-of-3 from 2.15 s to 4.1 s with
    25 s outlier runs — millions of cached Java string objects are pure
    GC pressure, unlike q_minhash_est_jaccard's 17-int signature rows
    where the same trick wins 1.9x. The two verify-side shingle builds
    stay as recomputation (split+concat only — the md5+minhash pass runs
    once, inside _lsh_candidate_pairs)."""
    cand = _lsh_candidate_pairs(docs)
    sh = (
        fan_out(docs.select("doc_id", "text"))
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .selectExpr("doc_id", f"{dh.sparksql_word_shingles('text', 3)} AS sh")
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    uni = (
        F.size(F.col("sh_a")).cast("long")
        + F.size(F.col("sh_b")).cast("long")
        - inter
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", inter.alias("inter"), uni.alias("uni"))
    )


def _verified_neardup_pairs(docs):
    """LSH candidates verified by exact shingle Jaccard >= 0.8 — the edge
    list shared by q_neardup_dedup (one-hop reps) and
    q_neardup_components (exact clusters)."""
    p = _candidate_pair_overlap(docs)
    return p.filter(
        F.col("inter").cast("double") / F.col("uni") >= 0.8
    ).select("doc_a", "doc_b")


@query(
    "q_lsh_pairs",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             {_SQL_SIG_SELECT}
      FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS sh
        FROM documents WHERE len(string_split(text, ' ')) >= 3
      )
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
    doc=(
        "LSH candidate pairs: 4 bands x 4 rows; docs sharing any band bucket. "
        "One groupBy on the band digest + in-bucket pair expansion — the "
        "signature pipeline runs ONCE (a self-join would execute the md5 "
        "hashing twice, once per side) and there is no O(n^2) comparison. "
        "Bucket skew (thousands of identical docs) is bounded by a "
        "per-bucket candidate cap: expansion never exceeds C(64,2) pairs "
        "per bucket, and exact dups are expected to be removed upstream "
        "(q_dedup_exact) so the cap never binds on a clean corpus."
    ),
)
def q_lsh_pairs(spark: SparkSession, sf_dir: str):
    return _lsh_candidate_pairs(read_table(spark, sf_dir, "documents"))


@query(
    "q_lsh_bucket_stats",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             {_SQL_SIG_SELECT}
      FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS sh
        FROM documents WHERE len(string_split(text, ' ')) >= 3
      )
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    ), b AS (
      SELECT band_id, band_hash, count(*) AS n FROM bands GROUP BY 1, 2
    )
    SELECT band_id,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS colliding_buckets,
           CAST(max(n) AS BIGINT) AS max_bucket,
           CAST(sum(n * (n - 1)) // 2 AS BIGINT) AS cand_pairs,
           CAST(sum(least(n, {_LSH_BUCKET_CAP}) * (least(n, {_LSH_BUCKET_CAP}) - 1))
                // 2 AS BIGINT) AS capped_pairs,
           CAST(sum(CASE WHEN n > {_LSH_BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS truncated_buckets
    FROM b GROUP BY band_id
    """,
    doc=(
        "LSH bucket CAPACITY PLANNING — the per-band audit that sizes the "
        "banded join before it runs at 100 TB: for each of the 4 bands, "
        "bucket count, colliding buckets (>=2 docs — only these generate "
        "pairs), the fullest bucket, the UNCAPPED candidate-pair volume "
        "sum n*(n-1)/2 (what the in-bucket expansion would emit with no "
        f"cap — the number that explodes on a dirty corpus), the pair "
        f"volume under the production cap ({_LSH_BUCKET_CAP}), and how "
        "many buckets the cap would truncate. This turns q_lsh_pairs' "
        "CollectMetrics overflow counters into a queryable dataset-card "
        "table: truncated_buckets > 0 means upstream exact dedup is "
        "being skipped, and cand_pairs vs capped_pairs is the exact "
        "work bound for the verify stage. Same signature/banding "
        "construction as q_lsh_pairs (one textual source of truth in "
        "the oracle, shared dedup_hash helpers in Spark); two stacked "
        "partial+final aggregates on the band digest then the 4-row "
        "band key — no pair expansion runs at all, so the audit is "
        "strictly cheaper than the join it plans. Pair sums stay in "
        "exact integer arithmetic (n*(n-1) is even; integer-div by 2 "
        "on both engines)."
    ),
)
def q_lsh_bucket_stats(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    sig = _shingle_hashes(docs).selectExpr(
        "doc_id", *dh.sparksql_minhash_signature("hs")
    )
    bands = sig.selectExpr(
        "doc_id",
        "posexplode(array("
        + ", ".join(dh.sparksql_band_hashes(_SIG_COLS))
        + ")) AS (band_id, band_hash)",
    )
    b = bands.groupBy("band_id", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    cap = _LSH_BUCKET_CAP
    return b.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum((F.col("n") >= 2).cast("long")).cast("bigint").alias("colliding_buckets"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.expr("sum(n * (n - 1)) div 2").cast("bigint").alias("cand_pairs"),
        F.expr(f"sum(least(n, {cap}) * (least(n, {cap}) - 1)) div 2")
        .cast("bigint")
        .alias("capped_pairs"),
        F.sum((F.col("n") > cap).cast("long")).cast("bigint").alias("truncated_buckets"),
    )


def _length_blocked_join(df, *, payload: dict[str, str], tol: int):
    """Blocked self-join on (lang, length bucket): every same-lang pair with
    |Δn_chars| <= tol meets in EXACTLY one join key.

    Joining on lang alone (with the length predicate as a residual) makes
    the join KEY a handful of languages — guaranteed hot keys once the
    corpus is large. Bucketing n_chars at width tol+1 and exploding the
    right side into {b-1, b, b+1} lifts key cardinality to
    lang x length-distribution while preserving the output set: bucket
    width > tol means qualifying buckets differ by at most 1, and the three
    exploded values are distinct, so each pair matches exactly once.

    ``payload`` maps suffix -> source column ({"sh": "sh"} yields
    sh_a/sh_b). Returns doc_a/doc_b/nc_a/nc_b + payload columns, filtered
    to doc_a < doc_b and the length tolerance.
    """
    w = tol + 1
    bkt = F.floor(F.col("n_chars") / w)
    a = df.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("nc_a"),
        bkt.alias("bkt_a"),
        *[F.col(src).alias(f"{suf}_a") for suf, src in payload.items()],
    )
    b = df.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("nc_b"),
        F.explode(F.array(bkt - 1, bkt, bkt + 1)).alias("bkt_b"),
        *[F.col(src).alias(f"{suf}_b") for suf, src in payload.items()],
    )
    return a.join(
        b,
        (F.col("lang_a") == F.col("lang_b"))
        & (F.col("bkt_a") == F.col("bkt_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (F.abs(F.col("nc_a") - F.col("nc_b")) <= tol),
    )


@query(
    "q_neardup_incremental",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ), sig AS (
      SELECT doc_id,
             {_SQL_SIG_SELECT}
      FROM (SELECT doc_id, sh FROM sh)
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
      FROM bands b JOIN bands c
        ON b.band_id = c.band_id AND b.band_hash = c.band_hash
      WHERE b.doc_id >= 400 AND c.doc_id < 400
    ), ver AS (
      SELECT cand.batch_id, cand.corpus_id,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jac
      FROM cand
      JOIN sh a ON a.doc_id = cand.batch_id
      JOIN sh b ON b.doc_id = cand.corpus_id
    ), best AS (
      SELECT batch_id, min(corpus_id) AS match_id,
             arg_min(jac, corpus_id) AS jac
      FROM ver WHERE jac >= 0.8 GROUP BY batch_id
    ), bsz AS (
      SELECT band_id, band_hash FROM bands WHERE doc_id < 400
      GROUP BY band_id, band_hash HAVING count(*) > {_LSH_BUCKET_CAP}
    ), tflag AS (
      SELECT DISTINCT b.doc_id AS batch_id
      FROM bands b JOIN bsz ON b.band_id = bsz.band_id AND b.band_hash = bsz.band_hash
      WHERE b.doc_id >= 400
    )
    SELECT d.doc_id,
           CAST(CASE WHEN best.batch_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS keep,
           COALESCE(best.match_id, -1) AS match_id,
           COALESCE(best.jac, -1.0)    AS jac,
           CAST(CASE WHEN tf.batch_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS screened_truncated
    FROM documents d
    LEFT JOIN best ON best.batch_id = d.doc_id
    LEFT JOIN tflag tf ON tf.batch_id = d.doc_id
    WHERE d.doc_id >= 400
    """,
    doc=(
        "Incremental NEAR-dup screen: the fuzzy twin of q_dedup_incremental "
        "— a NEW batch (doc_id>=400 stands in) is screened against the "
        "EXISTING corpus via shared LSH band buckets, candidates verified "
        "by exact 3-gram Jaccard >= 0.8, and every batch doc gets a keep "
        "flag plus its lowest-id verified corpus match. The steady-state "
        "100 TB ingest shape the batch neardup's own docstring points at: "
        "the corpus's band table is computed once and persisted (bucketed "
        "on band_hash), so per-batch cost is |batch| x bands rows joined "
        "against the bucketed index + shingle fetches for candidates only "
        "— the corpus is never re-hashed, and cost is independent of "
        "corpus size. Hot buckets are bounded by upstream exact dedup "
        "(q_dedup_incremental runs first in the standard pipeline order)."
    ),
)
def q_neardup_incremental(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    return neardup_incremental(docs, cutoff=400)


def neardup_incremental(
    docs,
    cutoff: int,
    observation=None,
    bucket_cap: int = _LSH_BUCKET_CAP,
    strict: bool = False,
):
    """Core of q_neardup_incremental, callable with an ``Observation``.

    The corpus side is materialized as a capped bucket INDEX — per
    (band_id, band_hash), the sorted corpus doc_ids sliced to
    ``bucket_cap`` — which is both the skew bound (one hot band bucket
    cannot explode the batch join beyond |batch| x cap) and literally the
    table a production deployment persists between batches. Cap overflow
    is observable via the same CollectMetrics contract as
    _lsh_candidate_pairs: truncated_buckets > 0 means a batch doc may have
    been cleared against an over-cap bucket whose tail was dropped — the
    fix is upstream exact dedup, not a bigger cap.

    ``strict=True`` turns the per-doc ``screened_truncated`` flag into a
    hard gate: the capped index is checked EAGERLY and the call raises
    ``ValueError`` if any bucket overflowed, so a pipeline that must not
    emit potential false-keeps fails at build time instead of shipping
    flagged rows. Costs one extra index-build job up front (bounded: the
    index is |bands| x |buckets| rows, never the corpus; a production
    deployment persists it between batches and pays this once)."""
    # NO signature checkpoint (r14, VERDICT r13 #1): the r13 eager
    # localCheckpoint here was the round's one A/B-confirmed regression
    # (+19%, head 3.04 s vs baseline 2.57 s, SCALE_AB_R13FINAL.json) —
    # its dedicated materialization job cost more than the saved
    # recomputation, and the r14 A/B measured the lazy variant worse
    # still (+15%, AB_R14_CKPT_LAZY.json: consumers race and duplicate
    # the shared compute). The un-checkpointed plan is NOT 4x work:
    # both sides of the band join exchange on (band_id, band_hash), and
    # the two consumers of the join (flags + cand) reuse those
    # exchanges (ReusedExchange in the plan), so the signature subtree
    # executes ~twice (batch side + corpus side), which the A/B prices
    # cheaper than any materialization at this table's size. At 100 TB
    # the corpus index is PERSISTED between batches (see docstring) —
    # the in-job share was never the scale story.
    sig = _shingle_hashes(docs).selectExpr(
        "doc_id", *dh.sparksql_minhash_signature("hs")
    )
    bands = sig.selectExpr(
        "doc_id",
        "posexplode(array("
        + ", ".join(dh.sparksql_band_hashes(_SIG_COLS))
        + ")) AS (band_id, band_hash)",
    )
    bb = bands.filter(F.col("doc_id") >= cutoff).select(
        F.col("doc_id").alias("batch_id"), "band_id", "band_hash"
    )
    corpus_index = (
        bands.filter(F.col("doc_id") < cutoff)
        .groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("all_ids"))
        .withColumn("ids", F.slice(F.col("all_ids"), 1, bucket_cap))
        .withColumn("trunc", (F.size("all_ids") > bucket_cap).cast("int"))
    )
    corpus_index = _observe_bucket_cap(
        corpus_index, bucket_cap, observation, "neardup_incr_bucket_cap"
    )
    if strict:
        # Eager gate, not a plan node: CollectMetrics only surfaces after
        # an action, so strictness has to spend one bounded index job here.
        overflow = (
            corpus_index.filter(F.col("trunc") == 1)
            .select(F.count(F.lit(1)).alias("n"), F.max(F.size("all_ids")).alias("mx"))
            .first()
        )
        if overflow["n"]:
            raise ValueError(
                f"neardup_incremental(strict=True): {overflow['n']} corpus band "
                f"bucket(s) exceed bucket_cap={bucket_cap} (largest holds "
                f"{overflow['mx']} docs) — batch docs cleared against their "
                "dropped tails could be silent false-keeps. Run exact dedup "
                "on the corpus first (q_dedup_incremental), or screen with "
                "strict=False and quarantine rows with screened_truncated=1."
            )
    # shuffle_hash hint: metrics inside a broadcast stage come back EMPTY
    # (see semdedup_flags), and AQE would broadcast the index exactly in
    # small/benign regimes — silencing the truncation alarm when it is
    # cheapest to keep. At production scale the band index is corpus-sized
    # and a broadcast would be wrong anyway, so the hint costs nothing
    # where it matters and buys always-on observability where it doesn't.
    joined = bb.join(
        corpus_index.select("band_id", "band_hash", "ids", "trunc").hint("shuffle_hash"),
        ["band_id", "band_hash"],
    )
    # Per-batch-doc truncation flag: a doc cleared only against over-cap
    # buckets whose tails were dropped is NOT the same as a doc cleared
    # against complete buckets — downstream can quarantine flagged docs
    # instead of trusting keep=1 blindly (silent false-keeps at scale).
    flags = joined.groupBy("batch_id").agg(
        F.max("trunc").alias("screened_truncated")
    ).withColumnRenamed("batch_id", "flag_id")
    cand = joined.select("batch_id", F.explode("ids").alias("corpus_id")).distinct()
    sh = (
        fan_out(docs.select("doc_id", "text"))
        .filter(F.size(F.split(F.col("text"), " ")) >= 3)
        .selectExpr("doc_id", f"{dh.sparksql_word_shingles('text', 3)} AS sh")
    )
    sa = sh.select(F.col("doc_id").alias("batch_id"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("corpus_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = F.round(
        inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter), 6
    )
    ver = (
        cand.join(sa, "batch_id")
        .join(sb, "corpus_id")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.8)
    )
    best = ver.groupBy("batch_id").agg(
        F.min("corpus_id").alias("match_id"),
        F.min_by("jac", "corpus_id").alias("jac"),
    )
    batch = docs.filter(F.col("doc_id") >= cutoff).select("doc_id")
    return (
        batch.join(best, batch.doc_id == best.batch_id, "left")
        .join(flags, batch.doc_id == flags.flag_id, "left")
        .select(
            "doc_id",
            F.when(F.col("batch_id").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
            F.coalesce(F.col("match_id"), F.lit(-1)).alias("match_id"),
            F.coalesce(F.col("jac"), F.lit(-1.0)).alias("jac"),
            F.coalesce(F.col("screened_truncated"), F.lit(0)).cast("int").alias("screened_truncated"),
        )
    )


@query(
    "q_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 5
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.1
    """,
    doc="Exact n-gram Jaccard over blocked candidate pairs (same lang, close length): the verify stage after LSH candidate generation.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    sh = docs.filter(F.size(F.split(F.col("text"), " ")) >= 3).selectExpr(
        "doc_id", "lang", "n_chars", f"{dh.sparksql_word_shingles('text', 3)} AS sh"
    )
    joined = _length_blocked_join(sh, payload={"sh": "sh"}, tol=5)
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = inter.cast("double") / union
    return joined.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.1
    )


@query(
    "q_simhash",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {dh.sql_token_hash_list("string_split(text, ' ')")} AS hs
      FROM documents
    )
    SELECT doc_id, {dh.sql_simhash_sum('hs')} AS simhash
    FROM h
    """,
    doc="32-bit SimHash fingerprint: per-bit majority vote over token hashes. Row-local (no shuffle); hamming-distance joins find near-dups.",
)
def q_simhash(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    _hs = dh.sparksql_token_hash_list("split(text, ' ')")
    hashed = docs.selectExpr("doc_id", f"{_hs} AS hs")
    return hashed.selectExpr("doc_id", f"{dh.sparksql_simhash('hs')} AS simhash")


#: q_embed_neardup is an exact O(n^2) baseline for validating the ANN
#: paths; above this corpus size the quadratic expansion is a job-killer
#: (100k rows = 5e9 pairs), so the operator refuses rather than running.
_EMBED_EXACT_MAX_ROWS = 100_000


@query(
    "q_embed_neardup",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.99
    """,
    doc=(
        "Embedding-cosine near-duplicate pairs (sim >= 0.99). Exact "
        "all-pairs baseline — O(n^2) BY DESIGN, kept only to validate the "
        "ANN paths. Guarded: refuses above _EMBED_EXACT_MAX_ROWS so it "
        "cannot be lifted into a production pipeline accidentally; callers "
        "over the cap are pointed at q_ann_ivf / q_ann_lsh."
    ),
)
def q_embed_neardup(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    # Guard on the parquet footer's row count (driver-side, O(footer read),
    # single-file AND part-directory layouts) rather than emb.count(): an
    # eager count here ran a full Spark job for every plan-only consumer
    # of this DataFrame (.explain, plan gates).
    n_rows = parquet_row_count(sf_dir, "embeddings")
    if n_rows is None:  # unknown layout: pay the exact count
        n_rows = emb.count()
    if n_rows > _EMBED_EXACT_MAX_ROWS:
        raise ValueError(
            f"q_embed_neardup is the EXACT all-pairs baseline: {n_rows} rows "
            f"would expand to ~{n_rows * (n_rows - 1) // 2} comparisons "
            f"(cap {_EMBED_EXACT_MAX_ROWS}). Use q_ann_ivf or q_ann_lsh — "
            "the bucketed scale paths validated against this baseline."
        )
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a, b = n.alias("a"), n.alias("b")
    sim = F.round(
        dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= 0.99)
    )


#: Deterministic centroid rule shared by every IVF-family query and its
#: oracle: every 50th vec_id, CAPPED at vec_id < 3200 so the centroid
#: count is pinned at k <= 64 NO MATTER how large the corpus grows. The
#: cap is the scale contract: without it k = N/50 and assignment work is
#: O(N^2/50) — measured 52x wall at 30x data before the cap
#: (SCALE_PROBE30.json, r7). With it, assignment is O(64 * N): a true
#: broadcast of a fixed-size table, exactly how a production IVF index
#: pins k at train time regardless of corpus growth. Fixtures are
#: unchanged below 3200 vectors (sf0.01 has 500, sf0.1 has 2000), so the
#: oracle hashes are identical; only the synthetic scale probes see the
#: cap bite.
_IVF_CENT_MOD = 50
_IVF_CENT_MAX_ID = 3200


def _ivf_assign(n, keep_top: int = 1):
    """Nearest-centroid assignment over a normalized (vec_id, v, nrm) frame:
    deterministic PINNED-k centroid subset (vec_id % 50 == 0 AND
    vec_id < 3200, k <= 64 — see _IVF_CENT_MAX_ID) broadcast against the
    corpus, clusters ranked by (rounded cosine desc, cent_id) — shared by
    q_ann_ivf and q_semdedup, and the oracle SQL mirrors it verbatim.

    ``keep_top=1`` (the default) is the corpus-side assignment: one row per
    vector with its home cluster. ``keep_top>1`` is the QUERY-side nprobe
    expansion — the nearest ``keep_top`` clusters per vector with their
    rank ``rc``, used to probe multiple inverted lists."""
    cent = F.broadcast(
        n.filter(
            (F.col("vec_id") % _IVF_CENT_MOD == 0)
            & (F.col("vec_id") < _IVF_CENT_MAX_ID)
        ).select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    csim = F.round(dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6)
    wc = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cent_id"))
    ranked = (
        n.crossJoin(cent)
        .withColumn("csim", csim)
        .withColumn("rc", F.row_number().over(wc))
        .filter(F.col("rc") <= keep_top)
    )
    if keep_top == 1:
        return ranked.select("vec_id", "v", "nrm", "cent_id")
    return ranked.select("vec_id", "cent_id", "rc")


def _ivf_assign_hier(n):
    """TWO-LEVEL IVF quantizer (hierarchical-IVF shape) for SemDeDup:
    fine centroids are the CONSTANT-SPACING subset (every 50th vec_id,
    k2 ~ N/50 — cluster SIZE pinned at ~50), coarse centroids the
    BALANCED sqrt sub-subset: every ``stride``-th fine centroid with
    stride = max(1, floor(sqrt(k2))), i.e. k1 ~ sqrt(k2). Vectors route
    nearest-coarse first (broadcast — k1 is only ~14k rows even at
    N = 1e10), then rank only the fine centroids living in their coarse
    cell (shuffle on co_id, ~sqrt(k2) candidates per cell).

    Why a second level exists at all: SemDeDup's pairwise stage costs
    sum(|cluster|^2), so the CLUSTER SIZE must stay constant as the
    corpus grows (the paper pins ~size, not count — 50k clusters for
    LAION). Constant size means k2 grows with N, and a single-level
    nearest-of-k2 assignment is O(N * k2) = O(N^2/50) — the r7 scale
    artifact.

    HONEST ASYMPTOTICS (r9, fixing the r8 docstring which claimed "both
    stages linear"): with the r8 PINNED-64 coarse level the fine rank
    was O(N * k2/64) = O(N^2/3200) — the quadratic deferred by a 64x
    constant, re-emerging past ~200k vectors. k1 = sqrt(k2) is the
    balanced two-level optimum (minimizes k1 + k2/k1): both stages are
    O(N * sqrt(k2)) = O(N^1.5 / sqrt(50)) — SUBQUADRATIC, not linear,
    and strictly less per-vector work than the pinned scheme at every
    k2 > 64 (2*sqrt(k2) vs 64 + k2/64; at N = 1e8 / k2 = 2e6 that is
    ~2.8k dot products per vector vs 2e6 flat and ~31k pinned, the gap
    widening as sqrt(N)). Truly near-linear (O(N log N)) needs a
    log-depth tree or a trained fixed-k quantizer per level (production
    IMI); at the corpus sizes this engine targets the N^1.5/sqrt(50)
    curve stays shuffle-bound, not compute-bound. The pairwise stage is
    untouched: fine clusters stay ~50 vectors, O(50 * N).

    Determinism: stride is an integer both engines derive identically
    (floor(sqrt(k2)) in IEEE doubles; the oracle computes it from a
    count(*) CTE, this side from a 1-row scalar aggregate riding the
    SAME plan — no eager driver action, so constructing the DataFrame
    never launches a job and the coarse-selection scalar costs one
    bounded BroadcastNestedLoopJoin), and every rank is (rounded-6dp
    cosine DESC, centroid id) — the oracle SQL mirrors all three ranks
    verbatim. Every coarse centroid is a
    fine centroid and is its own nearest coarse candidate at cosine
    exactly 1.0, so no coarse cell a vector can route to is ever empty
    on real-valued fixtures; a pathological rounded-1.0 tie would drop
    the cell's vectors IDENTICALLY in both engines (same inner join,
    same tie-break), so hash parity is preserved even then."""
    fine = n.filter(F.col("vec_id") % _IVF_CENT_MOD == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    # The stride rides the plan as a 1-row scalar (GREATEST/FLOOR/SQRT
    # on the fine count — textually the oracle's strd CTE), crossJoined
    # onto the k2-row fine table as a broadcast nested-loop: no eager
    # count() action at construction time, one bounded exchange.
    strd = fine.agg(
        F.greatest(F.lit(1).cast("long"), F.floor(F.sqrt(F.count(F.lit(1)))).cast("long")).alias("s")
    )
    coarse = F.broadcast(
        fine.crossJoin(F.broadcast(strd))
        .filter(F.col("cent_id") % (F.lit(_IVF_CENT_MOD) * F.col("s")) == 0)
        .select(
            F.col("cent_id").alias("co_id"),
            F.col("cv").alias("cov"),
            F.col("cnrm").alias("conrm"),
        )
    )

    def nearest_coarse(df, vcol, ncol, idcol):
        csim = F.round(
            dot(F.col(vcol), F.col("cov")) / (F.col(ncol) * F.col("conrm")), 6
        )
        w = Window.partitionBy(idcol).orderBy(F.col("csim").desc(), F.col("co_id"))
        return (
            df.crossJoin(coarse)
            .withColumn("csim", csim)
            .withColumn("rc", F.row_number().over(w))
            .filter(F.col("rc") == 1)
            .drop("csim", "rc", "cov", "conrm")
        )

    fine_cell = nearest_coarse(fine, "cv", "cnrm", "cent_id")
    vec_cell = nearest_coarse(n, "v", "nrm", "vec_id")
    fsim = F.round(
        dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6
    )
    wf = Window.partitionBy("vec_id").orderBy(F.col("fsim").desc(), F.col("cent_id"))
    return (
        vec_cell.join(fine_cell, "co_id")
        .withColumn("fsim", fsim)
        .withColumn("rf", F.row_number().over(wf))
        .filter(F.col("rf") == 1)
        .select("vec_id", "v", "nrm", "cent_id")
    )


@query(
    "q_ann_ivf",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), cent AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id % 50 = 0 AND vec_id < 3200
    ), assign AS (
      SELECT vec_id, v, nrm, cent_id FROM (
        SELECT n.vec_id, n.v, n.nrm, cent.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                          cent.cent_id
               ) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rnk
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                        c.vec_id
             ) AS rn
      FROM assign q JOIN assign c
        ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ) WHERE rn <= 3
    """,
    doc=(
        "IVF-style ANN: assign every vector to its nearest centroid (deterministic "
        "centroid subset vec_id%50=0), then search only within the query's cluster. "
        "The scale path: cluster assignment is a broadcast join, search cost drops "
        "|corpus|/|clusters| fold vs brute force."
    ),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    return _ivf_topk(_ivf_assign(n))


def _ivf_topk(assign, k: int = 3):
    """Top-k in-cluster neighbors for the probe queries (vec_id < 5) —
    ONE ranking definition (cosine rounded 6dp desc, vec_id tie-break)
    shared by the index query (q_ann_ivf) and its recall audit
    (q_ann_recall_eval). The audit is only meaningful if it ranks exactly
    as the index it audits; sharing this helper enforces that a tie-break
    or rounding change can never diverge the two."""
    q = assign.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cent_id").alias("qcent"),
    )
    sim = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    wr = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        assign.join(
            F.broadcast(q),
            (F.col("cent_id") == F.col("qcent")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sim", "rnk")
    )


#: PQ geometry: 64-dim vectors -> 4 subspaces x 16 dims, 8 codewords per
#: subspace (vec_id < 8's subvectors — same deterministic-codebook move as
#: q_kmeans_assign). A vector compresses to 4 codes (3 bits each): the
#: memory-side ANN answer — 64 floats -> half a byte, distances served
#: from an 8-entry lookup table per (query, subspace).
_PQ_M, _PQ_DSUB, _PQ_K = 4, 16, 8
_PQ_N_QUERIES = 5


def _pq_oracle_core() -> str:
    """The PQ CTE chain (split -> codebook -> encode -> ADC scores) shared
    by q_ann_pq's oracle and q_ann_rerank's (single source of truth for
    the DuckDB twin of the codebook/encoding arithmetic)."""
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sub AS (
      SELECT vec_id, j, v[1+{_PQ_DSUB}*j : {_PQ_DSUB}*(j+1)] AS sv
      FROM e, (SELECT unnest(range({_PQ_M})) AS j)
    ), cb AS (
      SELECT j, vec_id AS code, sv AS cw FROM sub WHERE vec_id < {_PQ_K}
    ), enc AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, cb.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY round(list_aggregate(list_transform(range(1,{_PQ_DSUB + 1}),
                           i -> (s.sv[i]-cb.cw[i])*(s.sv[i]-cb.cw[i])), 'sum'), 6),
                          cb.code
               ) AS rc
        FROM sub s JOIN cb ON s.j = cb.j
      ) WHERE rc = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             round(sum(round(list_aggregate(list_transform(range(1,{_PQ_DSUB + 1}),
                   i -> (q.sv[i]-cb.cw[i])*(q.sv[i]-cb.cw[i])), 'sum'), 6)), 6) AS adist
      FROM sub q
      JOIN enc x ON q.j = x.j AND x.vec_id <> q.vec_id
      JOIN cb ON cb.j = x.j AND cb.code = x.code
      WHERE q.vec_id < {_PQ_N_QUERIES}
      GROUP BY q.vec_id, x.vec_id
    )"""


@query(
    "q_ann_pq",
    oracle=_pq_oracle_core()
    + """
    SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
      FROM adc
    ) WHERE rn <= 3
    """,
    doc=(
        "Product-quantization ANN (Jégou et al. 2011): each vector is "
        "encoded as 4 sub-codes (nearest of 8 fixed codewords per 16-dim "
        "subspace), and query distance is ASYMMETRIC — the query's exact "
        "subvectors against the neighbor's codewords, served from a "
        "4x8-entry lookup table per query. Both encoding and the ADC scan "
        "are NARROW in Spark: the codebook (k x m x dsub floats) and the "
        "per-query LUTs are inlined literals, so the corpus is never "
        "joined or shuffled until the final top-k window over "
        "|queries| x |corpus| scored rows. This is the memory story the "
        "other ANN paths lack: 64 floats -> 4 codes means the index for a "
        "trillion vectors fits a cluster's RAM; IVF bounds compute, PQ "
        "bounds bytes, IVF+PQ at 100 TB composes the two — q_ann_ivfpq is "
        "that composition."
    ),
)
def q_ann_pq(spark: SparkSession, sf_dir: str):
    emb = read_table(spark, sf_dir, "embeddings")
    cb, q_rows = _pq_collect_cb_queries(emb)
    n = fan_out(emb).select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    enc = _pq_encode(n, cb)
    probed = enc.withColumn("q", F.explode(_pq_query_structs(q_rows, cb))).filter(
        F.col("vec_id") != F.col("q.query_id")
    )
    return _pq_adc_topk(probed)


def _pq_collect_cb_queries(emb):
    """ONE bounded collect serves both the codebook (vec_id < k) and the
    query vectors (vec_id < n_queries): max(k, nq) = 8 rows through a plain
    narrow scan with the id predicate pushed to parquet. The collect path
    deliberately skips fan_out — a repartition shuffle of the whole corpus
    to fetch 8 rows was most of q_ann_pq's construction cost."""
    hi = max(_PQ_K, _PQ_N_QUERIES)
    rows = {
        int(r.vec_id): [float(x) for x in r.v]
        for r in emb.select(
            "vec_id", as_double_vec(F.col("embedding")).alias("v")
        )
        .filter(F.col("vec_id") < hi)
        .collect()
    }
    cb = [
        [rows[code][j * _PQ_DSUB : (j + 1) * _PQ_DSUB] for code in range(_PQ_K)]
        for j in range(_PQ_M)
    ]
    q_rows = {qid: v for qid, v in rows.items() if qid < _PQ_N_QUERIES}
    return cb, q_rows


def _pq_encode(df, cb, keep=("vec_id",)):
    """PQ-encode the ``v`` column against an inlined codebook: per subspace,
    argmin over the k codewords — a NARROW projection (no join, no shuffle);
    ``keep`` columns ride along (e.g. the IVF cluster id for q_ann_ivfpq).

    The distances are computed with higher-order functions over a codebook
    LITERAL (slice -> zip_with -> aggregate): the fold is the same
    left-to-right float64 sum as the unrolled form, but the expression tree
    is O(m) instead of O(m*k*dsub) — the 512-term unrolled projection blew
    past whole-stage-codegen limits and ran interpreted at ~1 ms/row.
    Argmin keeps the lowest-code tie-break via first-position-of-min."""
    # ONE expr-string literal, not m*k*dsub per-element lit() nodes — 512
    # py4j hops (~1 s of driver latency) per plan build otherwise
    # (operators/scale.inline_literal; values bit-identical by the repr
    # round-trip contract documented there). r14: the whole per-subspace
    # argmin is now SQL text too (the remaining ~160 Column-builder round
    # trips were ~0.4 s of the probe3 construct, cProfile in
    # OPTIMIZATION_r14.md); expressions identical, parsed JVM-side.
    cb_sql = render_sql_literal(
        [[[float(c) for c in cb[j][code]] for code in range(_PQ_K)] for j in range(_PQ_M)]
    )

    def d2s_for(j: int) -> str:
        sub = f"slice(v, {j * _PQ_DSUB + 1}, {_PQ_DSUB})"
        return (
            f"transform(element_at({cb_sql}, {j + 1}), "
            f"cw -> round(aggregate(zip_with({sub}, cw, "
            "(x, c) -> (x - c) * (x - c)), "
            "CAST(0.0 AS double), (acc, y) -> acc + y), 6)) "
            f"AS d2s{j}"
        )

    # Two projects, not one: the argmin references its distance array
    # TWICE (array_position + array_min); binding d2s{j} in its own
    # projection parses the embedded codebook literal once per subspace
    # instead of twice, and d2s{j} is non-cheap and multiply-referenced,
    # so CollapseProject (SPARK-36718) keeps the stage split — one
    # evaluation per row, identical values.
    dists = df.selectExpr(*keep, *[d2s_for(j) for j in range(_PQ_M)])
    return dists.selectExpr(
        *keep,
        *[
            f"CAST(array_position(d2s{j}, array_min(d2s{j})) - 1 AS int) AS c{j}"
            for j in range(_PQ_M)
        ],
    )


def _pq_query_structs(q_rows, cb, qcents=None):
    """Array literal of per-query ADC lookup tables, computed driver-side in
    the same left-to-right float64 fold order as both engines' array sums.
    With ``qcents`` (query id -> list of IVF cluster ids, nearest first),
    each struct also carries the query's probe set so the inverted-list
    filter runs row-locally."""

    def lut_entry(qv: list[float], j: int, code: int) -> float:
        # HALF_UP to match Spark's F.round / DuckDB's round on the other
        # side of the comparison — Python's built-in round is banker's
        # (half-to-even) and disagrees on exact .5 boundaries.
        from decimal import ROUND_HALF_UP, Decimal

        acc = 0.0
        for i in range(_PQ_DSUB):
            d = qv[j * _PQ_DSUB + i] - cb[j][code][i]
            acc += d * d
        return float(Decimal(repr(acc)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))

    # One expr-string literal for the whole query-structs array (see
    # _pq_encode's cb_lit note): ~165 per-element lit() hops otherwise.
    structs = []
    for qid, qv in sorted(q_rows.items()):
        fields: dict = {
            "query_id": int(qid),
            "lut": [
                [lut_entry(qv, j, code) for code in range(_PQ_K)]
                for j in range(_PQ_M)
            ],
        }
        if qcents is not None:
            fields["qcents"] = [int(c) for c in qcents[qid]]
        structs.append(fields)
    return inline_literal(structs)


def _pq_adc_topk(probed, k: int = 3):
    """ADC scoring + per-query top-k over an exploded (codes, q-struct)
    frame: distance is 4 lookups into the query's LUT literal — row-local —
    and the only shuffle in the whole PQ path is this final rank window."""
    scored = probed.select(
        F.col("q.query_id").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            sum(
                F.element_at(
                    F.element_at(F.col("q.lut"), j + 1), F.col(f"c{j}") + 1
                )
                for j in range(_PQ_M)
            ),
            6,
        ).alias("adist"),
    )
    wr = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "adist", "rnk")
    )


#: Two-stage retrieval: the PQ ADC scan nominates _RERANK_CAND candidates
#: per query; the exact-cosine re-rank keeps _RERANK_K. Candidates per
#: query bound the exact-distance work regardless of corpus size.
_RERANK_CAND, _RERANK_K = 32, 5


@query(
    "q_ann_rerank",
    oracle=_pq_oracle_core()
    + f""", cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
        FROM adc
      ) WHERE rn <= {_RERANK_CAND}
    ), n2 AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    )
    SELECT query_id, neighbor_id, sim, CAST(rn2 AS INTEGER) AS rnk FROM (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) AS sim,
             row_number() OVER (
               PARTITION BY c.query_id
               ORDER BY round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
                        c.neighbor_id
             ) AS rn2
      FROM cand c
      JOIN n2 q ON q.vec_id = c.query_id
      JOIN n2 x ON x.vec_id = c.neighbor_id
    ) WHERE rn2 <= {_RERANK_K}
    """,
    doc=(
        "Two-stage ANN retrieval — the standard production serving stack "
        "the single-stage paths approximate: stage 1 is the PQ ADC scan "
        "(compressed codes, LUT lookups, row-local) nominating the top-32 "
        "candidates per query; stage 2 fetches ONLY those candidates' "
        "full vectors and re-ranks them by exact cosine to the final "
        "top-5. The candidate fetch broadcasts the tiny candidate list "
        "(|queries| x 32 rows) against the corpus scan — the corpus is "
        "never shuffled, exact-distance work is bounded by the candidate "
        "budget however large the index, and the recall/cost trade is "
        "two independent knobs (candidates swept in "
        "tests/test_ann_recall.py, where rerank recall dominates the raw "
        "ADC ranking's). This is FAISS's search-then-refine layout in "
        "pure DataFrame ops."
    ),
)
def q_ann_rerank(spark: SparkSession, sf_dir: str):
    emb = read_table(spark, sf_dir, "embeddings")
    cb, q_rows = _pq_collect_cb_queries(emb)
    n = fan_out(emb).select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    enc = _pq_encode(n, cb)
    probed = enc.withColumn("q", F.explode(_pq_query_structs(q_rows, cb))).filter(
        F.col("vec_id") != F.col("q.query_id")
    )
    cand = _pq_adc_topk(probed, k=_RERANK_CAND).select("query_id", "neighbor_id")
    full = n.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        l2_norm(F.col("v")).alias("nnrm"),
    )
    qdf = spark.createDataFrame(
        [(int(qid), v) for qid, v in sorted(q_rows.items())],
        "query_id bigint, qv array<double>",
    ).withColumn("qnrm", l2_norm(F.col("qv")))
    sim = F.round(
        dot(F.col("qv"), F.col("nv")) / (F.col("qnrm") * F.col("nnrm")), 6
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        full.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _RERANK_K)
        .select("query_id", "neighbor_id", "sim", "rnk")
    )


@query(
    "q_ann_ivfpq",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), cent AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id % 50 = 0 AND vec_id < 3200
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cent.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                          cent.cent_id
               ) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ), sub AS (
      SELECT vec_id, j, v[1+{_PQ_DSUB}*j : {_PQ_DSUB}*(j+1)] AS sv
      FROM e, (SELECT unnest(range({_PQ_M})) AS j)
    ), cb AS (
      SELECT j, vec_id AS code, sv AS cw FROM sub WHERE vec_id < {_PQ_K}
    ), enc AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, cb.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY round(list_aggregate(list_transform(range(1,{_PQ_DSUB + 1}),
                           i -> (s.sv[i]-cb.cw[i])*(s.sv[i]-cb.cw[i])), 'sum'), 6),
                          cb.code
               ) AS rc
        FROM sub s JOIN cb ON s.j = cb.j
      ) WHERE rc = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             round(sum(round(list_aggregate(list_transform(range(1,{_PQ_DSUB + 1}),
                   i -> (q.sv[i]-cb.cw[i])*(q.sv[i]-cb.cw[i])), 'sum'), 6)), 6) AS adist
      FROM sub q
      JOIN assign qa ON qa.vec_id = q.vec_id
      JOIN enc x ON q.j = x.j AND x.vec_id <> q.vec_id
      JOIN assign xa ON xa.vec_id = x.vec_id AND xa.cent_id = qa.cent_id
      JOIN cb ON cb.j = x.j AND cb.code = x.code
      WHERE q.vec_id < {_PQ_N_QUERIES}
      GROUP BY q.vec_id, x.vec_id
    )
    SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
      FROM adc
    ) WHERE rn <= 3
    """,
    doc=(
        "IVF+PQ composed ANN (the FAISS IVFPQ layout, Jégou et al. 2011 "
        "§V): the coarse quantizer (q_ann_ivf's nearest-centroid "
        "assignment, shared _ivf_assign) partitions the corpus, PQ codes "
        "(shared _pq_encode) compress it, and a query probes ONLY its own "
        "cluster with the ADC lookup-table scan. This is the index that "
        "actually serves 100 TB: IVF divides the scan by |clusters|, PQ "
        "divides the bytes by ~128x, and both sides of the probe are "
        "narrow — centroids broadcast, LUTs inlined literals, the "
        "cluster filter evaluated row-locally against the query structs "
        "(explode of the per-row-filtered 5-element literal), so the only "
        "shuffle is the final per-query top-k window."
    ),
)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str):
    return _ann_ivfpq(spark, sf_dir, nprobe=1)


@query(
    "q_ann_ivfpq_probe3",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), cent AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id % 50 = 0 AND vec_id < 3200
    ), ranked AS (
      SELECT n.vec_id, cent.cent_id,
             row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                        cent.cent_id
             ) AS rc
      FROM n CROSS JOIN cent
    ), assign AS (
      SELECT vec_id, cent_id FROM ranked WHERE rc = 1
    ), qassign AS (
      SELECT vec_id, cent_id FROM ranked WHERE rc <= 3 AND vec_id < {_PQ_N_QUERIES}
    ), sub AS (
      SELECT vec_id, j, v[1+{_PQ_DSUB}*j : {_PQ_DSUB}*(j+1)] AS sv
      FROM e, (SELECT unnest(range({_PQ_M})) AS j)
    ), cb AS (
      SELECT j, vec_id AS code, sv AS cw FROM sub WHERE vec_id < {_PQ_K}
    ), enc AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, cb.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY round(list_aggregate(list_transform(range(1,{_PQ_DSUB + 1}),
                           i -> (s.sv[i]-cb.cw[i])*(s.sv[i]-cb.cw[i])), 'sum'), 6),
                          cb.code
               ) AS rc
        FROM sub s JOIN cb ON s.j = cb.j
      ) WHERE rc = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             round(sum(round(list_aggregate(list_transform(range(1,{_PQ_DSUB + 1}),
                   i -> (q.sv[i]-cb.cw[i])*(q.sv[i]-cb.cw[i])), 'sum'), 6)), 6) AS adist
      FROM sub q
      JOIN qassign qa ON qa.vec_id = q.vec_id
      JOIN enc x ON q.j = x.j AND x.vec_id <> q.vec_id
      JOIN assign xa ON xa.vec_id = x.vec_id AND xa.cent_id = qa.cent_id
      JOIN cb ON cb.j = x.j AND cb.code = x.code
      WHERE q.vec_id < {_PQ_N_QUERIES}
      GROUP BY q.vec_id, x.vec_id
    )
    SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
      FROM adc
    ) WHERE rn <= 3
    """,
    doc=(
        "IVF+PQ with nprobe=3 — the recall/cost knob every production IVF "
        "index exposes: scan the query's three nearest inverted lists "
        "instead of only its home cluster. Each (query, neighbor) pair "
        "still scores once (a neighbor lives in exactly one cluster; the "
        "qassign join matches at most one probe row). Cost grows linearly "
        "in nprobe — nprobe/|clusters| of the corpus per query — and "
        "recall rises as true neighbors across cluster boundaries come "
        "into view (measured in tests/test_ann_recall.py)."
    ),
)
def q_ann_ivfpq_probe3(spark: SparkSession, sf_dir: str):
    return _ann_ivfpq(spark, sf_dir, nprobe=3)


def _ann_ivfpq(spark: SparkSession, sf_dir: str, nprobe: int):
    """Shared IVF+PQ probe; ``nprobe`` is the recall/cost knob every real
    IVF index ships — scan the query's ``nprobe`` nearest inverted lists
    instead of only its home cluster. Cost grows linearly in nprobe
    (nprobe/|clusters| of the corpus scanned per query); recall rises as
    true neighbors straddling a cluster boundary come into view."""
    emb = read_table(spark, sf_dir, "embeddings")
    cb, q_rows = _pq_collect_cb_queries(emb)

    def normed(df):
        return df.select(
            F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
        ).withColumn("nrm", l2_norm(F.col("v")))

    assign = _ivf_assign(normed(fan_out(emb)))
    # Query->probe-set map: bounded collect (5 x nprobe rows). Runs the
    # assignment on a NON-fanned twin of the corpus — the vec_id filter
    # pushes through the rank window (vec_id is its partition key) to the
    # scan, so the job is 5 rows x |centroids|, not a corpus repartition;
    # the assignment math is deterministic, so both twins agree.
    qassign = _ivf_assign(normed(emb), keep_top=nprobe).filter(
        F.col("vec_id") < _PQ_N_QUERIES
    )
    qcents: dict[int, list[int]] = {}
    if nprobe == 1:
        for r in qassign.select("vec_id", "cent_id").collect():
            qcents[int(r.vec_id)] = [int(r.cent_id)]
    else:
        for r in qassign.select("vec_id", "cent_id", "rc").orderBy("vec_id", "rc").collect():
            qcents.setdefault(int(r.vec_id), []).append(int(r.cent_id))
    enc = _pq_encode(assign, cb, keep=("vec_id", "cent_id"))
    queries_lit = _pq_query_structs(q_rows, cb, qcents=qcents)
    # Inverted-list probe, row-local: keep only the queries whose probe set
    # contains THIS row's cluster (filter over the 5-element literal), then
    # explode. Plain explode (not outer) drops unprobed rows — IVF
    # semantics. Each (query, neighbor) pair still appears at most once:
    # a neighbor lives in exactly one cluster.
    probed = enc.withColumn(
        "q",
        F.explode(
            F.filter(
                queries_lit,
                lambda s: F.array_contains(s["qcents"], F.col("cent_id")),
            )
        ),
    ).filter(F.col("vec_id") != F.col("q.query_id"))
    return _pq_adc_topk(probed)


#: SemDeDup drop threshold — tuned to the fixture's similarity range (max
#: within-cluster cosine ≈ 0.48 on random unit vectors; real embedding
#: corpora use 0.95+). The MACHINERY is what scales, not the constant.
_SEMDEDUP_TAU = 0.30

#: Dominator cap (r11 verdict #5 — the LSH bucket-cap precedent applied to
#: SemDeDup's within-cluster pairwise stage): only the first CAP members of
#: each cluster in greedy order (ascending vec_id — the SAME order the
#: dominance-by-lower-id rule already uses) act as DOMINATORS. Pair volume
#: per cluster drops from |c|^2 to |c| * min(|c|, CAP) — linear in cluster
#: size — and for clusters <= CAP the result is IDENTICAL to the uncapped
#: semantics (every lower-id member is inside the prefix). The 30x probe
#: measured max_cluster_size 570 against the quantizer's ~50 design size:
#: 128 = 2.5x design leaves benign clusters untouched and bounds the
#: degenerate ones; truncation is observable (metrics + q_semdedup_capacity).
_SEMDEDUP_DOM_CAP = 128

#: One textual source of truth for the two-level-quantizer assignment CTE
#: chain — q_semdedup's and q_semdedup_capacity's oracles share it verbatim
#: (the q_lsh_pairs/q_lsh_bucket_stats convention).
_SEMDEDUP_ASSIGN_SQL = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), fine AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id % 50 = 0
    ), strd AS (
      SELECT GREATEST(1, CAST(floor(sqrt(count(*))) AS BIGINT)) AS s
      FROM fine
    ), coarse AS (
      SELECT cent_id AS co_id, cv AS cov, cnrm AS conrm
      FROM fine, strd WHERE cent_id % (50 * s) = 0
    ), fine_cell AS (
      SELECT cent_id, cv, cnrm, co_id FROM (
        SELECT f.cent_id, f.cv, f.cnrm, coarse.co_id,
               row_number() OVER (
                 PARTITION BY f.cent_id
                 ORDER BY round(list_dot_product(f.cv, coarse.cov) / (f.cnrm * coarse.conrm), 6) DESC,
                          coarse.co_id
               ) AS rc
        FROM fine f CROSS JOIN coarse
      ) WHERE rc = 1
    ), vec_cell AS (
      SELECT vec_id, v, nrm, co_id FROM (
        SELECT n.vec_id, n.v, n.nrm, coarse.co_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_dot_product(n.v, coarse.cov) / (n.nrm * coarse.conrm), 6) DESC,
                          coarse.co_id
               ) AS rc
        FROM n CROSS JOIN coarse
      ) WHERE rc = 1
    ), assign AS (
      SELECT vec_id, v, nrm, cent_id FROM (
        SELECT vc.vec_id, vc.v, vc.nrm, fc.cent_id,
               row_number() OVER (
                 PARTITION BY vc.vec_id
                 ORDER BY round(list_dot_product(vc.v, fc.cv) / (vc.nrm * fc.cnrm), 6) DESC,
                          fc.cent_id
               ) AS rf
        FROM vec_cell vc JOIN fine_cell fc USING (co_id)
      ) WHERE rf = 1
    )"""


@query(
    "q_semdedup",
    oracle=f"""{_SEMDEDUP_ASSIGN_SQL}, ranked AS (
      SELECT vec_id, v, nrm, cent_id,
             row_number() OVER (PARTITION BY cent_id ORDER BY vec_id) AS dom_rank
      FROM assign
    )
    SELECT a.vec_id, a.cent_id AS cluster,
           CAST(NOT EXISTS (
             SELECT 1 FROM ranked b
             WHERE b.cent_id = a.cent_id AND b.vec_id < a.vec_id
               AND b.dom_rank <= {_SEMDEDUP_DOM_CAP}
               AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {_SEMDEDUP_TAU}
           ) AS INTEGER) AS keep
    FROM assign a
    """,
    doc=(
        "SemDeDup (Abbas et al. 2023): semantic near-duplicate removal in "
        "embedding space, CLUSTER-BLOCKED — assign every vector to a fine "
        "cluster via the TWO-LEVEL quantizer (_ivf_assign_hier: "
        "sqrt-growing coarse routing, then constant-~50-size fine "
        "clusters), then drop "
        "any vector whose cosine to a LOWER-id vector in the SAME cluster "
        "reaches the threshold (dominance-by-lower-id: unlike the "
        "sequential greedy scan, a vector already marked dropped can still "
        "dominate later ones — a deterministic, fully-parallel variant "
        "that keeps at most as many vectors as greedy). Pairwise cost is "
        "sum of squared CLUSTER sizes, so cluster SIZE must stay constant "
        "as the corpus grows (the paper pins ~size: 50k clusters for "
        "LAION) — the hierarchy holds assignment to O(N * sqrt(k2)), "
        "subquadratic, where a flat nearest-of-N/50 rank was the r7 "
        "O(N^2/50) scale artifact (see _ivf_assign_hier for the honest "
        "asymptotics). Since r12 the DOMINATOR side is capped at the "
        "first 128 cluster members in greedy order (_SEMDEDUP_DOM_CAP — "
        "the LSH bucket-cap precedent), bounding per-cluster pairs to "
        "|c|*min(|c|,128): identical results for clusters <= 128, and a "
        "degenerate mega-cluster can no longer go quadratic; truncation "
        "is observable via q_semdedup_capacity. Emits "
        "every vector with its cluster and keep flag so the drop rate per "
        "cluster is auditable."
    ),
)
def q_semdedup(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    return semdedup_flags(emb)


#: Monotonic suffix for the SemDeDup CollectMetrics node (same rationale
#: as _LSH_OBSERVE_SEQ: node names must be unique within one plan).
_SEMDEDUP_OBSERVE_SEQ = count()


def semdedup_flags(emb, observation=None):
    """SemDeDup keep-flags for an embeddings frame (the q_semdedup core,
    callable with a ``pyspark.sql.Observation`` for programmatic metrics).

    Cluster skew is OBSERVABLE, not silent (the same contract as the LSH
    bucket cap at _lsh_candidate_pairs): the pairwise stage costs
    sum(|cluster|^2), so one degenerate giant cluster — a collapsed
    embedding space, a bad centroid draw — silently re-creates the
    quadratic corpus blowup SemDeDup exists to avoid. A CollectMetrics
    node reports max/p99 cluster size, the EXACT pairwise row count (sum
    over vectors of their cluster's size = sum of squared sizes) and the
    cluster count. Placement is load-bearing: metrics inside a subtree
    that AQE turns into a broadcast stage come back EMPTY (broadcast jobs
    bypass the observed-metrics flow), and the dropped-id set — which
    contains the whole pair join — broadcasts exactly in the small/benign
    regime. The window+observe therefore ride the LEFT side of the final
    left-outer join: Spark can only build-right a left-outer broadcast
    join, so that side is always streamed and the metrics always fire, at
    the cost of one narrow (vec_id, cent_id) exchange. Since r12 the pair
    join is ALSO bounded (dominator prefix cap, _SEMDEDUP_DOM_CAP): a
    degenerate mega-cluster costs |c| * cap instead of |c|^2, exactly as
    the LSH bucket cap bounds the banded join. The truncation is never
    silent — truncated_clusters/capped_pairwise_rows land in this
    observation and q_semdedup_capacity publishes the full audit table; a
    max_cluster_size near the corpus size still means the centroid set
    must be re-drawn or k raised (the cap bounds the COST of that data
    problem, it does not fix the clustering)."""
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    # Materialize the two-level quantizer assignment ONCE: three consumers
    # (pair-join probe side, capped dominator side, keep-flag base) would
    # otherwise each re-execute the O(N*sqrt(k2)) assignment subtree in one
    # plan — measured 2.78 -> 2.12 s at sf0.1 (r12 A/B), erasing the
    # dominator-cap window's cost. Production IVF materializes the
    # assignment anyway (that is what an index IS). eager=True keeps the
    # lazy-checkpoint first-action contract trivial (cf. graph.py); the
    # blocks live on executors — for a corpus that outgrows executor
    # memory, swap for persist(DISK_ONLY) or a reliable checkpoint dir.
    assign = _ivf_assign_hier(n).localCheckpoint(eager=True)
    a = assign.select(
        "cent_id", F.col("vec_id").alias("a_id"), F.col("v").alias("av"), F.col("nrm").alias("an")
    )
    # Dominator cap (r11 verdict #5): only the first _SEMDEDUP_DOM_CAP
    # members of each cluster in greedy order (ascending vec_id) sit on the
    # build side of the pair join — per-cluster pair volume is
    # |c| * min(|c|, cap) instead of |c|^2, and clusters <= cap produce
    # byte-identical results to the uncapped join (every lower-id member is
    # inside the prefix). One narrow row_number window on the cent_id
    # partitioning the join needs anyway.
    domw = Window.partitionBy("cent_id").orderBy("vec_id")
    b = (
        assign.withColumn("dom_rank", F.row_number().over(domw))
        .filter(F.col("dom_rank") <= _SEMDEDUP_DOM_CAP)
        .select(
            "cent_id",
            F.col("vec_id").alias("b_id"),
            F.col("v").alias("bv"),
            F.col("nrm").alias("bn"),
        )
    )
    sim = F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    dropped = (
        a.join(b, "cent_id")
        .filter(F.col("b_id") < F.col("a_id"))
        .filter(sim >= _SEMDEDUP_TAU)
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
    )
    flagged = assign.select("vec_id", "cent_id").withColumn(
        "csize", F.count(F.lit(1)).over(Window.partitionBy("cent_id"))
    )
    metrics = [
        F.max("csize").alias("max_cluster_size"),
        F.expr("approx_percentile(csize, 0.99)").alias("p99_cluster_size"),
        F.sum("csize").alias("pairwise_rows"),
        # Join-input volume AFTER the dominator cap: sum over vectors of
        # min(|cluster|, cap) = sum |c| * min(|c|, cap) — the bound the
        # cap actually enforces (pairwise_rows is the uncapped |c|^2 sum,
        # kept so the two are comparable in one observation).
        F.sum(F.least(F.col("csize"), F.lit(_SEMDEDUP_DOM_CAP))).alias(
            "capped_pairwise_rows"
        ),
        # DISTINCT aggregates are rejected inside CollectMetrics; the HLL
        # sketch is exact at any plausible cluster-count cardinality.
        F.approx_count_distinct(F.col("cent_id")).alias("n_clusters"),
        F.approx_count_distinct(
            F.when(F.col("csize") > _SEMDEDUP_DOM_CAP, F.col("cent_id"))
        ).alias("truncated_clusters"),
    ]
    if observation is not None:
        flagged = flagged.observe(observation, *metrics)
    else:
        flagged = flagged.observe(
            f"semdedup_cluster_stats_{next(_SEMDEDUP_OBSERVE_SEQ)}", *metrics
        )
    return flagged.drop("csize").join(
        dropped.withColumn("dropped", F.lit(1)), "vec_id", "left"
    ).select(
        "vec_id",
        F.col("cent_id").alias("cluster"),
        F.when(F.col("dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


#: Exact capped-pair count for a cluster of size n under the dominator
#: prefix cap: sum over members of min(rank-1, cap)
#:   = C(min(n, cap+1), 2) + max(0, n-cap-1)*cap.
#: Pure integer arithmetic — n*(n-1) is even, so integer-div by 2 is exact
#: on both engines. One textual source feeds Spark (div) and DuckDB (//).
def _capped_pairs_sql(idiv: str) -> str:
    cap = _SEMDEDUP_DOM_CAP
    return (
        f"CASE WHEN n <= {cap + 1} THEN (n * (n - 1)) {idiv} 2 "
        f"ELSE {cap * (cap + 1) // 2} + (n - {cap + 1}) * {cap} END"
    )


_SEMDEDUP_SIZE_CLASS_SQL = (
    "CASE WHEN n = 1 THEN 1 WHEN n <= 4 THEN 4 WHEN n <= 16 THEN 16 "
    "WHEN n <= 64 THEN 64 WHEN n <= 256 THEN 256 ELSE 1024 END"
)


@query(
    "q_semdedup_capacity",
    oracle=f"""{_SEMDEDUP_ASSIGN_SQL}, sizes AS (
      SELECT cent_id, count(*) AS n FROM assign GROUP BY cent_id
    )
    SELECT {_SEMDEDUP_SIZE_CLASS_SQL} AS size_class,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(n) AS BIGINT) AS n_vectors,
           CAST(max(n) AS BIGINT) AS max_cluster,
           CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS cand_pairs,
           CAST(sum({_capped_pairs_sql("//")}) AS BIGINT) AS capped_pairs,
           CAST(sum(CASE WHEN n > {_SEMDEDUP_DOM_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS truncated_clusters
    FROM sizes GROUP BY 1
    """,
    doc=(
        "SemDeDup cluster CAPACITY PLANNING (r11 verdict #5 — the "
        "q_lsh_bucket_stats twin for the embedding-space dedup): cluster "
        "counts/vectors/max size per size class (1, <=4, <=16, <=64, "
        "<=256, >256), the UNCAPPED within-cluster pair volume sum "
        "n*(n-1)/2 (the number that went 40x at a 30x input on the r11 "
        "probe), the pair volume under the production dominator cap "
        f"({_SEMDEDUP_DOM_CAP}; exact prefix-cap count "
        "C(min(n,cap+1),2) + max(0,n-cap-1)*cap), and how many clusters "
        "the cap truncates. truncated_clusters > 0 means the quantizer's "
        "~50-size design is being violated (re-draw centroids or raise "
        "k2); cand_pairs vs capped_pairs is the exact work bound of the "
        "dominance join. Runs ONLY the assignment + a size aggregate — no "
        "pair expansion — so the audit is strictly cheaper than the join "
        "it plans. Shares the two-level-quantizer CTE chain with "
        "q_semdedup's oracle verbatim and _ivf_assign_hier on the Spark "
        "side (one source of truth per engine)."
    ),
)
def q_semdedup_capacity(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    sizes = _ivf_assign_hier(n).groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
    return sizes.groupBy(F.expr(_SEMDEDUP_SIZE_CLASS_SQL).alias("size_class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.max("n").cast("bigint").alias("max_cluster"),
        F.expr("sum((n * (n - 1)) div 2)").cast("bigint").alias("cand_pairs"),
        F.expr(f"sum({_capped_pairs_sql('div')})").cast("bigint").alias("capped_pairs"),
        F.sum((F.col("n") > _SEMDEDUP_DOM_CAP).cast("long"))
        .cast("bigint")
        .alias("truncated_clusters"),
    )


@query(
    "q_semdedup_recall",
    oracle=f"""{_SEMDEDUP_ASSIGN_SQL}, sizes AS (
      SELECT cent_id, count(*) AS n FROM assign GROUP BY cent_id
    ), ranked AS (
      SELECT vec_id, v, nrm, cent_id,
             row_number() OVER (PARTITION BY cent_id ORDER BY vec_id) AS dom_rank
      FROM assign
    ), capped_drop AS (
      SELECT DISTINCT a.vec_id, a.cent_id
      FROM assign a JOIN ranked b
        ON b.cent_id = a.cent_id AND b.vec_id < a.vec_id
       AND b.dom_rank <= {_SEMDEDUP_DOM_CAP}
       AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {_SEMDEDUP_TAU}
    ), over_cl AS (
      SELECT cent_id FROM sizes WHERE n > {_SEMDEDUP_DOM_CAP}
    ), uncapped_drop_over AS (
      SELECT DISTINCT a.vec_id, a.cent_id
      FROM assign a
      JOIN over_cl o ON o.cent_id = a.cent_id
      JOIN assign b
        ON b.cent_id = a.cent_id AND b.vec_id < a.vec_id
       AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {_SEMDEDUP_TAU}
    ), cap_cnt AS (
      SELECT cent_id, count(*) AS capped_dropped FROM capped_drop GROUP BY cent_id
    ), unc_cnt AS (
      SELECT cent_id, count(*) AS uncapped_dropped FROM uncapped_drop_over GROUP BY cent_id
    ), percl AS (
      SELECT s.cent_id, s.n, s.n > {_SEMDEDUP_DOM_CAP} AS over_cap,
             COALESCE(c.capped_dropped, 0) AS capped_dropped,
             CASE WHEN s.n > {_SEMDEDUP_DOM_CAP}
                  THEN COALESCE(u.uncapped_dropped, 0)
                  ELSE COALESCE(c.capped_dropped, 0) END AS uncapped_dropped
      FROM sizes s
      LEFT JOIN cap_cnt c USING (cent_id)
      LEFT JOIN unc_cnt u USING (cent_id)
    )
    SELECT CASE WHEN over_cap THEN 'over_cap' ELSE 'under_cap' END AS scope,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(n) AS BIGINT) AS n_vectors,
           CAST(sum(uncapped_dropped) AS BIGINT) AS uncapped_dropped,
           CAST(sum(capped_dropped) AS BIGINT) AS capped_dropped,
           CAST(sum(uncapped_dropped) - sum(capped_dropped) AS BIGINT) AS missed_dropped,
           CAST(CASE WHEN sum(uncapped_dropped) = 0 THEN 1000000
                ELSE (1000000 * sum(capped_dropped)) // sum(uncapped_dropped)
           END AS BIGINT) AS agreement_ppm
    FROM percl GROUP BY 1
    """,
    doc=(
        "SemDeDup dominator-cap QUALITY audit (r12 verdict #2 — the recall "
        "twin of q_ann_recall_eval for the cap): q_semdedup_capacity counts "
        "the pairs the cap skips; this measures what that truncation COSTS "
        "in missed duplicates. Because the capped dominator set (first "
        f"{_SEMDEDUP_DOM_CAP} cluster members in greedy order) is a strict "
        "subset of the uncapped one, capped drops are a subset of uncapped "
        "drops, so removed-set agreement = capped/uncapped exactly — "
        "reported as floor-integer ppm (engine-portable, no float division). "
        "The UNCAPPED |c|^2 join — the very stage the cap exists to bound — "
        "runs ONLY on over-cap clusters (under-cap clusters are "
        "byte-identical under both rules by the prefix argument, audited "
        "for free from the production capped join), so the audit costs "
        "sum over over-cap clusters of |c|^2, zero when the quantizer's "
        "size design holds. Output is one row per scope "
        "('over_cap'/'under_cap') with cluster/vector counts, both drop "
        "counts, missed_dropped and agreement_ppm; schema is stable at any "
        "SF (no over-cap clusters => the single under_cap row at "
        "agreement 1000000). The 30x/100x probe lines record the measured "
        "recall at scale (SCALE_PROBE30/100.json)."
    ),
)
def q_semdedup_recall(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    # Same materialize-once contract as semdedup_flags: the assignment
    # feeds four consumers (sizes, probe side, both dominator sides).
    assign = _ivf_assign_hier(n).localCheckpoint(eager=True)
    sizes = assign.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
    a = assign.select(
        "cent_id",
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    sim = F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    domw = Window.partitionBy("cent_id").orderBy("vec_id")
    b_capped = (
        assign.withColumn("dom_rank", F.row_number().over(domw))
        .filter(F.col("dom_rank") <= _SEMDEDUP_DOM_CAP)
        .select(
            "cent_id",
            F.col("vec_id").alias("b_id"),
            F.col("v").alias("bv"),
            F.col("nrm").alias("bn"),
        )
    )
    capped_drop = (
        a.join(b_capped, "cent_id")
        .filter(F.col("b_id") < F.col("a_id"))
        .filter(sim >= _SEMDEDUP_TAU)
        .select("cent_id", F.col("a_id").alias("vec_id"))
        .distinct()
    )
    # Uncapped dominators, over-cap clusters ONLY — the cluster-id list is
    # tiny (over-cap clusters are the design violation) and broadcasts.
    over_cl = sizes.filter(F.col("n") > _SEMDEDUP_DOM_CAP).select("cent_id")
    b_all = assign.select(
        "cent_id",
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    uncapped_drop_over = (
        a.join(F.broadcast(over_cl), "cent_id")
        .join(b_all, "cent_id")
        .filter(F.col("b_id") < F.col("a_id"))
        .filter(sim >= _SEMDEDUP_TAU)
        .select("cent_id", F.col("a_id").alias("vec_id"))
        .distinct()
    )
    cap_cnt = capped_drop.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("capped_dropped")
    )
    unc_cnt = uncapped_drop_over.groupBy("cent_id").agg(
        F.count(F.lit(1)).alias("uncapped_dropped")
    )
    percl = (
        sizes.join(cap_cnt, "cent_id", "left")
        .join(unc_cnt, "cent_id", "left")
        .select(
            F.col("n"),
            (F.col("n") > _SEMDEDUP_DOM_CAP).alias("over_cap"),
            F.coalesce(F.col("capped_dropped"), F.lit(0)).alias("capped_dropped"),
            F.when(
                F.col("n") > _SEMDEDUP_DOM_CAP,
                F.coalesce(F.col("uncapped_dropped"), F.lit(0)),
            )
            .otherwise(F.coalesce(F.col("capped_dropped"), F.lit(0)))
            .alias("uncapped_dropped"),
        )
    )
    return percl.groupBy(
        F.when(F.col("over_cap"), F.lit("over_cap"))
        .otherwise(F.lit("under_cap"))
        .alias("scope")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.sum("uncapped_dropped").cast("bigint").alias("uncapped_dropped"),
        F.sum("capped_dropped").cast("bigint").alias("capped_dropped"),
        (F.sum("uncapped_dropped") - F.sum("capped_dropped"))
        .cast("bigint")
        .alias("missed_dropped"),
        F.when(F.sum("uncapped_dropped") == 0, F.lit(1000000))
        .otherwise(
            F.expr("(1000000 * sum(capped_dropped)) div sum(uncapped_dropped)")
        )
        .cast("bigint")
        .alias("agreement_ppm"),
    )


#: The append batch — arrivals replayed from the corpus by id residue
#: (shared by q_semdedup_incremental here and the q_ann_incremental /
#: q_index_rebalance lifecycle below).
_ANN_INC_BATCH_MOD = 10
_ANN_INC_BATCH_RES = 7


@query(
    "q_semdedup_incremental",
    oracle=f"""{_SEMDEDUP_ASSIGN_SQL}, corpus_ranked AS (
      SELECT vec_id, v, nrm, cent_id,
             row_number() OVER (PARTITION BY cent_id ORDER BY vec_id) AS dom_rank
      FROM assign WHERE vec_id % {_ANN_INC_BATCH_MOD} <> {_ANN_INC_BATCH_RES}
    ), batch_ranked AS (
      SELECT vec_id, v, nrm, cent_id,
             row_number() OVER (PARTITION BY cent_id ORDER BY vec_id) AS dom_rank
      FROM assign WHERE vec_id % {_ANN_INC_BATCH_MOD} = {_ANN_INC_BATCH_RES}
    ), batch AS (
      SELECT vec_id, v, nrm, cent_id FROM assign
      WHERE vec_id % {_ANN_INC_BATCH_MOD} = {_ANN_INC_BATCH_RES}
    ), dom_c AS (
      SELECT b.vec_id, min(d.vec_id) AS c_match
      FROM batch b JOIN corpus_ranked d
        ON d.cent_id = b.cent_id AND d.dom_rank <= {_SEMDEDUP_DOM_CAP}
       AND round(list_dot_product(b.v, d.v) / (b.nrm * d.nrm), 6) >= {_SEMDEDUP_TAU}
      GROUP BY b.vec_id
    ), dom_p AS (
      SELECT b.vec_id, min(d.vec_id) AS p_match
      FROM batch b JOIN batch_ranked d
        ON d.cent_id = b.cent_id AND d.vec_id < b.vec_id
       AND d.dom_rank <= {_SEMDEDUP_DOM_CAP}
       AND round(list_dot_product(b.v, d.v) / (b.nrm * d.nrm), 6) >= {_SEMDEDUP_TAU}
      GROUP BY b.vec_id
    ), csz AS (
      SELECT cent_id,
             CAST(max(dom_rank) > {_SEMDEDUP_DOM_CAP} AS INTEGER) AS c_over
      FROM corpus_ranked GROUP BY cent_id
    ), psz AS (
      SELECT cent_id,
             CAST(max(dom_rank) > {_SEMDEDUP_DOM_CAP} AS INTEGER) AS p_over
      FROM batch_ranked GROUP BY cent_id
    )
    SELECT b.vec_id, b.cent_id AS cluster,
           CAST(CASE WHEN c.c_match IS NULL AND p.p_match IS NULL
                THEN 1 ELSE 0 END AS INTEGER) AS keep,
           CAST(LEAST(COALESCE(c.c_match, p.p_match),
                      COALESCE(p.p_match, c.c_match)) AS BIGINT) AS match_id,
           CAST(COALESCE(s.c_over, 0) + COALESCE(z.p_over, 0) > 0 AS INTEGER)
             AS screened_truncated
    FROM batch b
    LEFT JOIN dom_c c USING (vec_id)
    LEFT JOIN dom_p p USING (vec_id)
    LEFT JOIN csz s ON s.cent_id = b.cent_id
    LEFT JOIN psz z ON z.cent_id = b.cent_id
    """,
    doc=(
        "Dedup-on-INGEST for the embedding store — the SemDeDup twin of "
        "q_neardup_incremental, completing the incremental family (exact: "
        "q_dedup_incremental, MinHash: q_neardup_incremental, semantic: "
        "THIS): an append batch (vec_id % 10 == 7, the q_ann_incremental "
        "replay convention) is screened against the indexed corpus WITHOUT "
        "re-deduplicating the corpus. The two-level quantizer is FROZEN by "
        "construction — fine centroids are the every-50th-id subset, and "
        "every multiple of 50 has residue 0 mod 10, so the centroid set "
        "is corpus-only and batch arrivals cannot move it. Each batch "
        "vector is dropped if a corpus member of its cluster (capped at "
        f"the first {_SEMDEDUP_DOM_CAP} corpus members in id order — the "
        "q_semdedup dominator-cap contract) or a LOWER-id batch peer in "
        "the same cluster reaches the cosine threshold; emits keep flag + "
        "the lowest dominating vec_id (the cluster-representative join "
        "key), and a per-row screened_truncated flag — 1 when the "
        "cluster's corpus or batch membership exceeds the cap, so a "
        "clearance obtained against a truncated dominator prefix is "
        "distinguishable from a clean clear (the q_neardup_incremental "
        "contract) — one row per batch vector. Self-contained form recomputes "
        "the corpus assignment (the index IS that assignment — production "
        "reads it from the store, making the ingest path O(batch x cap) "
        "joins plus the batch's own O(|batch| * sqrt(k2)) quantizer "
        "routing); the assignment is localCheckpointed once for its five "
        "consumers. Cluster-size skew and cap truncation for these exact "
        "clusters are audited by q_semdedup_capacity."
    ),
)
def q_semdedup_incremental(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    assign = _ivf_assign_hier(n).localCheckpoint(eager=True)
    is_batch = F.col("vec_id") % _ANN_INC_BATCH_MOD == _ANN_INC_BATCH_RES
    batch = assign.filter(is_batch)
    corpus = assign.filter(~is_batch)
    domw = Window.partitionBy("cent_id").orderBy("vec_id")

    def dominators(df):
        return (
            df.withColumn("dom_rank", F.row_number().over(domw))
            .filter(F.col("dom_rank") <= _SEMDEDUP_DOM_CAP)
            .select(
                "cent_id",
                F.col("vec_id").alias("d_id"),
                F.col("v").alias("dv"),
                F.col("nrm").alias("dn"),
            )
        )

    b = batch.select(
        "cent_id",
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    sim = F.round(dot(F.col("bv"), F.col("dv")) / (F.col("bn") * F.col("dn")), 6)
    dom_c = (
        b.join(dominators(corpus), "cent_id")
        .filter(sim >= _SEMDEDUP_TAU)
        .groupBy("b_id")
        .agg(F.min("d_id").alias("c_match"))
    )
    dom_p = (
        b.join(dominators(batch), "cent_id")
        .filter(F.col("d_id") < F.col("b_id"))
        .filter(sim >= _SEMDEDUP_TAU)
        .groupBy("b_id")
        .agg(F.min("d_id").alias("p_match"))
    )
    # Truncation is observable per row, not silent (the
    # q_neardup_incremental screened_truncated contract): a batch vector
    # whose cluster's corpus OR batch membership exceeds the dominator cap
    # was screened against a PREFIX, so its clearance is weaker evidence —
    # downstream can route flagged keeps to a full re-check.
    c_over = (
        corpus.groupBy("cent_id")
        .agg((F.count(F.lit(1)) > _SEMDEDUP_DOM_CAP).cast("int").alias("c_over"))
    )
    p_over = (
        batch.groupBy("cent_id")
        .agg((F.count(F.lit(1)) > _SEMDEDUP_DOM_CAP).cast("int").alias("p_over"))
    )
    return (
        batch.select("vec_id", "cent_id", F.col("cent_id").alias("cluster"))
        .join(dom_c.withColumnRenamed("b_id", "vec_id"), "vec_id", "left")
        .join(dom_p.withColumnRenamed("b_id", "vec_id"), "vec_id", "left")
        .join(F.broadcast(c_over), "cent_id", "left")
        .join(F.broadcast(p_over), "cent_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("c_match").isNull() & F.col("p_match").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("keep"),
            F.least(
                F.coalesce("c_match", "p_match"), F.coalesce("p_match", "c_match")
            )
            .cast("bigint")
            .alias("match_id"),
            (
                F.coalesce(F.col("c_over"), F.lit(0))
                + F.coalesce(F.col("p_over"), F.lit(0))
                > 0
            )
            .cast("int")
            .alias("screened_truncated"),
        )
    )


_LEXICONS = {
    "en": ["the", "a", "of", "and", "row"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "de", "y", "un"],
    "fr": ["le", "la", "de", "et", "un"],
}

#: Shared lexicon-hit SQL columns + the deterministic-argmax CASE —
#: ONE textual source of truth for q_lang_id's and q_lang_confusion's
#: oracles (the Spark twin is _lang_hits/_lang_pred below).
_LANG_HITS_SQL = ", ".join(
    "len(list_filter(string_split(text, ' '), t -> list_contains(["
    + ", ".join("'" + w + "'" for w in ws)
    + "], t))) AS hits_" + l
    for l, ws in _LEXICONS.items()
)
_LANG_PRED_SQL = """CASE
             WHEN hits_de > hits_en AND hits_de > hits_es AND hits_de > hits_fr AND hits_de > 0 THEN 'de'
             WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
             WHEN hits_es >= hits_fr AND hits_es > 0 THEN 'es'
             WHEN hits_fr > 0 THEN 'fr'
             ELSE 'und'
           END"""


def _lang_hits():
    """Per-lexicon hit-count Columns over the `text` column (row-local)."""
    toks = F.split(F.col("text"), " ")
    hits = {}
    for lang, words in _LEXICONS.items():
        lex = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))
    return hits


def _lang_pred(hits):
    """Deterministic-argmax predicted language (de > en >= es >= fr
    priority, 'und' when no lexicon hits) — the Spark twin of
    _LANG_PRED_SQL."""
    return (
        F.when(
            (hits["de"] > hits["en"])
            & (hits["de"] > hits["es"])
            & (hits["de"] > hits["fr"])
            & (hits["de"] > 0),
            F.lit("de"),
        )
        .when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0),
            F.lit("en"),
        )
        .when((hits["es"] >= hits["fr"]) & (hits["es"] > 0), F.lit("es"))
        .when(hits["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


@query(
    "q_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           {_LANG_PRED_SQL} AS pred_lang,
           hits_en, hits_de, hits_es, hits_fr
    FROM (
      SELECT doc_id, lang, {_LANG_HITS_SQL}
      FROM documents
    )
    """,
    doc=(
        "Language ID by stopword-lexicon hit counting with a deterministic "
        "argmax (de > en >= es >= fr priority, 'und' when no hits). The fixture "
        "corpus shares one vocabulary across langs, so most docs resolve to the "
        "lexicon containing shared tokens — the operator is the deliverable."
    ),
)
def q_lang_id(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    hits = _lang_hits()
    pred = _lang_pred(hits)
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["es"].alias("hits_es"),
        hits["fr"].alias("hits_fr"),
    )


def _srp_planes(n_planes: int = 8, dim: int = 64) -> list[list[int]]:
    """Deterministic ternary hyperplanes for signed-random-projection LSH
    (fixed LCG; values in {-1, 0, +1}). One source of truth feeds both the
    Spark columns and the DuckDB oracle literals, so the two engines bucket
    identically. Ternary keeps the projection a plain +/- sum of vector
    components — cheap and sparse (about 2/3 of terms drop out)."""
    x, planes = 1_234_567, []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (1_103_515_245 * x + 12_345) % (1 << 31)
            row.append((x >> 16) % 3 - 1)
        planes.append(row)
    return planes


_SRP = _srp_planes()


@query(
    "q_ann_lsh",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), b AS (
      SELECT vec_id, v, nrm,
             {" + ".join(
               f"(CASE WHEN round(list_dot_product(v, {plane}::DOUBLE[]), 6) >= 0 "
               f"THEN {1 << j} ELSE 0 END)"
               for j, plane in enumerate(_SRP)
             )} AS bucket
      FROM n
    )
    SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rnk
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                        c.vec_id
             ) AS rn
      FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ) WHERE rn <= 3
    """,
    doc=(
        "LSH-bucketed ANN (signed random projection): 8 ternary hyperplanes "
        "-> 256 buckets; candidates are corpus vectors in the query's bucket. "
        "The complement of IVF: no centroid pass, purely data-independent "
        "hashing, so bucketing is a narrow map (bucket-key groupBy is the "
        "only shuffle). Recall tunes with plane count / multi-probe."
    ),
)
def q_ann_lsh(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    bucket = None
    for j, plane in enumerate(_SRP):
        proj = F.round(dot(F.col("v"), inline_literal([float(w) for w in plane])), 6)
        bit = F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    b = n.withColumn("bucket", bucket)
    q = b.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    sim = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    wr = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        b.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sim", "rnk")
    )


_JACCARD_SQL = (
    "CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)"
    " / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))"
)


@query(
    "q_neardup_dedup",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ), sig AS (
      SELECT doc_id, {_SQL_SIG_SELECT.replace(chr(10), ' ')}
      FROM sh
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), ver AS (
      SELECT doc_a, doc_b
      FROM cand
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b
      WHERE {_JACCARD_SQL} >= 0.8
    ), nb AS (
      SELECT doc_a AS doc, doc_b AS nbr FROM ver
      UNION ALL
      SELECT doc_b AS doc, doc_a AS nbr FROM ver
    ), rep AS (
      SELECT doc, min(nbr) AS mn FROM nb GROUP BY doc
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN rep ON d.doc_id = rep.doc
    WHERE rep.doc IS NULL OR d.doc_id < rep.mn
    """,
    doc=(
        "End-to-end near-duplicate DEDUP: LSH candidate generation -> exact "
        "shingle-Jaccard verification (>= 0.8) -> keep local-minimum "
        "representatives (a doc survives unless a verified near-duplicate "
        "with a smaller id exists). One-hop representative pick, not full "
        "connected components — transitive chains keep one doc per hop "
        "neighborhood, which is the standard single-pass approximation; "
        "full CC needs an iterative join loop. Verification cost is "
        "O(|candidates|), never O(n^2)."
    ),
)
def q_neardup_dedup(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    # The shingle table feeds three consumers (candidate generation + both
    # verification sides); Spark recomputes the shared subplan per consumer.
    # A persist() here trades that recompute for cache materialization —
    # measured a wash at sf0.1 (codegen-warm) and a 2.3x win only on a cold
    # JVM. At 100 TB the signature table is CHECKPOINTED once and reused
    # across dedup runs, which is the durable form of the same trade.
    ver = _verified_neardup_pairs(docs)
    nb = ver.select(F.col("doc_a").alias("doc"), F.col("doc_b").alias("nbr")).unionAll(
        ver.select(F.col("doc_b").alias("doc"), F.col("doc_a").alias("nbr"))
    )
    rep = nb.groupBy("doc").agg(F.min("nbr").alias("mn"))
    return (
        docs.join(rep, docs.doc_id == rep.doc, "left")
        .filter(F.col("doc").isNull() | (F.col("doc_id") < F.col("mn")))
        .select("doc_id", "lang", "source")
    )


@query(
    "q_edit_distance",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(a.text, 1, 48), substr(b.text, 1, 48)) AS dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 2
    WHERE levenshtein(substr(a.text, 1, 48), substr(b.text, 1, 48)) <= 8
    """,
    doc=(
        "Levenshtein edit-distance verification over blocked pairs (same "
        "lang, near-identical length): the character-level dedup verifier "
        "for short strings where token Jaccard is too coarse. Distance runs "
        "on a 48-char prefix — edit distance is O(len^2) per pair, so at "
        "scale you bound the operand, block aggressively (here: lang + "
        "length), or pre-filter candidates with LSH."
    ),
)
def q_edit_distance(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars", F.substring("text", 1, 48).alias("pref")
    )
    joined = _length_blocked_join(docs, payload={"pref": "pref"}, tol=2)
    return (
        joined.withColumn("dist", F.levenshtein("pref_a", "pref_b"))
        .filter(F.col("dist") <= 8)
        .select("doc_a", "doc_b", "dist")
    )


_SH_BANDS, _SH_BITS_PER_BAND, _SH_MAX_HAMMING = 4, 8, 3


@query(
    "q_simhash_pairs",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {dh.sql_token_hash_list("string_split(text, ' ')")} AS hs
      FROM documents
    ), s AS (
      SELECT doc_id, {dh.sql_simhash_sum('hs')} AS sh FROM h
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, sh, (sh // {(1 << (_SH_BITS_PER_BAND * j))}) % {1 << _SH_BITS_PER_BAND} AS band_val, {j} AS band_id FROM s"
        for j in range(_SH_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {_SH_MAX_HAMMING}
    """,
    doc=(
        "SimHash near-dup pairs: band the 32-bit fingerprint into 4x8-bit "
        "keys, bucket-join candidates, verify exact Hamming distance <= 3 "
        "(pigeonhole: any pair within distance 3 shares at least one of 4 "
        "bands — recall is exact, not probabilistic). Fingerprints are 8 "
        "bytes/doc, so the candidate stage shuffles fingerprints, never "
        "documents — the cheapest of the near-dup families at scale."
    ),
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    _hs = dh.sparksql_token_hash_list("split(text, ' ')")
    hashed = docs.selectExpr("doc_id", f"{_hs} AS hs")
    s = hashed.selectExpr("doc_id", f"{dh.sparksql_simhash('hs')} AS sh")
    bands = s.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sh"), _SH_BITS_PER_BAND * j)
                    .bitwiseAND(F.lit((1 << _SH_BITS_PER_BAND) - 1))
                    .alias(f"b{j}")
                    for j in range(_SH_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    # ROUND-ROBIN respread of the bucket table before pair expansion: the
    # bucket aggregate's exchange is tiny in BYTES (<= bands * 2^bits
    # rows), so AQE coalesces it to ONE partition and the CPU-heavy
    # |bucket|^2 pair explode below ran in a single task (measured: a
    # 1-task stage inside the 5.2-6.1 s warm wall at sf0.1; 3.5-4.2 s
    # spread, the remainder being the md5-per-token scan itself). A
    # same-key repartition would be optimizer-removed as
    # redundant with the aggregate's own partitioning (the q_bootstrap_ci
    # lesson), so round-robin with an explicit count it is. The count is
    # the CONFIGURED cluster width, not a literal 32 (r13: a hard-coded
    # local-core constant would under-spread any real cluster — the
    # brief's scale-adaptive-partitioning rule; local default is
    # unchanged since spark.sql.shuffle.partitions == $SPARK_GRAFT_CPUS).
    buckets = (
        bands.groupBy("band_id", "band_val")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "sh"))).alias("ds"))
        .filter(F.size("ds") >= 2)
        .repartition(configured_shuffle_partitions(spark))
    )
    pairs = F.explode(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda a, i: F.transform(
                    F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                    lambda b: F.struct(
                        a["doc_id"].alias("doc_a"),
                        b["doc_id"].alias("doc_b"),
                        a["sh"].alias("sh_a"),
                        b["sh"].alias("sh_b"),
                    ),
                ),
            )
        )
    )
    cand = (
        buckets.select(pairs.alias("p"))
        .select("p.doc_a", "p.doc_b", "p.sh_a", "p.sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= _SH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "q_minhash_est_jaccard",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             {_SQL_SIG_SELECT}
      FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS sh
        FROM documents WHERE len(string_split(text, ' ')) >= 3
      )
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           ({" + ".join(f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(16))})
             / 16.0 AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = doc_a
    JOIN sig sb ON sb.doc_id = doc_b
    """,
    doc=(
        "MinHash-estimated Jaccard for LSH candidate pairs: the fraction of "
        "matching signature components is an unbiased estimator of the true "
        "Jaccard (stderr ~ 1/sqrt(16) ~ 0.25 at 16 perms). The cheap middle "
        "tier between candidate generation and exact shingle verification — "
        "compares 16 ints per pair instead of two shingle sets."
    ),
)
def q_minhash_est_jaccard(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    # ONE signature pass shared by all three consumers (banding + both
    # pair sides): the before-plan ran the shingle+md5+minhash subtree
    # three times, once per consumer (three documents scans,
    # plans/r13/q_minhash_est_jaccard_before.txt; isolated best-of-3
    # 5.48 s -> see _after plan/bench). Signatures are 17 ints/doc —
    # the cheapest possible thing to materialize. eager KEPT (r14): the
    # interleaved fresh-JVM A/B measured the lazy variant ~15% slower
    # here (AB_R14_CKPT_LAZY.json) — lazy lets the three consumers'
    # stages race and duplicate the shared signature compute. NOT a
    # lazy plan constructor: building this frame runs the
    # materialization job (r13 ADVICE #2 contract note).
    sig = (
        _shingle_hashes(docs)
        .selectExpr("doc_id", *dh.sparksql_minhash_signature("hs"))
        .localCheckpoint(eager=True)
    )
    cand = _lsh_candidate_pairs(docs, sig=sig)
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(c).alias(f"a_{c}") for c in _SIG_COLS])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(c).alias(f"b_{c}") for c in _SIG_COLS])
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in _SIG_COLS
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (matches / F.lit(16.0)).alias("est_jaccard"))
    )


#: Oracle shared by q_neardup_components and q_neardup_components_star:
#: both must produce the identical (doc_id, component=min reachable id)
#: labeling, so one recursive-CTE fixpoint checks both algorithms.
_COMPONENTS_ORACLE = f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ), sig AS (
      SELECT doc_id, {_SQL_SIG_SELECT.replace(chr(10), ' ')}
      FROM sh
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), ver AS (
      SELECT doc_a, doc_b
      FROM cand
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b
      WHERE {_JACCARD_SQL} >= 0.8
    ), und AS (
      SELECT doc_a AS a, doc_b AS b FROM ver
      UNION
      SELECT doc_b AS a, doc_a AS b FROM ver
    ), reach AS (
      SELECT a AS node, a AS lbl FROM und
      UNION
      SELECT u.a AS node, r.lbl FROM und u JOIN reach r ON u.b = r.node
    ), comp AS (
      SELECT node, min(lbl) AS lbl FROM reach GROUP BY node
    )
    SELECT d.doc_id, CAST(coalesce(c.lbl, d.doc_id) AS BIGINT) AS component
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """


@query(
    "q_neardup_components",
    oracle=_COMPONENTS_ORACLE,
    doc=(
        "EXACT near-dup clusters: verified LSH pairs -> connected "
        "components via iterative min-label propagation "
        "(operators/graph.py) — a transitive chain a~b~c lands in ONE "
        "cluster even though (a,c) was never compared. Each round is one "
        "join + one min-aggregate with lineage checkpointed; the oracle is "
        "DuckDB's recursive CTE computing the same min-reachable-label "
        "fixpoint. Docs in no verified pair are their own singleton "
        "component."
    ),
)
def q_neardup_components(spark: SparkSession, sf_dir: str):
    from ..operators.graph import connected_components

    docs = read_table(spark, sf_dir, "documents")
    ver = _verified_neardup_pairs(docs)
    comp = connected_components(ver, src="doc_a", dst="doc_b")
    return docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


@query(
    "q_neardup_components_star",
    oracle=_COMPONENTS_ORACLE,
    doc=(
        "Same contract as q_neardup_components — (doc_id, component=min "
        "reachable id) over the verified near-dup graph — computed by the "
        "alternating large-star/small-star algorithm (Kiveris et al.) "
        "instead of min-label propagation. O(log^2 n) rounds regardless of "
        "graph DIAMETER: the scale path for adversarial shapes (long "
        "chains, deep trees) where propagation needs O(diameter) rounds. "
        "Shares the recursive-CTE oracle with q_neardup_components, so a "
        "green driver row proves both algorithms produce the identical "
        "labeling on the same fixture graph."
    ),
)
def q_neardup_components_star(spark: SparkSession, sf_dir: str):
    from ..operators.graph import connected_components_star

    docs = read_table(spark, sf_dir, "documents")
    ver = _verified_neardup_pairs(docs)
    comp = connected_components_star(ver, src="doc_a", dst="doc_b")
    return docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


_KMEANS_IVF_K = 16
_KMEANS_IVF_ITERS = 3
_KMEANS_IVF_SCALE = 1_000_000


def _kmeans_cte_chain(
    k: int, iters: int, scale: int, where: str = ""
) -> tuple[str, str]:
    """Shared unrolled-Lloyd's CTE prefix for the trained-centroid oracles
    (q_kmeans_ivf counts, q_ann_ivf_trained search, q_ann_incremental
    append): quantize -> hash seeds -> iters x (argmin assignment +
    integer mean update). ``where`` restricts the TRAINING set (e.g.
    q_ann_incremental trains on a fixed-size subsample so the trainer
    cost is corpus-independent). Returns
    (prefix_sql, final_centroid_cte_name).

    ``e`` is AS MATERIALIZED: it is referenced by every unrolled
    iteration plus the final assignment, and DuckDB re-inlines plain
    CTEs per reference (the repo's verified DuckDB-1.x rule for
    generated iterative oracles), re-casting the corpus each time."""
    h = dh.sql_token_hash("CAST(vec_id AS VARCHAR)")
    dist = _KMEANS_DIST
    parts = [
        f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {scale}.0, 0) AS BIGINT)) AS v
      FROM embeddings {where}
    ), c0 AS (
      SELECT rn - 1 AS cluster, v AS cv FROM (
        SELECT v, row_number() OVER (ORDER BY {h}, vec_id) AS rn FROM e
      ) WHERE rn <= {k}
    )"""
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(
            f""", a{it} AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {dist} ASC, c.cluster ASC) AS rc
        FROM e CROSS JOIN {prev} c
      ) WHERE rc = 1
    ), m{it} AS (
      SELECT cluster, list(m ORDER BY pos) AS mv FROM (
        SELECT cluster, pos, CAST(round(avg(x), 0) AS BIGINT) AS m
        FROM (SELECT cluster, unnest(v) AS x,
                     unnest(range(1, len(v) + 1)) AS pos FROM a{it})
        GROUP BY cluster, pos
      ) GROUP BY cluster
    ), c{it} AS (
      SELECT c.cluster, COALESCE(m.mv, c.cv) AS cv
      FROM {prev} c LEFT JOIN m{it} m ON m.cluster = c.cluster
    )"""
        )
        prev = f"c{it}"
    return "".join(parts), prev


_KMEANS_DIST = (
    "list_sum(list_transform(range(1, len(e.v) + 1), "
    "i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))"
)


def _kmeans_ivf_sql(k: int, iters: int, scale: int) -> str:
    """Unrolled Lloyd's k-means as a single DuckDB statement.

    Mirrors operators/cluster.kmeans_train in quantize mode CTE-for-step:
    seeds = k smallest (md5-hash, id); each iteration one argmin
    assignment (integer squared distance, ties toward the lower cluster
    index) + one half-up-rounded integer mean update (empty clusters keep
    their previous centroid via the LEFT JOIN COALESCE); final assignment
    feeds the per-cluster counts. Exact integer arithmetic end-to-end is
    what makes the iterative loop hash-matchable at all — float means
    would drift between engines by summation order."""
    prefix, prev = _kmeans_cte_chain(k, iters, scale)
    return (
        prefix
        + f""", af AS (
      SELECT cluster FROM (
        SELECT e.vec_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_KMEANS_DIST} ASC, c.cluster ASC) AS rc
        FROM e CROSS JOIN {prev} c
      ) WHERE rc = 1
    )
    SELECT CAST(cluster AS INTEGER) AS cluster, count(*) AS n_vectors
    FROM af GROUP BY 1"""
    )


#: Exact integer squared L2 between a probe row q and a candidate row x —
#: shared by BOTH trained-index oracles so the serving query and its
#: recall audit can never rank by different distances.
_PAIR_D2 = (
    "list_sum(list_transform(range(1, len(q.v) + 1), "
    "i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i])))"
)


def _trained_af_cte(prev: str) -> str:
    """The trained final-assignment CTE (vec_id, v, cluster) — ONE text
    shared by _ann_ivf_trained_sql and _ann_recall_trained_sql: the recall
    audit is only meaningful if it audits the exact index the serving
    query builds, so the CTE must be literally the same string.

    AS MATERIALIZED because both consumers self-join ``af`` (probe side
    x candidate side) and the recall oracle references it twice more —
    a plain CTE would re-run the whole unrolled Lloyd chain per
    reference."""
    return f""", af AS MATERIALIZED (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_KMEANS_DIST} ASC, c.cluster ASC) AS rc
        FROM e CROSS JOIN {prev} c
      ) WHERE rc = 1
    )"""


def _ann_ivf_trained_sql(k: int, iters: int, scale: int) -> str:
    """The q_kmeans_ivf refinement chain, finished as an ANN SEARCH: final
    assignment keeps (vec_id, v, cluster), probe queries (vec_id < 5) scan
    only their own trained cluster, rank by EXACT integer squared distance
    with vec_id tie-break — no rounding anywhere, so the top-k cut cannot
    disagree between engines."""
    prefix, prev = _kmeans_cte_chain(k, iters, scale)
    return (
        prefix
        + _trained_af_cte(prev)
        + f"""
    SELECT query_id, neighbor_id, CAST(d2 AS BIGINT) AS d2,
           CAST(rn AS INTEGER) AS rnk
    FROM (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             {_PAIR_D2} AS d2,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_PAIR_D2} ASC, x.vec_id
             ) AS rn
      FROM af q JOIN af x
        ON q.cluster = x.cluster AND x.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ) WHERE rn <= 3"""
    )


@query(
    "q_kmeans_ivf",
    oracle=_kmeans_ivf_sql(_KMEANS_IVF_K, _KMEANS_IVF_ITERS, _KMEANS_IVF_SCALE),
    doc=(
        "IVF index build with TRAINED centroids: deterministic Lloyd's "
        "k-means (operators/cluster.py — driver-coordinated loop, each "
        "round a narrow argmin assignment + one k x dim mean aggregate), "
        "then per-cluster population counts. Upgrades q_ann_ivf's fixed "
        "centroid subset to refined centroids; determinism (hash-seeded "
        "init, index tie-breaks) makes the index build reproducible. "
        "Runs the trainer's QUANTIZE mode (1e-6 microunit grid, exact "
        "integer distance/mean arithmetic), which upgrades this from the "
        "rows-only tier to a full hash-match oracle: the DuckDB twin "
        "unrolls the identical three refinement rounds as CTEs. Integer "
        "mean exactness assumes per-cluster coordinate sums stay under "
        "2^53 (holds through ~1e12 rows at unit-scale embeddings)."
    ),
)
def q_kmeans_ivf(spark: SparkSession, sf_dir: str):
    from ..operators.cluster import kmeans_train

    emb = fan_out(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    assigned, _cents, _sse = kmeans_train(
        emb, k=_KMEANS_IVF_K, max_iter=_KMEANS_IVF_ITERS, quantize=_KMEANS_IVF_SCALE
    )
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )


@query(
    "q_kmeans_assign",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
      SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, e.v, cent.cent_id,
             round(list_dot_product(e.v, e.v)
                   - 2 * list_dot_product(e.v, cent.cv)
                   + list_dot_product(cent.cv, cent.cv), 6) AS d2
      FROM e CROSS JOIN cent
    ), assign AS (
      SELECT vec_id, v, cent_id, d2 FROM (
        SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY d2 ASC, cent_id ASC) AS rc
        FROM scored
      ) WHERE rc = 1
    )
    SELECT cent_id                 AS cluster,
           count(*)                AS n_vectors,
           round(avg(d2), 4)       AS avg_sq_dist,
           round(avg(v[1]), 6)     AS mean_x0
    FROM assign GROUP BY cent_id
    """,
    doc=(
        "One Lloyd's round with FIXED centroids (vec_id < 8): argmin "
        "squared-distance assignment + per-cluster count / mean-distance / "
        "coordinate mean. This is the value oracle for the k-means trainer "
        "math (q_kmeans_ivf's iterative loop is not one SQL statement, but "
        "a single round is): centroid side broadcast, corpus never shuffled "
        "except the final k-row aggregate. Tie-breaks on rounded distance "
        "then centroid id, so assignment is reproducible across engines."
    ),
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str):
    raw = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    emb = fan_out(raw)
    # Inline the k x dim centroid matrix as an array literal (same move as
    # cluster._assign): k=8 centroids fit the driver by construction, and
    # the argmin then runs NARROW — no 8x-row crossJoin shuffle, no
    # per-vec_id window; the only exchange left is the final k-row agg.
    # Collected from the NON-fanned twin: the vec_id predicate pushes to
    # the scan instead of riding a corpus repartition shuffle.
    cents = (
        raw.filter(F.col("vec_id") < 8).orderBy("vec_id").select("vec_id", "v").collect()
    )
    # One expr-string literal (operators/scale.inline_literal) — the
    # per-element form costs 8 x 64 py4j hops per plan build.
    cent_arr = inline_literal(
        [
            {"cent_id": int(r.vec_id), "cv": [float(x) for x in r.v]}
            for r in cents
        ]
    )
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), c["cv"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("d2"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    # struct ordering = (rounded d2, cent_id) — identical tie-break to the
    # oracle's ORDER BY d2, cent_id.
    best = F.array_min(scored)
    assign = emb.select(
        "v", best["cent_id"].cast("long").alias("cluster"), best["d2"].alias("d2")
    )
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("d2"), 4).alias("avg_sq_dist"),
        F.round(F.avg(F.col("v")[0]), 6).alias("mean_x0"),
    )


_SQL_SHINGLES5 = dh.sql_word_shingles("text", k=5)


@query(
    "q_containment",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT doc_a, doc_b, containment_a, containment_b
    FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh), 6)
               AS containment_a,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(b.sh), 6)
               AS containment_b
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 5
    )
    WHERE greatest(containment_a, containment_b) >= 0.2
    """,
    doc=(
        "Shingle containment |A∩B|/|A| (and /|B|) over the same blocked "
        "candidate pairs as q_ngram_jaccard: the asymmetric twin of "
        "Jaccard that catches SUBSET duplicates — a doc quoted or "
        "excerpted inside a larger one scores near-1 containment but low "
        "Jaccard, so a Jaccard-only dedup pipeline ships the excerpt "
        "twice. Same blocking, same cost envelope."
    ),
)
def q_containment(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    sh = docs.filter(F.size(F.split(F.col("text"), " ")) >= 3).selectExpr(
        "doc_id", "lang", "n_chars", f"{dh.sparksql_word_shingles('text', 3)} AS sh"
    )
    joined = _length_blocked_join(sh, payload={"sh": "sh"}, tol=5)
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    ca = F.round(inter.cast("double") / F.size("sh_a"), 6)
    cb = F.round(inter.cast("double") / F.size("sh_b"), 6)
    return (
        joined.select(
            "doc_a", "doc_b",
            ca.alias("containment_a"), cb.alias("containment_b"),
        )
        .filter(F.greatest("containment_a", "containment_b") >= 0.2)
    )


@query(
    "q_contamination",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_SHINGLES5} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 5
    ), bench AS (
      SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id < 20
    ), corpus AS (
      SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g
      FROM sh WHERE doc_id >= 20
    )
    SELECT doc_id,
           CAST(n_shingles AS INTEGER)                      AS n_shingles,
           count(*)                                         AS n_overlap,
           round(CAST(count(*) AS DOUBLE) / n_shingles, 6)  AS contamination
    FROM corpus JOIN bench USING (g)
    GROUP BY doc_id, n_shingles
    """,
    doc=(
        "Benchmark-contamination screen: 5-gram shingle overlap between "
        "each corpus document and a benchmark set (stand-in: doc_id<20). "
        "The benchmark shingle set is exploded+distinct'd once and "
        "BROADCAST — the corpus side streams through the join and only "
        "matching (doc, shingle) rows reach the aggregate, so cost is "
        "O(matches), never a doc-by-doc comparison. The decontamination "
        "step every LLM training corpus runs against eval sets."
    ),
)
def q_contamination(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    sh = docs.filter(F.size(F.split(F.col("text"), " ")) >= 5).selectExpr(
        "doc_id", f"{dh.sparksql_word_shingles('text', 5)} AS sh"
    )
    # explode_outer, NOT explode: plain explode makes Catalyst infer
    # size(sh) > 0 and push it into the parquet scan's filter — which
    # re-evaluates the whole 5-gram shingle expression per row INSIDE the
    # single-split scan task, serializing the dominant cost before the
    # fan_out repartition can spread it (measured 10.6 s -> sub-second at
    # sf0.1). explode_outer infers nothing; the g filter below runs on the
    # generated column, above the shuffle, fully parallel.
    bench = F.broadcast(
        sh.filter(F.col("doc_id") < 20)
        .select(F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    corpus = (
        sh.filter(F.col("doc_id") >= 20)
        .select("doc_id", F.size("sh").alias("n_shingles"), F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    return (
        corpus.join(bench, "g")
        .groupBy("doc_id", "n_shingles")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.col("n_shingles"), 6
            ).alias("contamination"),
        )
    )


@query(
    "q_lang_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT coalesce(lang, '(null)') AS true_lang,
             {_LANG_PRED_SQL} AS pred_lang
      FROM (
        SELECT lang, {_LANG_HITS_SQL}
        FROM documents
      )
    ), cells AS (
      SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ), margins AS (
      SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1
    )
    SELECT c.true_lang, c.pred_lang, c.n, m.n_true,
           CAST(c.n * 1000000 // m.n_true AS BIGINT) AS cell_ppm
    FROM cells c JOIN margins m USING (true_lang)
    """,
    doc=(
        "Language-ID confusion matrix: the q_lang_id heuristic evaluated "
        "against the labeled lang column — per-(true, predicted) counts "
        "plus each cell's share of its true-language row (recall lives on "
        "the diagonal) — the eval table that decides whether a cheap "
        "n-gram/lexicon classifier is good enough to route documents at "
        "100 TB or a model-based pass is needed. Reuses the identical "
        "prediction expression (one source of truth via _LEXICONS), "
        "row-local scoring, then a |langs|^2-bounded cell aggregate with "
        "margins derived FROM the cell aggregate (no second corpus "
        "pass); shares as exact integer ppm. True lang is coalesced to "
        "'(null)' BEFORE grouping so unlabeled docs form an auditable "
        "row instead of vanishing from the NULL-key join."
    ),
)
def q_lang_confusion(spark: SparkSession, sf_dir: str):
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    pred = _lang_pred(_lang_hits())
    cells = (
        docs.select(
            F.coalesce(F.col("lang"), F.lit("(null)")).alias("true_lang"),
            pred.alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    margins = cells.groupBy("true_lang").agg(
        F.sum("n").cast("bigint").alias("n_true")
    )
    return cells.join(margins, "true_lang").select(
        "true_lang",
        "pred_lang",
        "n",
        "n_true",
        F.expr("CAST(n * 1000000 div n_true AS BIGINT)").alias("cell_ppm"),
    )


@query(
    "q_ann_recall_eval",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                          c.vec_id
               ) AS rn
        FROM n q JOIN n c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      ) WHERE rn <= 3
    ), cent AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      WHERE vec_id % 50 = 0 AND vec_id < 3200
    ), assign AS (
      SELECT vec_id, v, nrm, cent_id FROM (
        SELECT n.vec_id, n.v, n.nrm, cent.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                          cent.cent_id
               ) AS rc
        FROM n CROSS JOIN cent
      ) WHERE rc = 1
    ), ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
                          c.vec_id
               ) AS rn
        FROM assign q JOIN assign c
          ON q.cent_id = c.cent_id AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      ) WHERE rn <= 3
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
           CAST(count(i.neighbor_id) * 1000000 // count(*) AS BIGINT)
             AS recall_ppm
    FROM exact e LEFT JOIN ivf i
      ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
    GROUP BY e.query_id
    """,
    doc=(
        "ANN quality audit IN-QUERY: recall@3 of the q_ann_ivf index "
        "(nprobe=1) against the exact cosine top-3 for the probe queries "
        "— the metric an ANN deployment monitors continuously (recall "
        "silently decays as the corpus drifts from the centroids; the "
        "pytest recall floors check this at build time, THIS query is "
        "the production-shaped audit that runs beside the index). Exact "
        "side: probe queries broadcast against the corpus (the "
        "q_cosine_topk shape — |queries| x corpus, never corpus x "
        "corpus); IVF side: the identical _ivf_assign machinery as "
        "q_ann_ivf; both rankings round cosine to 6dp with vec_id "
        "tie-break so the top-k cut is engine-identical. Recall is an "
        "exact integer-ppm division; a LEFT join from exact to IVF "
        "means missing neighbors count against recall instead of "
        "vanishing."
    ),
)
def q_ann_recall_eval(spark: SparkSession, sf_dir: str):
    emb = fan_out(read_table(spark, sf_dir, "embeddings"))
    n = emb.select(
        F.col("vec_id"), as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    probes = F.broadcast(
        n.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    sim = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    wr = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    exact = (
        n.join(probes, F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    ivf = _ivf_topk(_ivf_assign(n)).select("query_id", "neighbor_id")
    hit = ivf.withColumn("hit", F.lit(1))
    return (
        exact.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("hit").cast("bigint").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.expr("CAST(n_hit * 1000000 div n_exact AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


@query(
    "q_dup_cluster_stats",
    oracle="""
    WITH clusters AS (
      SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS cluster_size
      FROM documents GROUP BY 1
    )
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS dup_docs
    FROM clusters GROUP BY cluster_size
    """,
    doc=(
        "Duplicate-cluster size histogram: exact-duplicate clusters "
        "(md5 fingerprint, the q_doc_fingerprint key) bucketed by size, "
        "with document and removable-duplicate counts per bucket — the "
        "'duplication profile' table dataset cards report (sum of "
        "dup_docs / sum of n_docs = the corpus's exact-dup inflation; "
        "a heavy tail here says boilerplate, a fat size-2 row says "
        "mirroring). Two stacked partial+final aggregates — fingerprint "
        "then size — the second over |clusters| rows with at most "
        "|distinct sizes| groups; nothing corpus-sized is windowed, "
        "shuffle keys are constant-width digests."
    ),
)
def q_dup_cluster_stats(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    clusters = (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("bigint").alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("dup_docs"),
    ).select(
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        "n_clusters",
        "n_docs",
        "dup_docs",
    )


#: Near-dup threshold sweep grid (Jaccard, ppm): the epsilon-tuning table
#: for the dedup pipeline — how many pairs/docs a given cutoff would touch.
_NEARDUP_SWEEP_PPM = [300000, 500000, 700000]


@query(
    "q_neardup_threshold_sweep",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id,
             {_SQL_SIG_SELECT}
      FROM (
        SELECT doc_id, {_SQL_SHINGLES} AS sh
        FROM documents WHERE len(string_split(text, ' ')) >= 3
      )
    ), bands AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_hash, {i} AS band_id FROM sig"
        for i, b in enumerate(_SQL_BANDS)
      )}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ), pairs AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                  AS BIGINT) AS uni
      FROM cand c
      JOIN sh a ON c.doc_a = a.doc_id
      JOIN sh b ON c.doc_b = b.doc_id
    ), ts AS (
      SELECT unnest({_NEARDUP_SWEEP_PPM!r}) AS t_ppm
    ), hits AS (
      SELECT t_ppm, doc_a, doc_b FROM pairs CROSS JOIN ts
      WHERE inter * 1000000 >= t_ppm * uni
    ), np AS (
      SELECT t_ppm, CAST(count(*) AS BIGINT) AS n_pairs FROM hits GROUP BY 1
    ), nd AS (
      SELECT t_ppm, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
      FROM (SELECT t_ppm, unnest([doc_a, doc_b]) AS d FROM hits) GROUP BY 1
    )
    SELECT ts.t_ppm,
           CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs
    FROM ts LEFT JOIN np USING (t_ppm) LEFT JOIN nd USING (t_ppm)
    """,
    doc=(
        "Near-dedup threshold tuning table: for each candidate Jaccard "
        "cutoff (0.3 / 0.5 / 0.7), how many exactly-verified pairs fire "
        "and how many documents they touch — the sweep a curation team "
        "reads before pinning the dedup epsilon (q_precision_recall's "
        "analogue for the dedup pipeline: the knob-vs-blast-radius "
        "table). Candidates come from the SAME capped LSH band buckets "
        "as q_neardup_dedup — not the (lang, length-bucket) all-pairs "
        "verify, which measured a 21x wall ratio at the 10x probe (the "
        "x10 synthesis puts ~10 near-copies per neighborhood, so blocked "
        "candidate pairs grow ~quadratically; LSH buckets bound the "
        "expansion at C(cap,2) per bucket). The sweep therefore measures "
        "exactly what production would act on: the pairs the index "
        "surfaces. The threshold test is pure integer arithmetic "
        "(inter * 1e6 >= t * union — no double division anywhere), so "
        "boundary pairs cannot flip between engines. The 3-row threshold "
        "grid rides a broadcast nested loop; counts are two bounded "
        "aggregates over the hit set, LEFT-joined back onto the grid so "
        "a threshold that fires nothing reports 0/0 instead of silently "
        "vanishing from the tuning table. Candidate-verify scaffolding "
        "is shared with q_neardup_dedup via _candidate_pair_overlap — "
        "the sweep provably tunes against the SAME pairs the dedup acts "
        "on."
    ),
)
def q_neardup_threshold_sweep(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    pairs = _candidate_pair_overlap(docs)
    ts = spark.createDataFrame([(t,) for t in _NEARDUP_SWEEP_PPM], "t_ppm INT")
    hits = pairs.join(F.broadcast(ts)).filter(
        F.col("inter") * 1000000 >= F.col("t_ppm").cast("long") * F.col("uni")
    )
    # ONE aggregate over the exploded pair stream (r13): n_pairs and
    # n_docs used to be two separate aggregates over `hits`, each
    # re-running the whole LSH+verify chain (Catalyst shares nothing
    # across aggregate consumers). Every hit contributes exactly two
    # exploded rows, so count(*) div 2 IS the pair count — exact integer
    # identity, and the chain now runs once per action.
    both = hits.select(
        "t_ppm", F.explode(F.array("doc_a", "doc_b")).alias("d")
    )
    stats = both.groupBy("t_ppm").agg(
        F.expr("count(*) div 2").cast("bigint").alias("n_pairs"),
        F.countDistinct("d").cast("bigint").alias("n_docs"),
    )
    return (
        ts.join(stats, "t_ppm", "left")
        .select(
            "t_ppm",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        )
    )


@query(
    "q_silhouette",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
      SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, cent.cent_id,
             CAST(floor((list_dot_product(e.v, e.v)
                         - 2 * list_dot_product(e.v, cent.cv)
                         + list_dot_product(cent.cv, cent.cv))
                        * 1000000.0 + 0.5) AS BIGINT) AS d2
      FROM e CROSS JOIN cent
    ), ranked AS (
      SELECT vec_id, cent_id, d2,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, cent_id ASC) AS rc
      FROM scored
    ), pair AS (
      SELECT o.vec_id, o.cent_id AS cluster,
             sqrt(o.d2 / 1000000.0) AS a, sqrt(s.d2 / 1000000.0) AS b
      FROM ranked o JOIN ranked s
        ON o.vec_id = s.vec_id AND o.rc = 1 AND s.rc = 2
    ), sil AS (
      SELECT cluster,
             CAST(floor((CASE WHEN greatest(a, b) > 0
                               THEN (b - a) / greatest(a, b)
                               ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)
               AS sq
      FROM pair
    )
    SELECT cluster,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(sq) AS BIGINT)  AS sum_s_micro,
           CAST(sum(sq) AS DOUBLE) / (1000000.0 * count(*)) AS avg_silhouette,
           CAST(sum(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM sil GROUP BY cluster
    """,
    doc=(
        "Simplified silhouette score per cluster (Hruschka et al.'s "
        "centroid-based variant): a = distance to the OWN centroid, b = "
        "distance to the nearest OTHER centroid, s = (b-a)/max(a,b) — the "
        "cluster-quality metric that closes the loop the trainer family "
        "opened (q_kmeans_assign fits, q_kmeans_ivf iterates, THIS "
        "evaluates; s < 0 marks points closer to a foreign centroid, "
        "i.e. candidate misassignments). The full-silhouette all-pairs "
        "matrix is O(n^2) and dead at scale; the centroid variant is "
        "row-local given the broadcast k x dim matrix — the SAME inlined "
        "argmin array as q_kmeans_assign, with own/second-best read from "
        "one array_sort of the k-struct scores (tie-break (d2, cent_id) "
        "textually identical to the oracle's rank). d2 uses the SAME "
        "dot-product expansion (v.v - 2 v.c + c.c) on both engines and is "
        "floor-quantized to int64 micro-units BEFORE ranking, so the "
        "(d2, cent_id) order can never flip on a rounding tie; per-row s "
        "is floor-quantized the same way before the cluster sum, so "
        "aggregation is exact integer addition at any parallelism; only "
        "the final mean divides. Degenerate corpora with fewer than two "
        "centroids yield the empty frame (matching the oracle's rc=2 "
        "join, which drops every vector). Shape: narrow scan -> one "
        "k-row aggregate."
    ),
)
def q_silhouette(spark: SparkSession, sf_dir: str):
    raw = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    emb = fan_out(raw)
    cents = (
        raw.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("vec_id", "v")
        .collect()
    )
    # <2 centroids: the oracle's rc=2 self-join drops every vector, so
    # both engines must yield the EMPTY frame. This cannot be a filter
    # bolted onto the normal plan — with ZERO centroids F.array() types
    # as array<void> and the transform's c["cv"] fails at ANALYSIS (the
    # r8 guard crashed there; caught by
    # test_properties_r9.test_silhouette_degenerate) — so degenerate
    # corpora return the typed empty frame before any centroid
    # expression is built.
    if len(cents) < 2:
        return spark.createDataFrame(
            [],
            "cluster bigint, n_vectors bigint, sum_s_micro bigint, "
            "avg_silhouette double, n_negative bigint",
        )
    cent_arr = inline_literal(
        [
            {"cent_id": int(r.vec_id), "cv": [float(x) for x in r.v]}
            for r in cents
        ]
    )
    # Same dot-product expansion as the oracle (v.v - 2 v.c + c.c), with
    # c.c evaluated by the SAME Spark fold over the literal centroid array
    # (constant-folded once per plan), then floor-quantized to int64
    # micro-units BEFORE ranking — identical pre-quantization FP text on
    # both engines, so a value near a rounding boundary can never rank
    # differently across them.
    vv = dot(F.col("v"), F.col("v"))
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.floor(
                (vv - 2.0 * dot(F.col("v"), c["cv"]) + dot(c["cv"], c["cv"]))
                * 1000000.0
                + 0.5
            )
            .cast("bigint")
            .alias("d2"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    ranked = F.array_sort(scored)  # struct order = (d2, cent_id), oracle's rank
    own = F.element_at(ranked, 1)
    nxt = F.element_at(ranked, 2)
    a = F.sqrt(own["d2"] / F.lit(1000000.0))
    b = F.sqrt(nxt["d2"] / F.lit(1000000.0))
    s = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    sil = emb.select(
        own["cent_id"].cast("long").alias("cluster"),
        F.floor(s * 1000000.0 + 0.5).cast("bigint").alias("sq"),
    )
    return sil.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum("sq").cast("bigint").alias("sum_s_micro"),
        (F.sum("sq").cast("double") / (F.lit(1000000.0) * F.count(F.lit(1))))
        .alias("avg_silhouette"),
        F.sum(F.when(F.col("sq") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_negative"),
    )


@query(
    "q_ann_ivf_trained",
    oracle=_ann_ivf_trained_sql(_KMEANS_IVF_K, _KMEANS_IVF_ITERS, _KMEANS_IVF_SCALE),
    doc=(
        "ANN search over the TRAINED IVF index — the production "
        "composition the verdict's X3 story builds to: q_kmeans_ivf's "
        "deterministic Lloyd's trainer (k pinned at train time, "
        "hash-seeded, exact integer microunit arithmetic) produces the "
        "coarse quantizer, every vector lands in its trained cluster, "
        "and the probe queries (vec_id < 5) scan ONLY their own "
        "inverted list, ranked by EXACT integer squared L2 with vec_id "
        "tie-break — zero FP anywhere after the upfront quantization, "
        "so the oracle (the same unrolled refinement CTEs, finished as "
        "a search instead of counts) matches bit-for-bit by "
        "construction. Scale shape: training cost is iters x (narrow "
        "argmin vs k broadcast centroids + one k x dim mean), search "
        "is |corpus|/k of the corpus per query; k is FIXED at train "
        "time, so unlike the retired vec_id%50 fixture rule nothing "
        "here grows with N except linearly."
    ),
)
def q_ann_ivf_trained(spark: SparkSession, sf_dir: str):
    _assigned, topk = _trained_search(spark, sf_dir)
    return topk


def _trained_search(spark: SparkSession, sf_dir: str):
    """Shared trained-index machinery for q_ann_ivf_trained and its recall
    audit: returns (assigned, topk) — the per-vector trained-cluster
    assignment (quantized microunit vectors riding along) and the probe
    queries' in-cluster integer-L2 top-3."""
    from ..operators.cluster import kmeans_train

    emb = fan_out(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    assigned, _cents, _sse = kmeans_train(
        emb, k=_KMEANS_IVF_K, max_iter=_KMEANS_IVF_ITERS, quantize=_KMEANS_IVF_SCALE
    )
    # cluster is argmin over a non-empty literal centroid array — never
    # NULL — but the equi-join below would still infer IsNotNull(cluster)
    # and push the ENTIRE inlined k x dim distance expression into the
    # parquet scan as a DataFilter, re-evaluating it per row inside the
    # scan task (the explode-pushdown class; gated registry-wide). The
    # coalesce is a no-op on values whose IsNotNull constant-folds to
    # true, so nothing is pushed and the distance evaluates once.
    assigned = assigned.withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.lit(-1))
    )
    q = assigned.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cluster").alias("qc"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), "vec_id")
    topk = (
        assigned.join(
            F.broadcast(q),
            (F.col("cluster") == F.col("qc"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("d2", d2)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("d2").cast("bigint").alias("d2"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
    return assigned, topk


def _ann_recall_trained_sql(k: int, iters: int, scale: int) -> str:
    """Recall@3 of the TRAINED index vs the exact integer-L2 top-3 — the
    q_ann_recall_eval audit re-aimed at the kmeans-trained quantizer.
    Assignment CTE and distance text shared verbatim with
    _ann_ivf_trained_sql (_trained_af_cte / _PAIR_D2)."""
    prefix, prev = _kmeans_cte_chain(k, iters, scale)
    pair_d2 = _PAIR_D2
    return (
        prefix
        + _trained_af_cte(prev)
        + f""", exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {pair_d2} ASC, x.vec_id
               ) AS rn
        FROM e q JOIN e x ON x.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      ) WHERE rn <= 3
    ), ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {pair_d2} ASC, x.vec_id
               ) AS rn
        FROM af q JOIN af x
          ON q.cluster = x.cluster AND x.vec_id <> q.vec_id
        WHERE q.vec_id < 5
      ) WHERE rn <= 3
    )
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(i.neighbor_id) AS BIGINT) AS n_hit,
           CAST(count(i.neighbor_id) * 1000000 // count(*) AS BIGINT)
             AS recall_ppm
    FROM exact e LEFT JOIN ivf i
      ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
    GROUP BY e.query_id"""
    )


@query(
    "q_ann_recall_trained",
    oracle=_ann_recall_trained_sql(
        _KMEANS_IVF_K, _KMEANS_IVF_ITERS, _KMEANS_IVF_SCALE
    ),
    doc=(
        "Recall@3 audit of the TRAINED IVF index (q_ann_ivf_trained) "
        "against the exact integer-L2 top-3 — completing the production "
        "story: q_kmeans_ivf trains, q_ann_ivf_trained serves, THIS "
        "monitors the quality the index actually delivers as the corpus "
        "drifts from the trained centroids. Same shape as "
        "q_ann_recall_eval: exact side is probes-broadcast-vs-corpus "
        "(|queries| x N, never N^2), index side shares _trained_search's "
        "assignment verbatim, every ranking is EXACT integer squared L2 "
        "with vec_id tie-break (zero FP after quantization — the hash "
        "oracle is exact by construction), recall an integer-ppm "
        "division with missing neighbors counted against it via the "
        "LEFT join."
    ),
)
def q_ann_recall_trained(spark: SparkSession, sf_dir: str):
    assigned, topk = _trained_search(spark, sf_dir)
    probes = F.broadcast(
        assigned.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
        )
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), "vec_id")
    exact = (
        assigned.join(probes, F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    ivf = topk.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    # One aggregation of each quantity, ppm DERIVED from the aliases (the
    # q_ann_recall_eval pattern): a future edit to the hit predicate can
    # never make n_hit and recall_ppm silently disagree.
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("hit").cast("bigint").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.expr("CAST(n_hit * 1000000 div n_exact AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
    )


#: q_ann_incremental: the trainer sees only this fixed-size id prefix, so
#: index maintenance cost is corpus-independent (production trains the
#: coarse quantizer on a bounded sample; FAISS's train() contract).
#: (The append-batch residue constants _ANN_INC_BATCH_MOD/_RES live next
#: to the SemDeDup block above — q_semdedup_incremental shares the same
#: replayed-arrivals convention and its oracle f-string needs them at
#: definition time.)
_ANN_INC_TRAIN_MAX = 500


def _ann_incremental_sql(k: int, iters: int, scale: int) -> str:
    """Append-batch maintenance of the trained IVF index: the unrolled
    Lloyd chain runs on the FIXED-SIZE training prefix only, then the
    batch rows are assigned to the FROZEN final centroids (argmin exact
    integer L2, cluster-index tie-break — the _assign contract) and the
    per-cluster delta counts ride along via a window-free aggregate
    join."""
    prefix, prev = _kmeans_cte_chain(
        k, iters, scale, where=f"WHERE vec_id < {_ANN_INC_TRAIN_MAX}"
    )
    return (
        prefix
        + f""", eb AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {scale}.0, 0) AS BIGINT)) AS v
      FROM embeddings
      WHERE vec_id % {_ANN_INC_BATCH_MOD} = {_ANN_INC_BATCH_RES}
    ), asg AS (
      SELECT vec_id, cluster, d2 FROM (
        SELECT e.vec_id, c.cluster, {_KMEANS_DIST} AS d2,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_KMEANS_DIST} ASC, c.cluster ASC) AS rc
        FROM eb e CROSS JOIN {prev} c
      ) WHERE rc = 1
    ), delta AS (
      SELECT cluster, count(*) AS n_new FROM asg GROUP BY cluster
    )
    SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
           CAST(a.d2 AS BIGINT) AS d2, CAST(d.n_new AS BIGINT) AS n_new
    FROM asg a JOIN delta d USING (cluster)"""
    )


@query(
    "q_ann_incremental",
    oracle=_ann_incremental_sql(
        _KMEANS_IVF_K, _KMEANS_IVF_ITERS, _KMEANS_IVF_SCALE
    ),
    doc=(
        "Incremental maintenance of the TRAINED IVF index — the piece a "
        "production embedding store exercises daily (FAISS add_with_ids): "
        "append a batch of new vectors WITHOUT retraining and WITHOUT "
        "touching the indexed corpus. The coarse quantizer is trained "
        "once on a FIXED-SIZE prefix (vec_id < 500 — production trains "
        "on a bounded sample, so trainer cost is corpus-independent), "
        "frozen, and the batch (vec_id % 10 == 7, arrivals replayed by "
        "id residue) is assigned to those centroids via the same narrow "
        "inlined-argmin pass the trainer uses: O(batch x k), no shuffle "
        "on the batch path, exact integer microunit arithmetic so the "
        "assignment AND distances hash-match the unrolled-CTE oracle "
        "bit-for-bit. Emits the updated serving assignment (vec_id, "
        "cluster, d2) with per-cluster delta counts joined back from a "
        "k-row aggregate (broadcast — never a k-key window over the "
        "batch, which would bound parallelism by k at scale). Completes "
        "the index lifecycle: q_kmeans_ivf trains, q_ann_ivf_trained "
        "serves, q_ann_recall_trained audits, THIS maintains — the "
        "vector twin of q_dedup_incremental's O(batch) contract."
    ),
)
def q_ann_incremental(spark: SparkSession, sf_dir: str):
    from ..operators.cluster import _assign, kmeans_train

    emb = fan_out(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    train = emb.filter(F.col("vec_id") < _ANN_INC_TRAIN_MAX)
    _assigned, cents, _sse = kmeans_train(
        train,
        k=_KMEANS_IVF_K,
        max_iter=_KMEANS_IVF_ITERS,
        quantize=_KMEANS_IVF_SCALE,
    )
    batch = emb.filter(
        F.col("vec_id") % _ANN_INC_BATCH_MOD == _ANN_INC_BATCH_RES
    ).withColumn(
        "v",
        F.transform(
            F.col("v"),
            lambda x: F.round(x * F.lit(float(_KMEANS_IVF_SCALE)), 0).cast(
                "long"
            ),
        ),
    )
    # The delta equi-join below would infer IsNotNull(cluster) and push
    # the ENTIRE inlined k x dim argmin expression into the parquet scan
    # as a DataFilter, re-evaluating it per row inside the scan task (the
    # explode-pushdown class; gated registry-wide). cluster is argmin
    # over a non-empty literal array — never NULL — so the coalesce is a
    # value no-op that blocks the pushdown (same move as _trained_search).
    # localCheckpoint: both the delta aggregate and the serving join
    # consume `assigned`; without materialization the O(batch x k)
    # inlined-argmin projection plans (and runs) TWICE — once under the
    # aggregate, once under the join's probe side (r9 verdict #5; the
    # q_token_budget_mix precedent). The batch is a bounded slice
    # (vec_id % mod == res), so the checkpoint is small by construction.
    assigned = (
        _assign(batch, "v", cents, integer=True)
        .select(
            "vec_id",
            F.coalesce(F.col("cluster"), F.lit(-1)).cast("int").alias("cluster"),
            F.col("__d").cast("bigint").alias("d2"),
        )
        .localCheckpoint(eager=True)
    )
    delta = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    return assigned.join(F.broadcast(delta), "cluster").select(
        "vec_id", "cluster", "d2", "n_new"
    )


#: q_pq_train: per-subspace trainer iterations. Two Lloyd rounds per
#: subspace — the PQ codebook refinement plateaus fast at k=8/dsub=16,
#: and every extra round quadruples the oracle's unrolled-CTE cost
#: (4 subspaces x rounds).
_PQ_TRAIN_ITERS = 2
#: Fixed-size training prefix — the same bounded-sample contract as
#: q_ann_incremental's coarse quantizer (FAISS ProductQuantizer.train
#: runs on a sample, never the corpus), so trainer cost is
#: corpus-independent.
_PQ_TRAIN_MAX = 500


def _pq_train_cte_chain(
    m: int, dsub: int, k: int, iters: int, scale: int, train_max: int
) -> tuple[str, str]:
    """Per-subspace unrolled Lloyd's — the q_kmeans_ivf chain generalized
    with a subspace dimension j: one materialized sliced/quantized corpus
    CTE, seeds per j are the SAME k smallest (hash, vec_id) rows (the
    id-hash doesn't depend on j, mirroring the Spark loop that calls
    kmeans_train per slice), each round an argmin assignment partitioned
    by (j, vec_id) + an integer mean update grouped by (j, cluster).
    Returns (prefix_sql, final_codebook_cte) — shared by the trainer
    oracle (q_pq_train) and the trained-serving oracle
    (q_ann_pq_trained), so they can never train different codebooks."""
    h = dh.sql_token_hash("CAST(vec_id AS VARCHAR)")
    dist = _KMEANS_DIST
    parts = [
        f"""
    WITH e0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fv
      FROM embeddings WHERE vec_id < {train_max}
    ), e AS MATERIALIZED (
      SELECT vec_id, j,
             list_transform(fv[1 + {dsub}*j : {dsub}*(j+1)],
                            x -> CAST(round(x * {scale}.0, 0) AS BIGINT)) AS v
      FROM e0 CROSS JOIN (SELECT unnest(range({m})) AS j)
    ), c0 AS (
      SELECT j, rn - 1 AS cluster, v AS cv FROM (
        SELECT j, v, row_number() OVER (
                 PARTITION BY j ORDER BY {h}, vec_id) AS rn FROM e
      ) WHERE rn <= {k}
    )"""
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(
            f""", a{it} AS (
      SELECT j, vec_id, v, cluster FROM (
        SELECT e.j, e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.j, e.vec_id
                 ORDER BY {dist} ASC, c.cluster ASC) AS rc
        FROM e JOIN {prev} c ON c.j = e.j
      ) WHERE rc = 1
    ), m{it} AS (
      SELECT j, cluster, list(mm ORDER BY pos) AS mv FROM (
        SELECT j, cluster, pos, CAST(round(avg(x), 0) AS BIGINT) AS mm
        FROM (SELECT j, cluster, unnest(v) AS x,
                     unnest(range(1, len(v) + 1)) AS pos FROM a{it})
        GROUP BY j, cluster, pos
      ) GROUP BY j, cluster
    ), c{it} AS (
      SELECT c.j, c.cluster, COALESCE(m.mv, c.cv) AS cv
      FROM {prev} c LEFT JOIN m{it} m
        ON m.j = c.j AND m.cluster = c.cluster
    )"""
        )
        prev = f"c{it}"
    return "".join(parts), prev


def _pq_train_sql(
    m: int, dsub: int, k: int, iters: int, scale: int, train_max: int
) -> str:
    """Codebook-training oracle: the shared chain's final codebook,
    exploded to (j, code, pos, cw) rows, plus each subspace's
    exact-integer final assignment SSE — no float division anywhere, so
    the full training run hash-matches."""
    prefix, prev = _pq_train_cte_chain(m, dsub, k, iters, scale, train_max)
    dist = _KMEANS_DIST
    return (
        prefix
        + f""", af AS (
      SELECT j, vec_id, d2 FROM (
        SELECT e.j, e.vec_id, {dist} AS d2,
               row_number() OVER (PARTITION BY e.j, e.vec_id
                 ORDER BY {dist} ASC, c.cluster ASC) AS rc
        FROM e JOIN {prev} c ON c.j = e.j
      ) WHERE rc = 1
    ), sse AS (
      SELECT j, CAST(SUM(d2) AS BIGINT) AS sse_j FROM af GROUP BY j
    )
    SELECT CAST(c.j AS INTEGER) AS j, CAST(c.cluster AS INTEGER) AS code,
           CAST(p.pos AS INTEGER) AS pos,
           CAST(c.cv[p.pos + 1] AS BIGINT) AS cw,
           s.sse_j
    FROM {prev} c
    CROSS JOIN (SELECT unnest(range({dsub})) AS pos) p
    JOIN sse s ON s.j = c.j"""
    )


@query(
    "q_pq_train",
    oracle=_pq_train_sql(
        _PQ_M, _PQ_DSUB, _PQ_K, _PQ_TRAIN_ITERS, _KMEANS_IVF_SCALE, _PQ_TRAIN_MAX
    ),
    doc=(
        "PQ codebook TRAINING — the faiss.ProductQuantizer.train step, "
        "closing the one index-lifecycle gap left after IVF got "
        "train->serve->audit->maintain (r9 verdict #2): q_ann_pq / "
        "q_ann_ivfpq serve from literal codebooks (a frozen checkpoint); "
        "THIS trains them in-engine. Per subspace j (m=4 slices of 16 "
        "dims), deterministic integer-quantized Lloyd's reusing "
        "operators/cluster.kmeans_train (hash-seeded init — the seed ids "
        "are j-independent, so all subspaces train on the same sample "
        "rows; argmin ties toward the lower code; half-up integer means), "
        "on a FIXED 500-vector prefix so trainer cost is "
        "corpus-independent (the q_ann_incremental bounded-sample "
        "contract). Emits the trained codebook exploded to (j, code, "
        "pos, cw) microunit rows plus each subspace's exact-integer "
        "final SSE — every value bit-identical to the unrolled-CTE "
        "DuckDB twin. The driver holds only m x k x dsub = 512 "
        "codebook ints; assignments stay distributed. tests/test_ml.py "
        "proves the trained codebook reconstructs the corpus with lower "
        "SSE than the literal vec_id<8 codebook q_ann_pq serves from."
    ),
)
def q_pq_train(spark: SparkSession, sf_dir: str):
    from ..operators.cluster import pq_train

    emb = fan_out(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    train = emb.filter(F.col("vec_id") < _PQ_TRAIN_MAX)
    # Joint trainer: one job per Lloyd iteration covers all _PQ_M
    # subspaces (was _PQ_M independent kmeans_train calls, each
    # re-executing the scan+fan_out chain to build its slice — the
    # trained tier's dominant fixed cost in r13). Codebooks are
    # bit-identical to the per-subspace loop (integer mode; asserted in
    # tests/test_cluster_ops.py), so the oracle is unchanged.
    final, cbs, _hists = pq_train(
        train,
        m=_PQ_M,
        dsub=_PQ_DSUB,
        k=_PQ_K,
        max_iter=_PQ_TRAIN_ITERS,
        quantize=_KMEANS_IVF_SCALE,
    )
    cb_rows = [
        (j, code, pos, int(cbs[j][code][pos]))
        for j in range(_PQ_M)
        for code in range(_PQ_K)
        for pos in range(_PQ_DSUB)
    ]
    # Final training SSE per subspace: pq_train's final assignment IS the
    # quantized sample scored against the trained codewords — the exact
    # integer d2 the oracle reproduces — so the per-subspace SSE is one
    # aggregate over it instead of _PQ_M upstream re-executions.
    sse = final.groupBy(F.col("__j").cast("int").alias("j")).agg(
        F.sum("__d").cast("bigint").alias("sse_j")
    )
    cb = spark.createDataFrame(cb_rows, schema="j int, code int, pos int, cw long")
    return cb.join(F.broadcast(sse), "j").select("j", "code", "pos", "cw", "sse_j")


#: q_index_rebalance: retrain when the fullest IVF list exceeds this
#: multiple of the mean list size (ppm) — the FAISS imbalance_factor
#: "when to retrain" heuristic, 2x mean.
_REBALANCE_THRESHOLD_PPM = 2_000_000


@query(
    "q_index_rebalance",
    oracle=(
        lambda: (
            _kmeans_cte_chain(
                _KMEANS_IVF_K,
                _KMEANS_IVF_ITERS,
                _KMEANS_IVF_SCALE,
                where=f"WHERE vec_id < {_ANN_INC_TRAIN_MAX}",
            )[0]
            + f""", ec AS MATERIALIZED (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * {_KMEANS_IVF_SCALE}.0, 0) AS BIGINT)) AS v
      FROM embeddings
    ), asg AS (
      SELECT vec_id, cluster FROM (
        SELECT e.vec_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY {_KMEANS_DIST} ASC, c.cluster ASC) AS rc
        FROM ec e CROSS JOIN c{_KMEANS_IVF_ITERS} c
      ) WHERE rc = 1
    ), counts AS (
      SELECT c.cluster,
             SUM(CASE WHEN a.vec_id IS NOT NULL
                       AND a.vec_id % {_ANN_INC_BATCH_MOD} <> {_ANN_INC_BATCH_RES}
                      THEN 1 ELSE 0 END) AS n_indexed,
             SUM(CASE WHEN a.vec_id % {_ANN_INC_BATCH_MOD} = {_ANN_INC_BATCH_RES}
                      THEN 1 ELSE 0 END) AS n_new
      FROM c{_KMEANS_IVF_ITERS} c LEFT JOIN asg a ON a.cluster = c.cluster
      GROUP BY c.cluster
    ), tot AS (
      SELECT max(n_indexed + n_new) AS max_total,
             sum(n_indexed + n_new) AS sum_total
      FROM counts
    )
    SELECT CAST(c.cluster AS INTEGER) AS cluster,
           CAST(c.n_indexed AS BIGINT) AS n_indexed,
           CAST(c.n_new AS BIGINT) AS n_new,
           CAST(c.n_indexed + c.n_new AS BIGINT) AS n_total,
           CAST(t.max_total * {_KMEANS_IVF_K} * 1000000 // t.sum_total
                AS BIGINT) AS imbalance_ppm,
           CAST((t.max_total * {_KMEANS_IVF_K} * 1000000 // t.sum_total)
                > {_REBALANCE_THRESHOLD_PPM} AS INTEGER) AS rebalance
    FROM counts c CROSS JOIN tot t"""
        )
    )(),
    doc=(
        "Retrain-trigger maintenance decision for the incrementally "
        "maintained IVF index (r9 verdict #7) — the last operational "
        "piece of the lifecycle: train (q_kmeans_ivf) -> serve "
        "(q_ann_ivf_trained) -> audit (q_ann_recall_trained) -> maintain "
        "(q_ann_incremental) -> DECIDE WHEN TO RETRAIN (this). Assigns "
        "the whole corpus to the same frozen prefix-trained coarse "
        "quantizer q_ann_incremental appends against (one narrow "
        "O(N x k) argmin pass — no shuffle until the k-row count "
        "aggregate), splits each list's population into indexed vs "
        "newly-appended rows (the id-residue batch), and emits the "
        "FAISS imbalance heuristic: imbalance_ppm = max list x k x 1e6 "
        "/ total (integer division, exact — fits BIGINT through ~5.7e11 "
        "vectors, beyond 100 TB of 64-dim embeddings), with rebalance=1 "
        "when the fullest list exceeds 2x the mean. Empty lists count "
        "toward the mean via the centroid-table left join. All-integer "
        "output, trivially hash-matched."
    ),
)
def q_index_rebalance(spark: SparkSession, sf_dir: str):
    from ..operators.cluster import _assign, kmeans_train

    emb = fan_out(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    train = emb.filter(F.col("vec_id") < _ANN_INC_TRAIN_MAX)
    _a, cents, _sse = kmeans_train(
        train,
        k=_KMEANS_IVF_K,
        max_iter=_KMEANS_IVF_ITERS,
        quantize=_KMEANS_IVF_SCALE,
    )
    quant = emb.withColumn(
        "v",
        F.transform(
            F.col("v"),
            lambda x: F.round(x * F.lit(float(_KMEANS_IVF_SCALE)), 0).cast("long"),
        ),
    )
    is_new = F.col("vec_id") % _ANN_INC_BATCH_MOD == _ANN_INC_BATCH_RES
    # coalesce: cluster is argmin over a non-empty literal array — never
    # NULL — but without the guard the left join below infers
    # IsNotNull(cluster) on its right side and pushes the ENTIRE k x dim
    # argmin expression into the parquet scan as a DataFilter (the
    # q_ann_incremental pushdown class, gated registry-wide).
    # localCheckpoint: the k-row population table feeds BOTH the stats
    # scalar and the final report — materializing it runs the O(N x k)
    # corpus assignment once and keeps the downstream plan bounded.
    counts = (
        _assign(quant, "v", cents, integer=True)
        .groupBy(
            F.coalesce(F.col("cluster"), F.lit(-1)).cast("int").alias("cluster")
        )
        .agg(
            F.sum(F.when(is_new, 0).otherwise(1)).cast("bigint").alias("n_indexed"),
            F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint").alias("n_new"),
        )
        .localCheckpoint(eager=True)
    )
    # Every trained list participates in the mean, including empty ones —
    # k bounded rows, broadcast side of the left join.
    clusters = spark.range(_KMEANS_IVF_K).select(
        F.col("id").cast("int").alias("cluster")
    )
    full = (
        F.broadcast(clusters)
        .join(counts, "cluster", "left")
        .na.fill(0, ["n_indexed", "n_new"])
        .withColumn("n_total", (F.col("n_indexed") + F.col("n_new")).cast("bigint"))
    )
    stats = full.agg(
        F.max("n_total").alias("max_total"), F.sum("n_total").alias("sum_total")
    )
    # imbalance derived once, verdict DERIVED from the alias (the
    # q_ann_recall_trained pattern — they can never disagree).
    return (
        full.crossJoin(F.broadcast(stats))
        .withColumn(
            "imbalance_ppm",
            F.expr(
                f"CAST(max_total * {_KMEANS_IVF_K} * 1000000 div sum_total AS BIGINT)"
            ),
        )
        .select(
            "cluster",
            "n_indexed",
            "n_new",
            "n_total",
            "imbalance_ppm",
            F.expr(
                f"CAST(imbalance_ppm > {_REBALANCE_THRESHOLD_PPM} AS INTEGER)"
            ).alias("rebalance"),
        )
    )


def _ann_pq_trained_sql(
    m: int, dsub: int, k: int, iters: int, scale: int, train_max: int, nq: int
) -> str:
    """Serving oracle for the TRAINED PQ index: the shared training chain
    produces the codebook in integer microunits; dividing by the scale
    (exact binary64 both engines) yields the double codewords, and the
    encode/ADC arithmetic is textually the same as _pq_oracle_core's —
    only the codebook source differs (trained CTE vs the vec_id<k
    literal)."""
    prefix, prev = _pq_train_cte_chain(m, dsub, k, iters, scale, train_max)
    return (
        prefix
        + f""", ef AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), subf AS (
      SELECT vec_id, j, v[1+{dsub}*j : {dsub}*(j+1)] AS sv
      FROM ef, (SELECT unnest(range({m})) AS j)
    ), cbt AS (
      SELECT j, cluster AS code,
             list_transform(cv, c -> c / {scale}.0) AS cw
      FROM {prev}
    ), enc AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, s.j, cbt.code,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.j
                 ORDER BY round(list_aggregate(list_transform(range(1,{dsub + 1}),
                           i -> (s.sv[i]-cbt.cw[i])*(s.sv[i]-cbt.cw[i])), 'sum'), 6),
                          cbt.code
               ) AS rc
        FROM subf s JOIN cbt ON s.j = cbt.j
      ) WHERE rc = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
             round(sum(round(list_aggregate(list_transform(range(1,{dsub + 1}),
                   i -> (q.sv[i]-cbt.cw[i])*(q.sv[i]-cbt.cw[i])), 'sum'), 6)), 6) AS adist
      FROM subf q
      JOIN enc x ON q.j = x.j AND x.vec_id <> q.vec_id
      JOIN cbt ON cbt.j = x.j AND cbt.code = x.code
      WHERE q.vec_id < {nq}
      GROUP BY q.vec_id, x.vec_id
    )
    SELECT query_id, neighbor_id, adist, CAST(rn AS INTEGER) AS rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn
      FROM adc
    ) WHERE rn <= 3"""
    )


@query(
    "q_ann_pq_trained",
    oracle=_ann_pq_trained_sql(
        _PQ_M,
        _PQ_DSUB,
        _PQ_K,
        _PQ_TRAIN_ITERS,
        _KMEANS_IVF_SCALE,
        _PQ_TRAIN_MAX,
        _PQ_N_QUERIES,
    ),
    doc=(
        "ADC search served FROM the q_pq_train codebooks — the PQ family's "
        "train->serve composition, mirroring what q_ann_ivf_trained did "
        "for IVF (r10; q_ann_pq serves from the literal vec_id<k frozen "
        "checkpoint). The per-subspace trainers run on the fixed "
        "500-vector prefix (corpus-independent cost), the integer "
        "microunit codewords are rescaled to doubles (exact binary64 "
        "division on both engines), and from there the machinery is "
        "q_ann_pq's verbatim: narrow literal-codebook encode (argmin of "
        "rounded fold distances, lowest-code ties), driver-side HALF_UP "
        "query LUTs, row-local ADC scoring, and the final top-3 rank "
        "window as the path's only shuffle. The DuckDB twin rides the "
        "SAME training CTE chain as q_pq_train's oracle, so the served "
        "index and the trained codebook can never diverge."
    ),
)
def q_ann_pq_trained(spark: SparkSession, sf_dir: str):
    from ..operators.cluster import pq_train

    emb = read_table(spark, sf_dir, "embeddings")
    embv = emb.select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    train = embv.filter(F.col("vec_id") < _PQ_TRAIN_MAX)
    # Joint trainer (see q_pq_train): bit-identical codebooks to the
    # per-subspace kmeans_train loop, ~_PQ_M× fewer serial jobs.
    _f, cbs, _h = pq_train(
        train,
        m=_PQ_M,
        dsub=_PQ_DSUB,
        k=_PQ_K,
        max_iter=_PQ_TRAIN_ITERS,
        quantize=_KMEANS_IVF_SCALE,
    )
    cb = [
        [[c / _KMEANS_IVF_SCALE for c in cents[code]] for code in range(_PQ_K)]
        for cents in cbs
    ]
    q_rows = {
        int(r.vec_id): [float(x) for x in r.v]
        for r in embv.filter(F.col("vec_id") < _PQ_N_QUERIES).collect()
    }
    n = fan_out(emb).select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    enc = _pq_encode(n, cb)
    probed = enc.withColumn("q", F.explode(_pq_query_structs(q_rows, cb))).filter(
        F.col("vec_id") != F.col("q.query_id")
    )
    return _pq_adc_topk(probed)
