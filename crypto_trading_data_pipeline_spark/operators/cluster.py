"""Deterministic Lloyd's k-means — the IVF centroid trainer.

q_ann_ivf partitions the corpus with a fixed centroid subset (every 50th
vector); this trains REAL centroids with the classic iterative refinement,
as a driver-coordinated loop over fully distributed steps:

- **assignment** is a narrow codegen'd pass: the k×dim centroid matrix is
  inlined as an array literal (at IVF scale k≤65k, a few MB — broadcast
  territory), and argmin-distance is `array_min` over a
  struct<dist,idx> array, JVM-side, no shuffle, no Python;
- **update** is one partial+final aggregate: posexplode to (cluster, pos,
  x), mean per coordinate, regroup — shuffle rows = k×dim, independent of
  corpus size;
- the driver only ever holds the k×dim centroid matrix and the SSE scalar
  (the convergence signal) — never data rows.

Determinism: seeds are the k vectors with the smallest portable id-hash
(ties by id), every argmin tie-breaks toward the lowest centroid index,
and coordinate means are averaged in Spark's pairwise-merge order — so
re-runs produce identical clusters (the property random-init k-means
lacks, and the one that matters for reproducible index builds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup_hash


def _sq_dist(v, c, *, integer: bool = False):
    zero = F.lit(0).cast("long") if integer else F.lit(0.0)
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        zero,
        lambda acc, x: acc + x,
    )


def _cent_literal(centroids: list[list[float]], *, integer: bool) -> "F.Column":
    """The k×dim centroid matrix as ONE array<array<...>> literal built via
    a single SQL string (F.expr). The per-element form —
    F.array(*[F.array(*[F.lit(x) ...]) ...]) — costs k*dim py4j round
    trips PER CALL (k=16, dim=64 → 1024 driver↔JVM hops, ~1 s), and the
    trainer loop rebuilds the literal every Lloyd iteration because the
    centroids changed; the SQL string is one hop and the JVM parser eats
    a ~20 KB array literal in milliseconds. Values are rendered exactly:
    integer mode emits BIGINT tokens, float mode repr(float) round-trips
    binary64 — the resulting Literal is bit-identical to the old tree."""
    from .scale import inline_literal

    if integer:
        return inline_literal([[int(x) for x in c] for c in centroids])
    return inline_literal([[float(x) for x in c] for c in centroids])


def _assign(
    vecs: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    *,
    integer: bool = False,
) -> DataFrame:
    cent_arr = _cent_literal(centroids, integer=integer)
    scored = F.transform(
        cent_arr,
        lambda c, i: F.struct(
            _sq_dist(F.col(vec_col), c, integer=integer).alias("d"), i.alias("i")
        ),
    )
    best = F.array_min(scored)  # struct ordering: distance, then index
    return vecs.withColumn("cluster", best["i"]).withColumn("__d", best["d"])


def kmeans_train(
    vecs: DataFrame,
    *,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
    quantize: int | None = None,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Returns (assignments, centroids, sse_history).

    ``assignments`` adds a ``cluster`` index column to ``vecs``;
    ``sse_history`` has one entry per iteration and is non-increasing
    (Lloyd's monotonicity — asserted in tests).

    ``quantize`` (e.g. ``1_000_000``) switches the trainer to EXACT
    integer arithmetic: coordinates are snapped to
    ``round(x * quantize)`` BIGINT microunits up front, distances are
    integer sums of squares, and centroid updates are half-up-rounded
    integer means. Every intermediate is then bit-identical across
    engines (no float summation-order drift), which is what lets
    q_kmeans_ivf carry a DuckDB hash-match oracle for the full
    iterative refinement. Quantization error is 0.5/quantize per
    coordinate — noise at 1e-6 against unit-ish embeddings."""
    if quantize is not None:
        q = F.lit(float(quantize))
        vecs = vecs.withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda x: F.round(x * q, 0).cast("long")),
        )
    # Materialize the training input ONCE (r12 verdict #7 — the
    # q_semdedup localCheckpoint pattern): every Lloyd iteration's
    # assignment+update job otherwise re-executes the caller's whole
    # upstream chain — parquet scan, fan_out repartition shuffle, the
    # double-cast and quantize transforms — per iteration, plus the seed
    # scan and the final assignment. Production trainers run on a BOUNDED
    # sample (the _ANN_INC_TRAIN_MAX contract; FAISS trains on a sample),
    # so the checkpoint is small by construction; the one full-corpus
    # caller (q_kmeans_ivf, the trainer demo) materializes the corpus it
    # was going to scan max_iter+2 times anyway.
    vecs = vecs.localCheckpoint(eager=True)
    h = dedup_hash.token_hash(F.col(id_col).cast("string"))
    seeds = (
        vecs.select(vec_col, h.alias("__h"), F.col(id_col))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(r[vec_col]) for r in seeds]

    integer = quantize is not None
    mean = F.round(F.avg("x"), 0).cast("long") if integer else F.avg("x")
    sse_history: list[float] = []
    for _ in range(max_iter):
        assigned = _assign(vecs, vec_col, centroids, integer=integer)
        stats = (
            assigned.select(
                "cluster", F.col("__d"), F.posexplode(vec_col).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(mean.alias("m"), F.sum("__d").alias("dsum"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm"),
                # __d was replicated once per coordinate by the explode.
                (F.sum("dsum") / F.count(F.lit(1))).alias("sse"),
            )
            .collect()
        )
        sse_history.append(float(sum(r.sse for r in stats)))
        for r in stats:  # empty clusters keep their previous centroid
            centroids[r.cluster] = [p.m for p in r.pm]
    final = _assign(vecs, vec_col, centroids, integer=integer).drop("__d")
    return final, centroids, sse_history


def _pq_assign(
    subs: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    *,
    integer: bool,
) -> DataFrame:
    """_assign generalized to m codebooks: each (id, __j, sub) row scores
    against ITS subspace's k codewords, selected by ``element_at`` from one
    nested [m][k][dsub] literal (one py4j hop via inline_literal). The
    scored/array_min expression is the same struct<d,i> argmin as _assign,
    so per-row results are bit-identical to assigning subspace __j alone."""
    from .scale import inline_literal

    if integer:
        lit3 = inline_literal([[[int(x) for x in c] for c in cb] for cb in codebooks])
    else:
        lit3 = inline_literal(
            [[[float(x) for x in c] for c in cb] for cb in codebooks]
        )
    cand = F.element_at(lit3, F.col("__j").cast("int") + 1)
    scored = F.transform(
        cand,
        lambda c, i: F.struct(
            _sq_dist(F.col(vec_col), c, integer=integer).alias("d"), i.alias("i")
        ),
    )
    best = F.array_min(scored)  # struct ordering: distance, then index
    return subs.withColumn("cluster", best["i"]).withColumn("__d", best["d"])


def pq_train(
    vecs: DataFrame,
    *,
    m: int,
    dsub: int,
    k: int = 8,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
    quantize: int | None = None,
) -> tuple[DataFrame, list[list[list[float]]], list[list[float]]]:
    """Train m product-quantizer sub-codebooks JOINTLY — one Spark job per
    Lloyd iteration covers ALL m subspaces, instead of m independent
    kmeans_train calls (m×(max_iter+2) serial jobs, each re-executing the
    caller's upstream chain to build its slice; measured as the trained
    tier's dominant fixed cost in r13 — q_pq_train/q_ann_pq_trained).

    Returns ``(assignments, codebooks, sse_histories)``:

    - ``assignments``: one row per (id, __j) with ``cluster`` and ``__d``
      (the final-codebook assignment, lazy) — a per-subspace SSE is ONE
      ``groupBy("__j")`` aggregate away, where the per-m loop needed m
      full upstream re-executions;
    - ``codebooks[j][code]`` — in ``quantize`` (integer) mode these are
      BIT-IDENTICAL to ``kmeans_train`` on slice j of the same input
      (asserted in tests/test_cluster_ops.py): quantization commutes with
      slicing (elementwise), the seed ids are the k smallest
      (token_hash, id) rows — independent of j — and every integer mean /
      argmin tie-break groups by (__j, cluster) exactly as the per-sub
      trainer groups by cluster;
    - ``sse_histories[j]`` — kmeans_train's sse_history per subspace.

    Float (non-quantized) mode is supported but only integer mode carries
    the bit-exactness claim (float means depend on summation order, which
    the joint plan partitions differently).
    """
    if quantize is not None:
        q = F.lit(float(quantize))
        vecs = vecs.withColumn(
            vec_col,
            F.transform(F.col(vec_col), lambda x: F.round(x * q, 0).cast("long")),
        )
    h = dedup_hash.token_hash(F.col(id_col).cast("string"))
    # Explode to (id, __h, __j, sub) and materialize ONCE — m×|train| rows,
    # bounded by the trainer-sample contract. Every later job (seeds, each
    # iteration, the final assignment) reads this checkpoint; the caller's
    # upstream chain executes exactly once.
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.struct(
            j.cast("int").alias("j"),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("sub"),
        ),
    )
    cp = (
        vecs.select(F.col(id_col), h.alias("__h"), F.explode(subs).alias("s"))
        .select(
            F.col(id_col),
            "__h",
            F.col("s.j").alias("__j"),
            F.col("s.sub").alias(vec_col),
        )
        .localCheckpoint(eager=True)
    )
    # Seeds: the k ids with the smallest (token_hash, id) — the hash does
    # not depend on __j, so the SAME ids seed every subspace; one ordered
    # limit(k*m) collect yields all m seed sets (kmeans_train's per-sub
    # orderBy(__h, id).limit(k), sliced).
    seed_rows = (
        cp.select("__j", vec_col, "__h", F.col(id_col))
        .orderBy("__h", id_col, "__j")
        .limit(k * m)
        .collect()
    )
    codebooks: list[list[list[float]]] = [[None] * k for _ in range(m)]  # type: ignore[list-item]
    per_j_seen = [0] * m
    for r in seed_rows:  # rows arrive (h, id, j)-sorted: k ids × m subspaces
        codebooks[r["__j"]][per_j_seen[r["__j"]]] = list(r[vec_col])
        per_j_seen[r["__j"]] += 1
    if min(per_j_seen) < k:  # fewer than k training rows: shorter codebooks,
        # same as kmeans_train's seeds-limit(k) on a small input
        codebooks = [cb[: per_j_seen[j]] for j, cb in enumerate(codebooks)]

    integer = quantize is not None
    mean = F.round(F.avg("x"), 0).cast("long") if integer else F.avg("x")
    sse_histories: list[list[float]] = [[] for _ in range(m)]
    for _ in range(max_iter):
        assigned = _pq_assign(cp, vec_col, codebooks, integer=integer)
        stats = (
            assigned.select(
                "__j", "cluster", F.col("__d"), F.posexplode(vec_col).alias("pos", "x")
            )
            .groupBy("__j", "cluster", "pos")
            .agg(mean.alias("m"), F.sum("__d").alias("dsum"))
            .groupBy("__j", "cluster")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"),
                # __d was replicated once per coordinate by the explode.
                (F.sum("dsum") / F.count(F.lit(1))).alias("sse"),
            )
            .collect()
        )
        per_j_sse = [0.0] * m
        for r in stats:  # empty clusters keep their previous centroid
            per_j_sse[r["__j"]] += float(r.sse)
            codebooks[r["__j"]][r.cluster] = [p.m for p in r.pm]
        for j in range(m):
            sse_histories[j].append(per_j_sse[j])
    final = _pq_assign(cp, vec_col, codebooks, integer=integer).drop("__h")
    return final, codebooks, sse_histories
