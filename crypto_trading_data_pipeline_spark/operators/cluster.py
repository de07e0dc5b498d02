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
