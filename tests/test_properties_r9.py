"""Round-9 property tests.

Replica discipline (per the repo's test strategy): where the DuckDB
oracle can only exercise fixture-scale behavior, an exact Python/numpy
replica pins the at-scale code path. Here: the two-level quantizer's
balanced coarse stride (floor(sqrt(k2))) is replicated bit-for-bit at
fixture scale (k2 = 10, stride = 3) AND at N = 13,000 (k2 = 260,
stride = 16), so the stride arithmetic, the coarse-subset predicate,
and all three deterministic ranks are pinned in both regimes.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from crypto_trading_data_pipeline_spark.io import read_table
from crypto_trading_data_pipeline_spark.operators.similarity import (
    as_double_vec,
    l2_norm,
)

SF_001 = "/root/testdata/sf0.001"


def _round6(x: np.ndarray) -> np.ndarray:
    """Spark F.round HALF_UP at 6dp (away from zero), vectorized."""
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _hier_replica(ids: np.ndarray, vecs: np.ndarray, cent_mod: int):
    """Exact numpy mirror of _ivf_assign_hier: balanced sqrt coarse
    stride, nearest-coarse routing for fine centroids and vectors, then
    the per-cell fine rank — every rank (rounded-6dp cosine DESC, id
    ASC). Returns ({vec_id: cent_id}, stride, n_coarse)."""
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    nrm = np.sqrt((vecs * vecs).sum(axis=1))

    fine_mask = ids % cent_mod == 0
    k2 = int(fine_mask.sum())
    stride = max(1, int(math.floor(math.sqrt(k2))))
    coarse_mask = ids % (cent_mod * stride) == 0

    def route(sub_vecs, sub_nrm):
        cos = _round6(
            (sub_vecs @ vecs[coarse_mask].T)
            / np.outer(sub_nrm, nrm[coarse_mask])
        )
        co_ids = ids[coarse_mask]
        return np.array(
            [co_ids[np.lexsort((co_ids, -cos[i]))[0]] for i in range(len(cos))]
        )

    fine_ids = ids[fine_mask]
    fine_cell = route(vecs[fine_mask], nrm[fine_mask])
    vec_cell = route(vecs, nrm)

    cell_members: dict[int, list[int]] = {}
    for fid, cell in zip(fine_ids, fine_cell):
        cell_members.setdefault(int(cell), []).append(int(fid))

    fine_pos = {int(f): i for i, f in enumerate(fine_ids)}
    out = {}
    for i in range(len(ids)):
        cands = cell_members[int(vec_cell[i])]
        idx = [fine_pos[c] for c in cands]
        cos = _round6(
            (vecs[i] @ vecs[fine_mask][idx].T) / (nrm[i] * nrm[fine_mask][idx])
        )
        out[int(ids[i])] = cands[np.lexsort((np.array(cands), -cos))[0]]
    return out, stride, int(coarse_mask.sum())


def _spark_hier(spark, frame):
    from crypto_trading_data_pipeline_spark.queries.dedup_advanced import (
        _ivf_assign_hier,
    )

    n = frame.withColumn("nrm", l2_norm(F.col("v")))
    return {
        r.vec_id: r.cent_id
        for r in _ivf_assign_hier(n).select("vec_id", "cent_id").collect()
    }


def test_ivf_hier_fixture_replica(spark):
    """Fixture scale (sf0.001: N = 500, k2 = 10 => stride = 3, four
    coarse cells) against the exact numpy replica — this is the regime
    the q_semdedup oracle hash-checks, proven here a second way."""
    from crypto_trading_data_pipeline_spark.queries.dedup_advanced import (
        _IVF_CENT_MOD,
    )

    frame = read_table(spark, SF_001, "embeddings").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    got = _spark_hier(spark, frame)

    rows = frame.collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.v for r in rows], dtype=np.float64)
    expected, stride, n_coarse = _hier_replica(ids, vecs, _IVF_CENT_MOD)
    assert stride == 3 and n_coarse == 4
    assert got == expected


def test_ivf_hier_stride_engages(spark):
    """The large-stride regime: replicate the sf0.001 embeddings 26x
    with jittered first coordinates (N = 13,000, k2 = 260 =>
    stride = floor(sqrt(260)) = 16, coarse = every 16th fine centroid =
    17 cells), far above every parquet fixture. Any drift in the stride
    arithmetic, the coarse-subset predicate, or the per-cell fine rank
    fails exactly against the replica."""
    from crypto_trading_data_pipeline_spark.queries.dedup_advanced import (
        _IVF_CENT_MOD,
    )

    reps, base = 26, 500
    frame = (
        read_table(spark, SF_001, "embeddings")
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v0"))
        .crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") + F.col("rep") * base).alias("vec_id"),
            F.expr(
                "transform(v0, (x, j) -> x + if(j = 0, cast(rep as double), 0d))"
            ).alias("v"),
        )
    )
    got = _spark_hier(spark, frame)

    rows = frame.collect()
    ids = np.array([r.vec_id for r in rows])
    vecs = np.array([r.v for r in rows], dtype=np.float64)
    expected, stride, n_coarse = _hier_replica(ids, vecs, _IVF_CENT_MOD)
    assert stride == 16 and n_coarse == 17
    assert len(got) == 13000
    assert got == expected
