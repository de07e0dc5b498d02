"""ANN quality: measured recall@3 of every approximate path against the
exact NumPy baseline, on each method's OWN ground metric.

Correctness tests prove each ANN query computes its declared approximation
bit-exactly (DuckDB oracles); this file proves the approximations are
USEFUL — an ANN path that returns arbitrary vectors would still pass its
oracle, so recall against the true neighbors is the missing axis. The
fixtures are random unit-ish vectors with no cluster structure, the
hardest case for space-partitioning methods, so absolute recalls are low;
what the test pins is (a) the brute-force path is EXACT (recall 1.0),
(b) every ANN beats random guessing by >= 10x, and (c) the deterministic
per-method recalls never regress below their measured floors — a change
that silently degrades an index (wrong codebook slice, broken cluster
probe) trips the floor long before an oracle would notice.

Ground metrics: IVF/LSH/brute-force rank by cosine; PQ paths rank by
(approximate) squared L2 — each is compared to the exact top-3 under ITS
metric, not a shared one.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from crypto_trading_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"
K = 3
N_QUERIES = 5

#: (query, ground metric, measured recall floor at sf0.01).
#: Floors are the deterministic measured values; random baseline on the
#: 500-vector fixture is K/(N-1) ~= 0.006.
CASES = [
    ("q_cosine_topk", "cos", 1.0),  # brute force IS exact
    ("q_ann_ivf", "cos", 0.40),
    ("q_ann_lsh", "cos", 0.06),
    ("q_ann_pq", "l2", 0.13),
    ("q_ann_ivfpq", "l2", 0.13),
]


@pytest.fixture(scope="module")
def exact_top3():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    def top3(qid: int, metric: str) -> set:
        qi = int(np.where(ids == qid)[0][0])
        if metric == "cos":
            s = Vn @ Vn[qi]
            s[qi] = -np.inf
            return set(ids[np.argsort(-s)[:K]].tolist())
        d = ((V - V[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        return set(ids[np.argsort(d)[:K]].tolist())

    return top3, len(ids)


@pytest.mark.parametrize("name,metric,floor", CASES, ids=[c[0] for c in CASES])
def test_ann_recall_floor(spark, exact_top3, name, metric, floor):
    top3, n_vecs = exact_top3
    rows = REGISTRY[name].fn(spark, SF).collect()
    got: dict[int, set] = {}
    for r in rows:
        qid = r["query_id"] if "query_id" in r.__fields__ else r["qid"]
        nid = r["neighbor_id"] if "neighbor_id" in r.__fields__ else r["vec_id"]
        got.setdefault(int(qid), set()).add(int(nid))
    recalls = [
        len(got.get(q, set()) & top3(q, metric)) / K for q in range(N_QUERIES)
    ]
    mean = float(np.mean(recalls))
    random_baseline = K / (n_vecs - 1)
    assert mean >= floor, (name, recalls)
    assert mean >= 10 * random_baseline, (name, mean, random_baseline)


def test_nprobe_reduces_ivf_loss(spark):
    """The nprobe knob's contract, isolated from PQ's own quantization
    error: recall measured against the FULL-corpus ADC scan (q_ann_pq =
    zero IVF loss) must rise when the probe widens from 1 cluster to 3.
    Measured deterministic values at sf0.01: 0.267 -> 0.533."""

    def result_sets(name):
        got: dict[int, set] = {}
        for r in REGISTRY[name].fn(spark, SF).collect():
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        return got

    full = result_sets("q_ann_pq")

    def recall_vs_full(name):
        got = result_sets(name)
        return float(
            np.mean(
                [len(got.get(q, set()) & full[q]) / K for q in range(N_QUERIES)]
            )
        )

    r1 = recall_vs_full("q_ann_ivfpq")
    r3 = recall_vs_full("q_ann_ivfpq_probe3")
    assert r3 > r1, (r1, r3)
    assert r3 >= 0.5, r3


def test_nprobe_recall_monotone_vs_ground_truth(spark, exact_top3):
    """The knob's END-TO-END contract (VERDICT r5 #4): widening the probe
    must never lose recall against the TRUE L2 top-3 — not just against
    the PQ full scan. Probing more clusters only ever adds candidates to
    the ADC ranking, so ground-truth recall is monotone in nprobe."""
    top3, _ = exact_top3

    def recall(name):
        got: dict[int, set] = {}
        for r in REGISTRY[name].fn(spark, SF).collect():
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        return float(
            np.mean(
                [len(got.get(q, set()) & top3(q, "l2")) / K for q in range(N_QUERIES)]
            )
        )

    r1, r3 = recall("q_ann_ivfpq"), recall("q_ann_ivfpq_probe3")
    assert r3 >= r1, (r1, r3)


def test_rerank_dominates_raw_adc(spark, exact_top3):
    """The two-stage contract: exact-cosine re-ranking of the PQ ADC's
    top-32 candidates must recover most of the TRUE cosine top-3 and
    strictly dominate the raw ADC ranking on the same ground metric
    (measured deterministic values at sf0.01: 0.667 vs 0.133 — the
    refine stage is worth 5x recall at a 32-candidate budget)."""
    top3, _ = exact_top3

    def result_sets(name, max_rank=None):
        got: dict[int, set] = {}
        for r in REGISTRY[name].fn(spark, SF).collect():
            if max_rank is not None and int(r.rnk) > max_rank:
                continue
            got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
        return got

    def cos_recall(name, max_rank=None):
        got = result_sets(name, max_rank)
        return float(
            np.mean(
                [len(got.get(q, set()) & top3(q, "cos")) / K for q in range(N_QUERIES)]
            )
        )

    # Truncate the rerank result to the SAME top-3 budget as the raw ADC
    # ranking — comparing a 5-deep set to a 3-deep set would credit the
    # rerank stage for result-set size, not ranking quality.
    raw, rr = cos_recall("q_ann_pq"), cos_recall("q_ann_rerank", max_rank=K)
    assert rr > raw, (raw, rr)
    assert rr >= 0.60, rr


def test_index_rebalance_partitions_corpus(spark):
    """q_index_rebalance's report must cover EVERY trained list (empty
    ones count toward the mean — the left-join contract), its populations
    must exactly partition the corpus into indexed vs appended rows, and
    the imbalance verdict must be derived from those same populations."""
    from crypto_trading_data_pipeline_spark.queries.dedup_advanced import (
        _ANN_INC_BATCH_MOD,
        _ANN_INC_BATCH_RES,
        _KMEANS_IVF_K,
        _REBALANCE_THRESHOLD_PPM,
    )

    rows = REGISTRY["q_index_rebalance"].fn(spark, SF).collect()
    assert {r.cluster for r in rows} == set(range(_KMEANS_IVF_K))
    n = pq.read_table(f"{SF}/embeddings.parquet").num_rows
    assert sum(r.n_total for r in rows) == n
    assert all(r.n_total == r.n_indexed + r.n_new for r in rows)
    n_new_expect = sum(
        1 for i in range(n) if i % _ANN_INC_BATCH_MOD == _ANN_INC_BATCH_RES
    )
    assert sum(r.n_new for r in rows) == n_new_expect
    imb = {r.imbalance_ppm for r in rows}
    assert len(imb) == 1, "imbalance is a single global scalar"
    max_total = max(r.n_total for r in rows)
    assert imb.pop() == max_total * _KMEANS_IVF_K * 1_000_000 // n
    verdicts = {r.rebalance for r in rows}
    assert len(verdicts) == 1
    assert verdicts.pop() == int(
        max_total * _KMEANS_IVF_K * 1_000_000 // n > _REBALANCE_THRESHOLD_PPM
    )
