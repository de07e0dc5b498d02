"""Streaming drift monitor: PSI-on-ingest.

The batch twin is queries/relational.py::q_psi (fixed-width value bins,
epsilon-floored proportions, per-bin (p_cur-p_ref)*ln(p_cur/p_ref) terms).
This operator maintains the CURRENT window's bin histogram incrementally on
a stream and re-scores drift against a frozen reference histogram every
micro-batch — the production shape for "alert when the feature
distribution moves" without re-scanning history.

Scale posture:
- the streaming aggregate groups on the BIN (bounded: max_bin+1 keys), so
  state is a handful of longs regardless of ingest volume — complete
  output mode is deliberately safe here, unlike on an unbounded key;
- the per-epoch PSI computation runs driver-side over <= max_bin+1 rows
  (a bounded collect, same class as the codebook/centroid collects);
- the reference histogram is a tiny dict captured once — at 100 TB it
  comes from the warehouse's profile table, not a rescan.

Determinism contract: the sink computes terms with EXACTLY the batch
query's arithmetic (integer counts -> one division -> epsilon floor ->
(pc-pr)*ln(pc/pr) -> floor-scale), so at end-of-stream the per-bin terms
are BIT-IDENTICAL to q_psi run over the same data — asserted in
tests/test_streaming.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Mirrors q_psi's geometry (queries/relational.py): 25.0-wide value bins
#: with the tail clamped into bin 10, and a 1e-4 proportion floor.
DEFAULT_BIN_W = 25.0
DEFAULT_MAX_BIN = 10
DEFAULT_EPS = 0.0001


def bin_col(value_col: str = "value", *, bin_w: float = DEFAULT_BIN_W,
            max_bin: int = DEFAULT_MAX_BIN):
    """The shared binning expression (identical to q_psi's)."""
    return F.least(
        F.floor(F.col(value_col) / bin_w), F.lit(max_bin)
    ).cast("int")


def reference_histogram(df: DataFrame, value_col: str = "value", *,
                        bin_w: float = DEFAULT_BIN_W,
                        max_bin: int = DEFAULT_MAX_BIN) -> dict[int, int]:
    """Freeze a reference window into {bin: count} (integer counts, so the
    monitor can reproduce proportions exactly)."""
    rows = (
        df.select(bin_col(value_col, bin_w=bin_w, max_bin=max_bin).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {int(r["bin"]): int(r["n"]) for r in rows}


def binned_counts_stream(events: DataFrame, value_col: str = "value", *,
                         bin_w: float = DEFAULT_BIN_W,
                         max_bin: int = DEFAULT_MAX_BIN) -> DataFrame:
    """Streaming bounded-key histogram: groupBy(bin).count() — run in
    'complete' output mode so every epoch emits the full current table."""
    return (
        events.select(bin_col(value_col, bin_w=bin_w, max_bin=max_bin).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_terms(ref: dict[int, int], cur: dict[int, int], *,
              eps: float = DEFAULT_EPS) -> dict[int, float]:
    """Per-bin PSI terms from two integer histograms — the exact batch
    arithmetic (q_psi), term-for-term: proportions as one division each,
    epsilon floor, (p_cur-p_ref)*ln(p_cur/p_ref), floor-scale 1e-6."""
    sr, sc = sum(ref.values()), sum(cur.values())
    out: dict[int, float] = {}
    for b in sorted(set(ref) | set(cur)):
        pr = max(ref.get(b, 0) * 1.0 / sr, eps) if sr else eps
        pc = max(cur.get(b, 0) * 1.0 / sc, eps) if sc else eps
        term = (pc - pr) * math.log(pc / pr)
        out[b] = math.floor(term * 1000000.0 + 0.5) / 1000000.0
    return out


class DriftMonitorSink:
    """foreachBatch sink: re-score PSI against the frozen reference every
    epoch. Keeps the latest histogram/terms and an epoch history so tests
    (and an alerting hook) can read the trajectory."""

    def __init__(self, reference: dict[int, int], *, eps: float = DEFAULT_EPS,
                 alert_threshold: float = 0.2):
        self.reference = dict(reference)
        self.eps = eps
        self.alert_threshold = alert_threshold
        self.current: dict[int, int] = {}
        self.terms: dict[int, float] = {}
        self.history: list[tuple[int, float]] = []  # (epoch_id, psi_total)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        # Complete-mode emission: the batch IS the full current histogram
        # (bounded at max_bin+1 rows — a constant-size collect).
        self.current = {
            int(r["bin"]): int(r["n"]) for r in batch_df.collect()
        }
        self.terms = psi_terms(self.reference, self.current, eps=self.eps)
        psi_total = math.floor(
            sum(self.terms.values()) * 1000000.0 + 0.5
        ) / 1000000.0
        self.history.append((int(epoch_id), psi_total))

    @property
    def psi(self) -> float | None:
        return self.history[-1][1] if self.history else None

    @property
    def drifted(self) -> bool:
        return self.psi is not None and self.psi > self.alert_threshold


def start_drift_monitor(events: DataFrame, sink: DriftMonitorSink,
                        checkpoint: str, value_col: str = "value", *,
                        bin_w: float = DEFAULT_BIN_W,
                        max_bin: int = DEFAULT_MAX_BIN):
    """Wire the bounded histogram stream into the monitor sink
    (complete mode: bin cardinality is capped, so state and output are
    both <= max_bin+1 rows per epoch)."""
    return (
        binned_counts_stream(events, value_col, bin_w=bin_w, max_bin=max_bin)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
