"""Stream-stream joins (capability extension; the reference has a single
stream and no joins, SURVEY.md §2.5).

A watermarked, time-bounded stream-stream inner join is the streaming
enrichment primitive: match each left event with right events within a
bounded event-time gap. BOTH requirements are load-bearing at scale:

- watermarks on both inputs let Spark evict join state once the other
  side can no longer produce matches;
- the time-range join condition bounds HOW MUCH right-side state each
  left key retains (without it, state grows with the full history).

State size is O(input-rate x (tolerance + watermark)) per side —
independent of stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str = "1 minute",
    left_watermark: str = "2 minutes",
    right_watermark: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join streams on ``key`` where the right event happened within
    [left_ts - tolerance, left_ts]. Works identically on batch inputs
    (watermarks are a no-op there), keeping the batch-twin testing pattern.
    """
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {tolerance}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, how).drop(rw[key])


def static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) dimension table.

    Unlike stream-stream joins this is STATELESS — the static side is
    re-planned every micro-batch (so a file/Delta-backed dim picks up new
    files between triggers), and broadcasting it means the stream side is
    never shuffled: enrichment stays a narrow per-partition map regardless
    of stream rate. Left join by default so unknown keys pass through with
    NULL dim columns instead of silently dropping events.

    Works identically on a batch DataFrame (the batch-twin testing pattern).
    """
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)
