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
