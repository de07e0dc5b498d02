"""Streaming exact deduplication with watermark-bounded state.

The ingest-side twin of operators/dedup.py: at-least-once sources (Kafka
redeliveries, reference spark_processor/processor.py:54-60's input;
overlapping file drops; producer retries) emit the same record more than
once, and the serving tables must not double-count. Batch dedup cannot
run on an unbounded stream — the state needed to remember "seen" keys
grows forever — so the streaming form bounds state with the watermark:
a duplicate arriving within the lateness horizon is dropped, and state
for keys older than the horizon is evicted.

Two tiers, matching Spark's two built-ins:

- ``dedup_stream`` — ``dropDuplicatesWithinWatermark``: keeps each key's
  state only until the watermark passes its event time + horizon. The
  production choice: state is O(keys per horizon window), independent of
  stream lifetime. Duplicates separated by MORE than the horizon pass
  through (exactly the contract of at-least-once redelivery, which
  retries within seconds, not days).
- ``dedup_stream_unbounded`` — plain ``dropDuplicates``: exact across
  the whole stream lifetime, state grows with distinct keys. Only for
  bounded backfills / availableNow drains where the key universe fits.

At 100 TB/day the state store must be RocksDB
(streaming.job.ROCKSDB_STATE_CONF) — watermarked dedup state for a
firehose is far beyond executor heaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "trade_time",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Drop duplicate ``keys`` rows arriving within the ``watermark``
    horizon of the first occurrence; state is evicted once the watermark
    passes, so memory is bounded by horizon x key-arrival rate."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def dedup_stream_unbounded(df: DataFrame, keys: list[str]) -> DataFrame:
    """Whole-lifetime exact dedup — unbounded state; bounded drains only."""
    return df.dropDuplicates(keys)
