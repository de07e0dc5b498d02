"""Data-freshness monitoring (reference entry point 3: the Airflow
SQLCheckOperator at reference airflow/dags/crypto_pipeline_monitor_dag.py:22-28
fails the pipeline when no serving row is newer than NOW() - 3 minutes).

Ours is sink-agnostic: the check runs on any DataFrame (JDBC-read serving
table, parquet sink, memory table). The predicate is pushed down — on a
JDBC source it ships to the database as WHERE, on parquet it prunes row
groups — so the check reads almost nothing, exactly like the reference's
index-backed COUNT (reference postgres/init/init.sql:20).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fresh_row_count(
    df: DataFrame,
    *,
    ts_col: str = "window_start",
    max_staleness: str = "3 minutes",
    now: datetime | Column | None = None,
) -> int:
    """Rows with ``ts_col`` within the staleness horizon.

    ``now`` defaults to the cluster clock (current_timestamp); pass a fixed
    datetime for deterministic tests/backfills.
    """
    anchor: Column
    if now is None:
        anchor = F.current_timestamp()
    elif isinstance(now, datetime):
        # Aware datetimes must be normalized to UTC before the cast: the
        # string literal is reinterpreted in the session timezone (pinned
        # UTC), so a non-UTC tzinfo would silently shift the cutoff by the
        # whole UTC offset. Sub-second precision is kept (isoformat, not a
        # seconds-only strftime).
        if now.tzinfo is not None:
            now = now.astimezone(timezone.utc).replace(tzinfo=None)
        anchor = F.lit(now.isoformat(sep=" ", timespec="microseconds")).cast("timestamp")
    else:
        anchor = now
    cutoff = anchor - F.expr(f"INTERVAL {max_staleness}")
    return df.filter(F.col(ts_col) >= cutoff).count()


def freshness_ok(
    df: DataFrame,
    *,
    ts_col: str = "window_start",
    max_staleness: str = "3 minutes",
    now: datetime | Column | None = None,
) -> bool:
    """True when at least one row is fresh — the reference's check
    semantics (first cell of the COUNT must be truthy)."""
    return fresh_row_count(df, ts_col=ts_col, max_staleness=max_staleness, now=now) > 0
