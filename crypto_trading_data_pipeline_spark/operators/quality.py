"""Data-quality profiling — the batch generalization of the reference's
freshness gate (reference airflow/dags/crypto_pipeline_monitor_dag.py:22-28,
its only data-quality check).

One aggregation pass emits per-column health metrics (row count, null
count, exact distinct cardinality, min/max). All metrics are declarative
aggregates, so the whole profile is a single partial+final HashAggregate —
one scan, one tiny shuffle, regardless of how many columns are profiled.
At 100 TB swap count_distinct for approx_count_distinct (HLL) per column;
the wide-row shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_exprs(cols: list[str]) -> list[Column]:
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return aggs


def numeric_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-row profile of ``cols`` — feed it to an alerting gate the way
    the reference's monitor DAG gates on freshness."""
    return df.agg(*profile_exprs(cols))
