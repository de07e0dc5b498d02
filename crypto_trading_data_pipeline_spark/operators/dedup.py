"""Deduplication operators for training-data pipelines.

Exact dedup is a keyed min-pick: ONE hash aggregate (window-min over the key),
no sort, scales to any corpus size — the same plan shape as the reference's
last-wins upsert (reference spark_processor/processor.py:154-161), just
min-by-key instead of max-by-time.

``dropDuplicates`` is intentionally NOT used: it keeps an arbitrary row per
key (first encountered per partition), which is non-deterministic under
shuffle — unacceptable for reproducible corpus builds and for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(c: Column) -> Column:
    """Canonicalize text for near-dup keying: lowercase, trim, collapse runs
    of whitespace to single spaces."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_dedup(df: DataFrame, *, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per ``key_cols`` value: the one with the minimal
    ``order_col`` (deterministic representative).

    Plan: window-min partitioned by key (partial+final hash agg around one
    shuffle on the key), then a codegen'd filter. At 100 TB the shuffle
    carries (key, min) pairs only after partial aggregation.
    """
    w = Window.partitionBy(*key_cols)
    return (
        df.withColumn("__rep", F.min(order_col).over(w))
        .filter(F.col(order_col) == F.col("__rep"))
        .drop("__rep")
    )
