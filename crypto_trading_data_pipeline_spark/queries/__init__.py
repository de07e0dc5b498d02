"""Declared-query registry: name → (Spark callable, DuckDB oracle SQL).

This is the driver-facing inventory (SURVEY.md §2 "declared query" column).
Every operator the engine claims is registered here with

- a Spark implementation ``fn(spark, sf_dir) -> DataFrame``, and
- (when SQL-expressible) an equivalent ANSI-SQL string DuckDB runs on the
  same parquet fixtures for the order-insensitive hash-match check.

Oracle-matching conventions (SURVEY.md §5):
- alias every computed column identically on both sides;
- deterministic aggregates only (min_by/max_by ↔ arg_min/arg_max; unique ts);
- ROUND any double aggregate whose summation order differs between engines;
- timestamps emitted as TIMESTAMP_NTZ (session tz pinned UTC) ↔ DuckDB
  TIMESTAMP;
- integer widths matched (Spark int ↔ INTEGER, long ↔ BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a declared query."""

    def wrap(fn):
        # The decorated function must BE the query (same name, driver
        # signature). Catches the misplaced-decorator refactor bug at import
        # time instead of as a TypeError deep inside the driver run.
        if fn.__name__ != name:
            raise ValueError(
                f"@query({name!r}) applied to {fn.__name__!r} — decorator misplaced"
            )
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Importing the domain modules populates REGISTRY (order = SURVEY §2 order).
from . import reference_surface  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import llmdata  # noqa: E402,F401
from . import dedup_advanced  # noqa: E402,F401
