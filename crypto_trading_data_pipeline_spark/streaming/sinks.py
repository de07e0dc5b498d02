"""Idempotent upsert sinks for foreachBatch — the reference's delivery
contract (effectively-once into a keyed serving table).

Reference implementation (spark_processor/processor.py:116-172): write the
micro-batch to a fresh JDBC staging table, then driver-side
``INSERT ... ON CONFLICT (keys) DO UPDATE`` + ``DROP TABLE`` via psycopg2,
with the staging name embedding epoch_id so retried batches don't collide.

Ours generalizes the same pattern:
- ``JdbcUpsertSink`` reproduces staging + merge for any JDBC database
  (server-side MERGE, driver-side connection) — import-gated since test
  containers carry no JDBC driver or server.
- ``ParquetUpsertSink`` is the file-based twin used in tests: same
  last-wins-by-key merge semantics, expressed as the q_upsert_last_wins
  operator (row_number over key ordered by recency), atomically swapped.

Both are plain callables usable as ``foreachBatch(sink)``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_last_wins(
    existing: DataFrame | None, batch: DataFrame, *, keys: list[str], order_col: str
) -> DataFrame:
    """Upsert semantics as a pure transform: one row per key, highest
    ``order_col`` wins, batch rows beat existing rows at equal order."""
    src = batch.withColumn("__src", F.lit(1))
    if existing is not None:
        src = existing.withColumn("__src", F.lit(0)).unionByName(src)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), F.col("__src").desc())
    return (
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


class ParquetUpsertSink:
    """foreachBatch writer maintaining a keyed parquet table with last-wins
    merge — the test twin of the reference's Postgres upsert."""

    def __init__(self, path: str, *, keys: list[str], order_col: str):
        self.path = path
        self.keys = keys
        self.order_col = order_col

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():  # empty-batch guard (reference processor.py:117-119)
            return
        spark = batch.sparkSession
        existing = None
        if os.path.exists(self.path):
            existing = spark.read.parquet(self.path)
        merged = merge_last_wins(existing, batch, keys=self.keys, order_col=self.order_col)
        # Stage-then-swap so a failed write never corrupts the table
        # (the staging-table role from reference processor.py:124-135).
        staging = tempfile.mkdtemp(prefix=f"upsert_epoch{epoch_id}_")
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        shutil.move(staging, self.path)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


class JdbcUpsertSink:
    """foreachBatch writer reproducing the reference's staging + merge
    upsert over JDBC (reference processor.py:116-172).

    Executors write the batch to a per-epoch staging table; the driver then
    runs a single transactional MERGE and drops staging. Requires a JDBC
    driver JAR and a reachable database, so instantiation is allowed but
    calls raise cleanly when pyspark lacks the driver.
    """

    def __init__(
        self,
        *,
        url: str,
        table: str,
        keys: list[str],
        driver: str = "org.postgresql.Driver",
        properties: dict[str, str] | None = None,
    ):
        self.url = url
        self.table = table
        self.keys = keys
        self.driver = driver
        self.properties = properties or {}

    def _merge_sql(self, staging: str, columns: list[str]) -> str:
        cols = ", ".join(columns)
        key_cols = ", ".join(self.keys)
        updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in self.keys)
        return (
            f"INSERT INTO {self.table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON CONFLICT ({key_cols}) DO UPDATE SET {updates}"
        )

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        staging = f"{self.table}_staging_{epoch_id}"
        (
            batch.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", staging)
            .option("driver", self.driver)
            .mode("overwrite")
            .save()
        )
        self._run_merge(staging, [f.name for f in batch.schema.fields])

    def _run_merge(self, staging: str, columns: list[str]) -> None:
        try:
            import psycopg2  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "JdbcUpsertSink merge step needs a driver-side DB client "
                "(psycopg2 for Postgres); not available in this environment"
            ) from e
        conn = psycopg2.connect(self.url, **self.properties)  # pragma: no cover
        try:  # pragma: no cover
            with conn, conn.cursor() as cur:
                cur.execute(self._merge_sql(staging, columns))
                cur.execute(f"DROP TABLE {staging}")
        finally:  # pragma: no cover
            conn.close()
