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
import re
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
        self._recover()
        spark = batch.sparkSession
        existing = None
        if os.path.exists(self.path):
            existing = spark.read.parquet(self.path)
        merged = merge_last_wins(existing, batch, keys=self.keys, order_col=self.order_col)
        # Stage-then-swap via rename-aside so a crash at ANY point leaves a
        # recoverable table (the staging-table role from reference
        # processor.py:124-135): the old table is moved to .old BEFORE the
        # new one moves in, and _recover() restores .old if a crash struck
        # between the two renames. rmtree-then-move would lose the table in
        # that window.
        # Staging lives next to the target so the final move is a same-
        # filesystem rename (atomic), never a cross-device copy.
        parent = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(parent, exist_ok=True)
        staging = tempfile.mkdtemp(prefix=f"upsert_epoch{epoch_id}_", dir=parent)
        merged.write.mode("overwrite").parquet(staging)
        old = self.path + ".old"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        shutil.move(staging, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def _recover(self) -> None:
        """Restore the table if a previous run crashed mid-swap."""
        old = self.path + ".old"
        if os.path.exists(old):
            if os.path.exists(self.path):
                shutil.rmtree(old)  # swap completed; .old is leftover garbage
            else:
                os.rename(old, self.path)  # crashed between the two renames

    def read(self, spark) -> DataFrame:
        self._recover()
        return spark.read.parquet(self.path)


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    """Validate an SQL identifier destined for generated DDL/DML. The
    staging/serving table and column names are interpolated into SQL run
    with driver-side privileges, so anything outside [A-Za-z0-9_] is
    rejected rather than quoted-and-hoped."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


#: Spark simpleString -> Postgres column type (serving-table DDL).
_SPARK_TO_PG = {
    "string": "TEXT",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "SMALLINT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BYTEA",
}


def serving_table_ddl(
    schema,
    *,
    table: str,
    keys: list[str],
    order_col: str | None = None,
) -> list[str]:
    """CREATE TABLE + index statements for a keyed serving table, derived
    from a DataFrame schema — the reference ships this by hand
    (postgres/init/init.sql:6-20: PRIMARY KEY on the upsert keys plus a
    DESCENDING index on window_start for the freshness probe); here it is
    generated so the DDL can never drift from the DataFrame that feeds the
    sink.

    Returns [CREATE TABLE IF NOT EXISTS ..., CREATE INDEX IF NOT EXISTS ...].
    """
    _check_ident(table)
    names = [f.name for f in schema.fields]
    for k in keys:
        if k not in names:
            raise ValueError(f"key column {k!r} not in schema {names}")
    col_lines = []
    for f in schema.fields:
        _check_ident(f.name)
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            pg = t.upper().replace("DECIMAL", "NUMERIC")
        else:
            try:
                pg = _SPARK_TO_PG[t]
            except KeyError:
                raise ValueError(
                    f"no serving-table mapping for Spark type {t!r} ({f.name})"
                ) from None
        null = "" if f.nullable or f.name in keys else " NOT NULL"
        col_lines.append(f"    {f.name} {pg}{null}")
    key_cols = ", ".join(_check_ident(k) for k in keys)
    stmts = [
        f"CREATE TABLE IF NOT EXISTS {table} (\n"
        + ",\n".join(col_lines)
        + f",\n    PRIMARY KEY ({key_cols})\n)"
    ]
    if order_col is not None:
        _check_ident(order_col)
        stmts.append(
            f"CREATE INDEX IF NOT EXISTS idx_{table}_{order_col}_desc "
            f"ON {table} ({order_col} DESC)"
        )
    return stmts


class JdbcUpsertSink:
    """foreachBatch writer reproducing the reference's staging + merge
    upsert over JDBC (reference processor.py:116-172).

    Executors write the batch to a per-epoch staging table; the driver then
    runs a single transactional MERGE and drops staging. Connection
    parameters are accepted SEPARATELY (host/port/dbname/user/password,
    exactly like the reference's psycopg2 kwargs): one URL string cannot
    serve both sides, because a ``jdbc:postgresql://`` URL is not a valid
    psycopg2 DSN and the Spark JDBC writer wants credentials as options.
    Requires a JDBC driver JAR and a reachable database, so instantiation
    is allowed but calls raise cleanly when the environment lacks them.

    ``ensure_table(schema)`` creates the serving table + freshness index
    from the batch schema (serving_table_ddl) before the first merge.
    """

    def __init__(
        self,
        *,
        host: str,
        port: int = 5432,
        dbname: str,
        user: str,
        password: str,
        table: str,
        keys: list[str],
        order_col: str | None = None,
        driver: str = "org.postgresql.Driver",
        executor=None,
    ):
        self.host = host
        self.port = port
        self.dbname = dbname
        self.user = user
        self.password = password
        self.table = _check_ident(table)
        self.keys = [_check_ident(k) for k in keys]
        self.order_col = order_col
        self.driver = driver
        # Injectable driver-side SQL runner (callable taking *statements,
        # expected to run them in ONE transaction). None = the psycopg2
        # path. Lets the DDL + merge SQL execute against any DB with the
        # INSERT..ON CONFLICT dialect — tests drive it against in-process
        # DuckDB for a live round-trip the sandbox's missing Postgres
        # can't provide.
        self._executor = executor

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    def _staging_name(self, epoch_id: int) -> str:
        return _check_ident(f"{self.table}_staging_{int(epoch_id)}")

    def _merge_sql(self, staging: str, columns: list[str]) -> str:
        cols = ", ".join(_check_ident(c) for c in columns)
        key_cols = ", ".join(self.keys)
        updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in self.keys)
        # Key-only tables (presence sets) have nothing to update on
        # conflict; "DO UPDATE SET" with an empty list is malformed SQL
        # (ADVICE r2), and DO NOTHING is the correct idempotent merge.
        action = f"DO UPDATE SET {updates}" if updates else "DO NOTHING"
        return (
            f"INSERT INTO {self.table} ({cols}) SELECT {cols} FROM {staging} "
            f"ON CONFLICT ({key_cols}) {action}"
        )

    def ensure_table(self, schema) -> None:
        """Create the serving table + descending freshness index if absent."""
        self._exec(
            *serving_table_ddl(
                schema, table=self.table, keys=self.keys, order_col=self.order_col
            )
        )

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        staging = self._staging_name(epoch_id)
        (
            batch.write.format("jdbc")
            .option("url", self.jdbc_url)
            .option("dbtable", staging)
            .option("user", self.user)
            .option("password", self.password)
            .option("driver", self.driver)
            .mode("overwrite")
            .save()
        )
        self._exec(
            self._merge_sql(staging, [f.name for f in batch.schema.fields]),
            f"DROP TABLE {staging}",
        )

    def _exec(self, *statements: str) -> None:
        """Run statements in one driver-side transaction."""
        if self._executor is not None:
            self._executor(*statements)
            return
        try:
            import psycopg2  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "JdbcUpsertSink merge step needs a driver-side DB client "
                "(psycopg2 for Postgres); not available in this environment"
            ) from e
        conn = psycopg2.connect(  # pragma: no cover
            host=self.host,
            port=self.port,
            dbname=self.dbname,
            user=self.user,
            password=self.password,
        )
        try:  # pragma: no cover
            with conn, conn.cursor() as cur:
                for s in statements:
                    cur.execute(s)
        finally:  # pragma: no cover
            conn.close()
