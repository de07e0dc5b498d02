"""PySpark v2 Python DataSource for trade ingestion — the Spark-NATIVE
form of the reference's producer sidecar.

The reference ingests with an external process (websocket client -> JSON ->
Kafka, producer/producer.py:83-115) because classic Spark had no Python
source API. PySpark 4's DataSource API moves that boundary: the exchange
feed becomes a first-class source —

    spark.dataSource.register(TradeDataSource)
    spark.readStream.format("trades").option("tradesPerBatch", 500).load()

with offset tracking (initialOffset / read / readBetweenOffsets) giving
exactly-once replay from the checkpoint, the property the reference's
producer delegates to Kafka.

Two modes:
- ``mode=synthetic`` (default): deterministic generated trades — a seeded
  arithmetic stream, so tests/benchmarks are reproducible and a restart
  replays IDENTICAL rows for any offset range (the contract checkpoint
  recovery depends on).
- ``mode=websocket``: the real exchange path; raises cleanly here (no ws
  lib/network in this container — the parse/backoff core it would reuse
  lives in ingest.py and is tested there).

Scale posture: a generator source is driver-light — each micro-batch is
one offset-range claim; rows materialize in executors via Arrow. For the
batch reader, ``numRows`` splits into ``numPartitions`` range partitions
so synthetic load tests parallelize like a real scan.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

TRADE_SOURCE_SCHEMA = (
    "trade_id BIGINT, symbol STRING, price STRING, quantity STRING, "
    "trade_time BIGINT, is_buyer_maker BOOLEAN"
)

_BASE_MS = 1_700_000_000_000


def _gen_trade(i: int, symbols: list[str]) -> tuple:
    """Deterministic trade #i — pure function of i so any offset range can
    be regenerated bit-identically (exactly-once replay)."""
    sym = symbols[i % len(symbols)]
    # Price walks a bounded deterministic path per symbol; strings mirror
    # the wire format (the reference's JSON carries decimals as strings).
    base = 100.0 * (1 + (i % len(symbols)))
    px = base + ((i * 7919) % 1000) / 100.0
    qty = 0.1 + ((i * 104729) % 100) / 100.0
    return (
        i,
        sym,
        f"{px:.8f}",
        f"{qty:.8f}",
        _BASE_MS + i * 250,  # 4 trades/sec
        (i * 2654435761) % 2 == 0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class TradeGenBatchReader(DataSourceReader):
    """Bounded batch twin: numRows split into numPartitions ranges."""

    def __init__(self, options):
        self.n = int(options.get("numRows", 1000))
        self.parts = int(options.get("numPartitions", 8))
        self.symbols = options.get("symbols", "BTCUSDT,ETHUSDT").split(",")

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _gen_trade(i, self.symbols)


class TradeGenStreamReader(SimpleDataSourceStreamReader):
    """Unbounded stream: offset = next trade index; each micro-batch claims
    ``tradesPerBatch`` ids. readBetweenOffsets regenerates any committed
    range for recovery replay."""

    def __init__(self, options):
        self.per_batch = int(options.get("tradesPerBatch", 100))
        self.symbols = options.get("symbols", "BTCUSDT,ETHUSDT").split(",")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i0 = int(start["i"])
        i1 = i0 + self.per_batch
        return iter([_gen_trade(i, self.symbols) for i in range(i0, i1)]), {"i": i1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [_gen_trade(i, self.symbols) for i in range(int(start["i"]), int(end["i"]))]
        )


class TradeDataSource(DataSource):
    """format("trades") — register with spark.dataSource.register."""

    @classmethod
    def name(cls) -> str:
        return "trades"

    def schema(self) -> str:
        return TRADE_SOURCE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        self._check_mode()
        return TradeGenBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        self._check_mode()
        return TradeGenStreamReader(self.options)

    def _check_mode(self) -> None:
        mode = self.options.get("mode", "synthetic")
        if mode == "websocket":
            raise NotImplementedError(
                "websocket mode needs a ws client lib and network access "
                "(absent in this environment); the connection/backoff/parse "
                "core it would wrap is ingest.py"
            )
        if mode != "synthetic":
            raise ValueError(f"unknown trades source mode: {mode!r}")
