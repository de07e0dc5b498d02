"""Running per-key trade stats on Spark 4's transformWithStateInPandas.

Same contract as stateful.running_trade_stats (all-history per-symbol
n/volume/value/VWAP/high/low — the aggregate that never resets, which the
reference's windowed agg at spark_processor/processor.py:77-89 cannot
express), rebuilt on the NEW arbitrary-state API:

- applyInPandasWithState hands the operator one opaque state tuple and a
  GroupState lifecycle; transformWithState hands it a HANDLE with typed,
  independently-evolvable state variables (ValueState here; ListState /
  MapState for richer operators), timers, and TTL support.
- The engine requires the RocksDB state-store provider for this operator
  (job.ROCKSDB_STATE_CONF — at-scale posture anyway: state lives off-heap
  and checkpoint deltas are incremental).
- Arrow-batched like its predecessor: the Python hop costs per batch.

Both implementations stay registered: applyInPandasWithState is the
Spark 3.x-portable path, this is the forward path. The equivalence test
(tests/test_streaming.py) pins them to the same batch fold; it is
skipif-gated on google.protobuf, which the transformWithState
state-server protocol imports at query start and which this sandbox
lacks — the operator is pure public API and runs anywhere protobuf is
installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema — identical to stateful.RUNNING_STATS_SCHEMA so the two
#: implementations are drop-in interchangeable.
TWS_STATS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("n_trades", LongType()),
        StructField("total_volume", DoubleType()),
        StructField("total_value", DoubleType()),
        StructField("vwap", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
    ]
)

_AGG_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("vol", DoubleType()),
        StructField("val", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """ValueState fold: one fixed-size tuple per key, updated per batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _AGG_STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, vol, val = 0, 0.0, 0.0
        high, low = float("-inf"), float("inf")
        for pdf in rows:
            n += len(pdf)
            price = pdf["price"].astype(float)
            qty = pdf["quantity"].astype(float)
            vol += float(qty.sum())
            val += float((price * qty).sum())
            high = max(high, float(price.max()))
            low = min(low, float(price.min()))
        if self._agg.exists():
            pn, pvol, pval, phigh, plow = self._agg.get()
            n += pn
            vol += pvol
            val += pval
            high = max(high, phigh)
            low = min(low, plow)
        self._agg.update((n, vol, val, high, low))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "n_trades": [n],
                "total_volume": [vol],
                "total_value": [val],
                "vwap": [val / vol if vol else float("nan")],
                "high": [high],
                "low": [low],
            }
        )

    def close(self) -> None:
        pass


def running_trade_stats_tws(trades: DataFrame) -> DataFrame:
    """transformWithStateInPandas running stats — emits the updated
    cumulative row for every key seen in the micro-batch. Requires the
    RocksDB state-store provider (job.ROCKSDB_STATE_CONF) on the session."""
    return trades.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=TWS_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
