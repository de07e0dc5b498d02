"""Explicit schema registry (SURVEY.md §1.3: fixed, declared, parse-enforced).

The reference hand-declares its one input schema as a 6-field StructType
(reference spark_processor/processor.py:43-52) and applies it with
``from_json``. We keep the same discipline: every wire schema lives here;
nothing is inferred at runtime in the engine core.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Raw trade message as produced onto Kafka topic ``raw_trades``
#: (reference producer/producer.py:51-58 renames Binance's t/s/p/q/T/m).
#: price/quantity arrive as STRINGS to preserve precision
#: (reference spark_processor/processor.py:47-48); cast downstream.
TRADE_SCHEMA = StructType(
    [
        StructField("trade_id", LongType()),
        StructField("symbol", StringType()),
        StructField("price", StringType()),
        StructField("quantity", StringType()),
        StructField("trade_time", LongType()),  # epoch milliseconds
        StructField("is_buyer_maker", BooleanType()),
    ]
)

#: Exact-money decimal used after the string->decimal cast
#: (reference spark_processor/processor.py:71-72, postgres/init/init.sql:10-15).
MONEY = DecimalType(20, 8)

#: Fixture ``events.props`` JSON payload (FIXTURES.md §B: '{"k": 87}').
EVENT_PROPS_SCHEMA = StructType([StructField("k", IntegerType())])
