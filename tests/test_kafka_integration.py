"""Live-broker Kafka smoke test — the LAST fidelity gap with the
reference's runtime (docker-compose.yml:81 runs a real broker; this
container does not, so the module SKIPS unless pointed at one).

To run it for real, anywhere Docker exists (one command per step):

    # 1. a single-node broker on localhost:9092 (redpanda needs no
    #    zookeeper and is kafka-API-compatible):
    docker run -d --name=redpanda -p 9092:9092 \
        docker.redpanda.com/redpandadata/redpanda:latest \
        redpanda start --overprovisioned --smp 1 --memory 1G \
        --kafka-addr PLAINTEXT://0.0.0.0:9092 \
        --advertise-kafka-addr PLAINTEXT://localhost:9092
    # 2. the connector JARs on the session classpath + the broker env:
    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell" \
    SPARK_GRAFT_KAFKA_BROKERS=localhost:9092 \
        python -m pytest tests/test_kafka_integration.py
    # 3. teardown:  docker rm -f redpanda

Everything the test drives is the exact production wiring — sources.py
kafka_sink/kafka_batch/kafka_stream are thin option-builders over Spark's
built-in connector, so the unit suites prove the transforms on file-stream
twins and THIS module proves only the broker hop itself:
produce (to_kafka_records -> kafka) -> batch read-back -> parse_trades
round-trip, then the streaming path kafka_stream -> parse_trades ->
candle_stream matching reference spark_processor/processor.py:54-101.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BROKERS = os.environ.get("SPARK_GRAFT_KAFKA_BROKERS")

pytestmark = pytest.mark.skipif(
    not BROKERS,
    reason=(
        "live Kafka smoke test: set SPARK_GRAFT_KAFKA_BROKERS=host:port "
        "(and put spark-sql-kafka on the classpath) to enable"
    ),
)

#: 20 deterministic trades in the producer wire shape
#: (reference producer/producer.py:51-58): price/quantity as strings,
#: trade_time in epoch millis, two symbols interleaved.
_TRADES = [
    {
        "trade_id": i,
        "symbol": "BTCUSDT" if i % 2 == 0 else "ETHUSDT",
        "price": f"{100 + i}.{i:02d}",
        "quantity": f"0.{i + 1:02d}",
        "trade_time": 1_700_000_000_000 + i * 1_000,
        "is_buyer_maker": i % 3 == 0,
    }
    for i in range(20)
]


def _kafka_available(spark) -> bool:
    """True when the spark-sql-kafka connector classes are loadable."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001 — any failure means "not on classpath"
        return False


@pytest.fixture(scope="module")
def topic(spark):
    if not _kafka_available(spark):
        pytest.skip("spark-sql-kafka connector not on the session classpath")
    return f"ctdp_smoke_{uuid.uuid4().hex[:8]}"


@pytest.fixture(scope="module")
def produced(spark, topic, tmp_path_factory):
    """Produce the fixture trades once via the PRODUCTION wire serializer
    (sources.to_kafka_records — JSON object per message, symbol-keyed),
    through Spark's batch Kafka sink."""
    from crypto_trading_data_pipeline_spark.sources import to_kafka_records

    df = spark.createDataFrame(
        [tuple(t.values()) for t in _TRADES],
        "trade_id long, symbol string, price string, quantity string, "
        "trade_time long, is_buyer_maker boolean",
    )
    (
        to_kafka_records(df, key_col="symbol")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic)
        .save()
    )
    return topic


def test_batch_roundtrip_parses_byte_for_byte(spark, produced):
    """kafka_batch -> parse_trades must reproduce the reference processor's
    parsed schema and values exactly (processor.py:54-75): typed columns,
    MONEY decimals, millis -> timestamp, derived trade_value."""
    from crypto_trading_data_pipeline_spark.schemas import TRADE_SCHEMA
    from crypto_trading_data_pipeline_spark.sources import kafka_batch, parse_trades

    # The WIRE schema the bytes are parsed with must equal reference
    # processor.py:43-52 field-for-field (name, type, order): trade_id
    # long, symbol string, price string, quantity string (decimals ride
    # as STRINGS on the wire), trade_time epoch-millis long,
    # is_buyer_maker boolean.
    assert [(f.name, f.dataType.simpleString()) for f in TRADE_SCHEMA.fields] == [
        ("trade_id", "bigint"),
        ("symbol", "string"),
        ("price", "string"),
        ("quantity", "string"),
        ("trade_time", "bigint"),
        ("is_buyer_maker", "boolean"),
    ]

    raw = kafka_batch(spark, topic=produced, brokers=BROKERS)
    parsed = parse_trades(raw)
    fields = [f.simpleString() for f in parsed.schema.fields]
    assert fields[:6] == [
        "trade_id:bigint",
        "symbol:string",
        "price:decimal(20,8)",
        "quantity:decimal(20,8)",
        "trade_time:timestamp",
        "is_buyer_maker:boolean",
    ]
    # trade_value = price * quantity: exact precision depends on
    # spark.sql.decimalOperations.allowPrecisionLoss; decimal either way.
    assert fields[6].startswith("trade_value:decimal(38,")
    # Epoch compare via unix_millis in-query: collect() renders LTZ as a
    # naive datetime in the SESSION tz, and datetime.timestamp() would
    # re-interpret it in the HOST OS tz — skewing every epoch when the
    # two differ. unix_millis reads the instant directly.
    from pyspark.sql import functions as F

    rows = {
        r.trade_id: r
        for r in parsed.withColumn(
            "tt_ms", F.expr("unix_millis(trade_time)")
        ).collect()
    }
    assert len(rows) == len(_TRADES)
    for t in _TRADES:
        r = rows[t["trade_id"]]
        assert r.symbol == t["symbol"]
        assert float(r.price) == pytest.approx(float(t["price"]))
        assert float(r.quantity) == pytest.approx(float(t["quantity"]))
        assert r.tt_ms == t["trade_time"]
        assert float(r.trade_value) == pytest.approx(
            float(t["price"]) * float(t["quantity"])
        )
    # Keying by symbol must have landed each symbol's trades in order
    # within its partition (the per-symbol ordering the reference's
    # open/close semantics rely on).
    part_order = (
        raw.selectExpr("partition", "offset", "CAST(value AS STRING) AS v")
        .orderBy("partition", "offset")
        .collect()
    )
    by_part: dict[int, list[int]] = {}
    for r in part_order:
        by_part.setdefault(r.partition, []).append(json.loads(r.v)["trade_id"])
    for ids in by_part.values():
        assert ids == sorted(ids)


def test_streaming_candles_end_to_end(spark, produced, tmp_path):
    """kafka_stream -> parse_trades -> candle_stream -> memory sink: the
    full reference runtime (processor.py:54-101) against a live broker,
    drained with an availableNow trigger so the test terminates."""
    from crypto_trading_data_pipeline_spark.sources import kafka_stream, parse_trades
    from crypto_trading_data_pipeline_spark.streaming.job import candle_stream

    raw = kafka_stream(
        spark, topic=produced, brokers=BROKERS, starting_offsets="earliest"
    )
    candles = candle_stream(parse_trades(raw))
    q = (
        candles.writeStream.format("memory")
        .queryName("kafka_smoke_candles")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM kafka_smoke_candles").collect()
    # 20 trades x 2 symbols across a 19-second span -> exactly one 1-min
    # window per symbol.
    assert {r.symbol for r in out} == {"BTCUSDT", "ETHUSDT"}
    assert all(r.n_trades == 10 for r in out)
