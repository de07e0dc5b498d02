"""Ingestion adapter pure-function tests (no network, no Spark).

The wire-side normalization must agree with the Spark-side twin
(sources.normalize_binance) so archived raw messages replay identically
through either path.
"""

from __future__ import annotations

import json

from crypto_trading_data_pipeline_spark.ingest import (
    backoff_schedule,
    normalize_trade_message,
    subscribe_frame,
)


def test_subscribe_frame():
    frame = json.loads(subscribe_frame(["BTCUSDT", "ethusdt"]))
    assert frame["method"] == "SUBSCRIBE"
    assert frame["params"] == ["btcusdt@trade", "ethusdt@trade"]


def test_normalize_trade_message_roundtrip():
    raw = json.dumps(
        {"e": "trade", "t": 9, "s": "BTCUSDT", "p": "42000.10", "q": "0.5",
         "T": 1700000000000, "m": False, "E": 1700000000001}
    )
    rec = normalize_trade_message(raw)
    assert rec == {
        "trade_id": 9,
        "symbol": "BTCUSDT",
        "price": "42000.10",  # strings preserved: exact-precision transport
        "quantity": "0.5",
        "trade_time": 1700000000000,
        "is_buyer_maker": False,
    }


def test_normalize_drops_non_trades_and_garbage():
    assert normalize_trade_message(json.dumps({"e": "aggTrade", "t": 1})) is None
    assert normalize_trade_message("not json{") is None
    assert normalize_trade_message(json.dumps({"e": "trade", "t": 1})) is None  # missing fields
    assert normalize_trade_message(json.dumps([1, 2])) is None


def test_backoff_schedule_caps():
    sched = backoff_schedule(initial_s=5, cap_s=60)
    assert [next(sched) for _ in range(6)] == [5, 10, 20, 40, 60, 60]


def test_wire_and_spark_normalization_agree(spark):
    """The same raw message through ingest.normalize_trade_message and
    through sources.normalize_binance must yield the same record."""
    from crypto_trading_data_pipeline_spark.sources import normalize_binance

    raw = json.dumps(
        {"e": "trade", "t": "7", "s": "ETHUSDT", "p": "2200.5", "q": "2",
         "T": "1700000000000", "m": "true"}
    )
    wire = normalize_trade_message(raw)
    df = spark.createDataFrame([(raw,)], ["value"])
    spark_rec = normalize_binance(df).collect()[0].asDict()
    assert set(spark_rec) == set(wire)
    for k, v in spark_rec.items():
        assert str(v).lower() == str(wire[k]).lower(), k


def test_freshness_check(spark):
    """Monitor semantics (reference monitor DAG): fresh row within horizon
    -> OK; all rows older -> check fails."""
    from datetime import datetime, timezone

    from crypto_trading_data_pipeline_spark.monitor import freshness_ok

    rows = [
        ("BTCUSDT", datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)),
        ("BTCUSDT", datetime(2024, 3, 1, 12, 4, 0, tzinfo=timezone.utc)),
    ]
    df = spark.createDataFrame(rows, ["symbol", "window_start"])
    fresh_now = datetime(2024, 3, 1, 12, 5, 30)   # 90s after newest row
    stale_now = datetime(2024, 3, 1, 12, 8, 0)    # 4min after newest row
    assert freshness_ok(df, now=fresh_now)
    assert not freshness_ok(df, now=stale_now)
