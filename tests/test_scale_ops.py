"""Scale helpers must not change semantics: salted aggregation equals plain
aggregation; partitioned writes round-trip with pruning-friendly layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_trading_data_pipeline_spark.io import read_table
from crypto_trading_data_pipeline_spark.operators.scale import (
    salted_group_sum,
    with_salt,
    write_partitioned,
)


def test_salted_group_sum_matches_plain(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    plain = {
        r.event_type: (round(r.s, 6), r.n)
        for r in e.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.event_type: (round(r.total, 6), r.n)
        for r in salted_group_sum(
            e.select("event_type", "value"),
            keys=["event_type"],
            agg_cols={"total": "value"},
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_with_salt_bounded_and_deterministic(spark, sf_dir):
    e = read_table(spark, sf_dir, "events").limit(100)
    s1 = [r["__salt"] for r in with_salt(e, buckets=4).select("__salt").collect()]
    s2 = [r["__salt"] for r in with_salt(e, buckets=4).select("__salt").collect()]
    assert s1 == s2
    assert set(s1) <= {0, 1, 2, 3}


def test_write_partitioned_roundtrip(spark, sf_dir, tmp_path):
    e = read_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(e, out, partition_by=["day"], sort_by=["ts"])
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # partition pruning: the day predicate must land in PartitionFilters
    # (directory-level pruning), not survive as a post-scan Filter.
    one_day = back.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf, plan
