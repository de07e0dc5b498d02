"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with total + per-query wall seconds.

Each query is fully executed via the noop sink (format("noop")) so the whole
plan runs — no collect() driver bottleneck, no disk write skew.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_trading_data_pipeline_spark.queries import REGISTRY
from crypto_trading_data_pipeline_spark.session import get_spark

HEADLINE = [
    "q_ohlcv_1min",
    "q_pricing_summary",
    "q_revenue_by_nation",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_range",
    "q_join_range_asof",
    "q_topk_per_group",
    "q_window_moving_avg",
    "q_upsert_last_wins",
    "q_count_distinct",
    "q_rollup",
    "q_dedup_exact",
    "q_token_stats",
    "q_cosine_topk",
    "q_sliding_window",
    "q_session_window",
    "q_minhash_sig",
    "q_lsh_pairs",
    "q_neardup_dedup",
    "q_simhash",
    "q_ann_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="ctdp-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session spin-up (first-ever query otherwise pays codegen
    # compiler + footer reads for every table it touches).
    from crypto_trading_data_pipeline_spark.io import TABLES, read_table

    for t in TABLES:
        read_table(spark, sf_dir, t).count()

    names = [n for n in HEADLINE if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
