"""One streaming-throughput A/B run against ONE tree (helper for ab_stream.py).

Usage: python scripts/ab_stream_runner.py <tree_dir> <out_json>

Imports the given tree's engine modules and calls that tree's
``bench.bench_streaming`` (parse -> watermark -> 1-min OHLCV ->
foreachBatch drain, best-of-3 internally). The parent asserts the
bench_streaming AST is identical across the two trees before launching,
so a delta can only come from engine code, never harness drift.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    out = os.path.abspath(sys.argv[2])
    sys.path.insert(0, tree)
    os.chdir(tree)

    import importlib.util

    spec = importlib.util.spec_from_file_location("ab_bench_mod", os.path.join(tree, "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)

    from crypto_trading_data_pipeline_spark.io import read_table
    from crypto_trading_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ctdp-spark-ab-stream")
    spark.sparkContext.setLogLevel("WARN")

    # Light warm-up: touch the input fixture and the noop sink so run 1 of
    # the internal best-of-3 absorbs only streaming-machinery first-touch
    # (bench_streaming's own documented convention), not scan warm-up.
    read_table(spark, sf_dir, "events").count()
    spark.range(8).write.mode("overwrite").format("noop").save()

    stats = bench_mod.bench_streaming(spark, sf_dir)
    stats["tree"] = tree
    stats["calib_sec"] = bench_mod._calibration_sec(spark)
    with open(out, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
