"""One A/B bench run against ONE tree (helper for scripts/ab_bench.py).

Usage: python scripts/ab_runner.py <tree_dir> <out_json>

Applies the IDENTICAL harness (bench.py's warm-up sequence + best-of-3
per-query timing + the fixed calibration workload) to whichever tree is
given, importing that tree's REGISTRY / get_spark / HEADLINE. The harness
is shared so an A/B difference can only come from engine code, never from
measurement-protocol drift between rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    out = os.path.abspath(sys.argv[2])
    sys.path.insert(0, tree)
    os.chdir(tree)

    from crypto_trading_data_pipeline_spark.queries import REGISTRY
    from crypto_trading_data_pipeline_spark.session import get_spark

    # The tree's own headline list. The parent compares best_total over the
    # SHARED query set only (r11 ADVICE), so a divergence between the two
    # trees' lists cannot skew head_over_r9_pct.
    import importlib.util

    spec = importlib.util.spec_from_file_location("ab_bench_mod", os.path.join(tree, "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    headline = [n for n in bench_mod.HEADLINE if n in REGISTRY]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ctdp-spark-ab")
    spark.sparkContext.setLogLevel("WARN")

    # --- warm-up, mirroring bench.main() ---
    from crypto_trading_data_pipeline_spark.io import TABLES, read_table

    for t in TABLES:
        read_table(spark, sf_dir, t).count()
    spark.range(8).write.mode("overwrite").format("noop").save()

    def _identity_batches(it):
        yield from it

    (
        spark.range(256)
        .repartition(int(spark.sparkContext.defaultParallelism))
        .mapInPandas(_identity_batches, "id long")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    try:
        from pyspark.sql import functions as F

        from crypto_trading_data_pipeline_spark.operators.multimodal import (
            attach_media,
            extract_image_features,
        )

        tiny = spark.range(8).select(
            F.col("id"), F.encode(F.col("id").cast("string"), "utf-8").alias("b")
        )
        media = attach_media(tiny, id_col="id", bytes_col="b", kind="image", mime="image/fake")
        extract_image_features(media, parallelism=8).write.mode("overwrite").format("noop").save()
    except Exception:  # noqa: BLE001
        pass
    try:
        REGISTRY[headline[0]].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    except Exception:  # noqa: BLE001
        pass

    # --- timed loop: best-of-3 per query, bench.py protocol ---
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in headline:
        fn = REGISTRY[name].fn
        runs: list[float] = []
        try:
            while len(runs) < 3:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {(str(exc).splitlines() or [''])[0][:120]}"

    calib = bench_mod._calibration_sec(spark)
    record = {
        "tree": tree,
        "calib_sec": calib,
        "total": round(sum(timings.values()), 3),
        "n_ok": len(timings),
        "errors": errors,
        "queries": timings,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"tree": tree, "total": record["total"], "calib_sec": calib, "n_ok": len(timings), "n_err": len(errors)}))
    spark.stop()


if __name__ == "__main__":
    main()
