"""One full-registry-sweep pass against ONE tree (helper for ab_sweep.py).

Usage: python scripts/ab_sweep_runner.py <tree_dir> <out_json>

Runs the tree's registry-sweep set (REGISTRY minus that tree's HEADLINE —
exactly bench.py's sweep definition) once, single-run per query with a
noop sink, after the same table/Arrow warm-up ab_runner.py uses. The
parent interleaves passes across the two trees and compares per-query
bests over the SHARED query set only, so registry growth between rounds
cannot masquerade as a regression.
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

    import importlib.util

    spec = importlib.util.spec_from_file_location("ab_bench_mod", os.path.join(tree, "bench.py"))
    bench_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_mod)
    headline = set(n for n in bench_mod.HEADLINE if n in REGISTRY)
    sweep_names = [n for n in REGISTRY if n not in headline]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ctdp-spark-ab-sweep")
    spark.sparkContext.setLogLevel("WARN")

    # Warm-up mirrors ab_runner.py: scan every fixture, first-touch the
    # noop sink and the Arrow/mapInPandas machinery.
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

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_sweep = time.perf_counter()
    for name in sweep_names:
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record and keep sweeping
            errors[name] = f"{type(exc).__name__}: {(str(exc).splitlines() or [''])[0][:120]}"
    wall = round(time.perf_counter() - t_sweep, 3)

    record = {
        "tree": tree,
        "sweep_wall_sec": wall,
        "calib_sec": bench_mod._calibration_sec(spark),
        "n_ok": len(timings),
        "errors": errors,
        "queries": timings,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(
        json.dumps(
            {"tree": tree, "sweep_wall_sec": wall, "n_ok": len(timings), "n_err": len(errors)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
