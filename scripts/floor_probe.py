"""Fixed-floor profiler for the r14 optimization round (VERDICT r13 #3).

The r13 verdict found the 164-query headline dominated by a ~1 s/query
fixed floor (8 cores beat 32 on the full bench). This tool decomposes that
floor — measurement only, never writes anything a query can read back.

Per headline query (bench-identical warmup, best-of-N):
  construct_sec  — REGISTRY[q].fn(spark, sf_dir): Python work, py4j
                   round-trips, eager analysis, and any jobs the
                   constructor itself runs (checkpoint materializations).
  action_sec     — .write.format("noop").save() on the pre-built frame:
                   optimization + physical planning + execution.

Plus session microbenchmarks of the candidate fixed costs:
  noop_range1    — smallest possible action (job-submission floor)
  one_shuffle    — 32-partition shuffle agg (task-wave floor)
  read_table     — fixture read (file listing + footer schema inference)
  runtime_conf   — apply_runtime_conf (10+ conf.set py4j round-trips)

Usage:
  python scripts/floor_probe.py [--runs 2] [--top 25] [--sf DIR] [q ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_trading_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from crypto_trading_data_pipeline_spark.session import get_spark  # noqa: E402


def _warmup(spark, sf_dir):
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


def _micro(spark, sf_dir) -> dict:
    from crypto_trading_data_pipeline_spark.io import read_table
    from crypto_trading_data_pipeline_spark.session import apply_runtime_conf

    out = {}

    def best(fn, n=5):
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 4)

    out["noop_range1"] = best(
        lambda: spark.range(1).write.mode("overwrite").format("noop").save()
    )
    out["one_shuffle_32"] = best(
        lambda: spark.range(0, 100_000, 1, 32)
        .selectExpr("id % 97 AS k")
        .groupBy("k")
        .count()
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    out["read_table_lineitem"] = best(
        lambda: read_table(spark, sf_dir, "lineitem")
    )
    out["read_parquet_raw"] = best(
        lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    )
    out["runtime_conf_apply"] = best(lambda: apply_runtime_conf(spark))
    out["count_warm_table"] = best(
        lambda: read_table(spark, sf_dir, "lineitem").count()
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="ctdp-floor-probe")
    spark.sparkContext.setLogLevel("WARN")
    _warmup(spark, args.sf)

    micro = _micro(spark, args.sf)
    print("micro:", json.dumps(micro), flush=True)

    if args.queries:
        names = [q for q in args.queries if q in REGISTRY]
    else:
        import importlib.util

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "bench_mod", os.path.join(here, "bench.py")
        )
        bench_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_mod)
        names = [n for n in bench_mod.HEADLINE if n in REGISTRY]

    # Untimed first pass so codegen/first-touch lands outside measurement
    # (mirrors bench.py, where run 1 of 3 absorbs it and best-of drops it).
    rows = {}
    for name in names:
        fn = REGISTRY[name].fn
        try:
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"err": str(exc)[:120]}
            continue
        best_c, best_a, best_t = None, None, None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            c, a = t1 - t0, t2 - t1
            if best_t is None or (c + a) < best_t:
                best_c, best_a, best_t = c, a, c + a
        rows[name] = {
            "construct": round(best_c, 3),
            "action": round(best_a, 3),
            "total": round(best_t, 3),
        }
        print(f"{name}: construct={best_c:.3f} action={best_a:.3f}", flush=True)

    ok = {k: v for k, v in rows.items() if "err" not in v}
    sum_c = round(sum(v["construct"] for v in ok.values()), 2)
    sum_a = round(sum(v["action"] for v in ok.values()), 2)
    print(f"\nTOTAL construct={sum_c}s action={sum_a}s n={len(ok)}")
    print("\nslowest by construct:")
    for k in sorted(ok, key=lambda k: -ok[k]["construct"])[: args.top]:
        print(f"  {k}: construct={ok[k]['construct']} action={ok[k]['action']}")
    print("\nslowest by action:")
    for k in sorted(ok, key=lambda k: -ok[k]["action"])[: args.top]:
        print(f"  {k}: construct={ok[k]['construct']} action={ok[k]['action']}")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_PROBE.json",
    )
    with open(out_path, "w") as f:
        json.dump({"micro": micro, "queries": rows}, f, indent=1)


if __name__ == "__main__":
    main()
