"""Per-query isolation probe for the r13 optimization round.

Times named queries (or a family) best-of-N through the noop sink in ONE
warmed session — the same methodology as bench.py's headline loop — and
optionally dumps ``explain("formatted")`` to plans/r13/<query>_<tag>.txt.

Usage:
  python scripts/opt_probe.py [--runs 3] [--plans TAG] [--sf DIR] q_a q_b ...

This is a measurement tool only; it never writes results anywhere a query
could read them back (no caching of query outputs across invocations).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain(formatted) to plans/<dir>/<q>_<TAG>.txt")
    ap.add_argument("--plans-dir", default="r14", help="subdir under plans/ for the dumps")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="ctdp-opt-probe")
    spark.sparkContext.setLogLevel("WARN")

    from crypto_trading_data_pipeline_spark.io import TABLES, read_table

    for t in TABLES:
        read_table(spark, args.sf, t).count()
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

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in REGISTRY:
            print(f"!! {name}: not in REGISTRY", file=sys.stderr)
            continue
        fn = REGISTRY[name].fn
        if args.plans:
            plan_dir = os.path.join(here, "plans", args.plans_dir)
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, args.sf)
            # Public API only (r13 ADVICE #4): capture explain() stdout
            # instead of the private PythonSQLUtils/_jdf bridge.
            import contextlib
            import io as _io

            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(buf.getvalue())
        runs = []
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(runs), "runs": runs}
        print(f"{name}: best={min(runs)} runs={runs}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
