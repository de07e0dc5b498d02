"""CLI entry: run a declared query and print its result.

    python -m crypto_trading_data_pipeline_spark                 # flagship
    python -m crypto_trading_data_pipeline_spark q_lsh_pairs     # any query
    python -m crypto_trading_data_pipeline_spark --list          # inventory
    python -m crypto_trading_data_pipeline_spark submit \\
        --master spark://host:7077 app.py [--jars a.jar,b.jar] \\
        [--retries 3]                                # cluster submission

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001),
SPARK_GRAFT_CPUS (local[] parallelism).
"""

from __future__ import annotations

import os
import sys

from .queries import REGISTRY
from .session import get_spark


def _submit(argv: list[str]) -> int:
    """spark-submit orchestration (reference submit DAG analog): build the
    argv, launch with retry/backoff, exit nonzero if never healthy."""
    import argparse

    from .submit import build_spark_submit, submit_with_retry

    p = argparse.ArgumentParser(prog="submit")
    p.add_argument("app")
    p.add_argument("--master", required=True)
    p.add_argument("--name", default="crypto-trading-data-pipeline-spark")
    p.add_argument("--jars", default="")
    p.add_argument("--retries", type=int, default=3)
    p.add_argument("app_args", nargs="*")
    a = p.parse_args(argv)
    cmd = build_spark_submit(
        a.app,
        master=a.master,
        name=a.name,
        jars=[j for j in a.jars.split(",") if j],
        app_args=a.app_args,
    )
    out = submit_with_retry(cmd, retries=a.retries)
    print(f"attempts={out.attempts} rc={out.returncode} healthy={out.healthy}")
    return 0 if out.ok else 1


def main(argv: list[str]) -> int:
    if argv and argv[0] == "submit":
        return _submit(argv[1:])
    if "--list" in argv:
        for name, spec in sorted(REGISTRY.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:28s} [{kind}] {spec.doc.splitlines()[0][:90]}")
        return 0
    name = argv[0] if argv else "q_ohlcv_1min"
    if name not in REGISTRY:
        print(f"unknown query {name!r}; use --list", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name=f"ctdp-{name}")
    spark.sparkContext.setLogLevel("WARN")
    df = REGISTRY[name].fn(spark, sf_dir)
    df.show(20, truncate=False)
    print(f"{name}: {df.count()} rows at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
