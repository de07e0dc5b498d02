"""CLI entry: run a declared query and print its result.

    python -m crypto_trading_data_pipeline_spark                 # flagship
    python -m crypto_trading_data_pipeline_spark q_lsh_pairs     # any query
    python -m crypto_trading_data_pipeline_spark --list          # inventory

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001),
SPARK_GRAFT_CPUS (local[] parallelism).
"""

from __future__ import annotations

import os
import sys

from .queries import REGISTRY
from .session import get_spark


def main(argv: list[str]) -> int:
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
