"""Targeted same-box interleaved A/B over a QUERY LIST: baseline tree vs HEAD.

The full ab_bench.py runs the entire 164-query headline 6 times (~45 min);
iterating on one query family needs the same interleaved fresh-JVM
discipline at a fraction of the cost. Same verdict machinery: pattern
H B B H H B, best-of-N per query per run, per-tree best = min across its
runs, delta on the shared set.

Usage:
  python scripts/ab_queries.py <baseline_sha> [--runs 3] [--out FILE] q_a q_b ...

Measurement tool only — never writes anything a query can read back.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time

tree, out, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
queries = sys.argv[4:]
sys.path.insert(0, tree)
os.chdir(tree)

from crypto_trading_data_pipeline_spark.queries import REGISTRY
from crypto_trading_data_pipeline_spark.session import get_spark
from crypto_trading_data_pipeline_spark.io import TABLES, read_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ctdp-ab-queries")
spark.sparkContext.setLogLevel("WARN")
for t in TABLES:
    read_table(spark, sf_dir, t).count()
spark.range(8).write.mode("overwrite").format("noop").save()

def _identity_batches(it):
    yield from it

(spark.range(256)
 .repartition(int(spark.sparkContext.defaultParallelism))
 .mapInPandas(_identity_batches, "id long")
 .write.mode("overwrite").format("noop").save())

res = {}
for name in queries:
    if name not in REGISTRY:
        continue
    fn = REGISTRY[name].fn
    best = None
    try:
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        res[name] = round(best, 3)
    except Exception as exc:
        res[name] = f"ERR: {str(exc)[:120]}"
with open(out, "w") as f:
    json.dump(res, f)
"""


def _sh(args, **kw):
    return subprocess.run(args, check=True, **kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline_sha")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    wt = os.path.join(REPO, ".worktrees", f"abq_{args.baseline_sha}")
    if not os.path.isdir(wt):
        os.makedirs(os.path.dirname(wt), exist_ok=True)
        _sh(["git", "worktree", "add", "--detach", wt, args.baseline_sha], cwd=REPO)

    runner = os.path.join(tempfile.mkdtemp(prefix="abq_"), "runner.py")
    with open(runner, "w") as f:
        f.write(_RUNNER)

    pattern = [("head", REPO), ("baseline", wt), ("baseline", wt),
               ("head", REPO), ("head", REPO), ("baseline", wt)]
    bests: dict[str, dict[str, float]] = {"head": {}, "baseline": {}}
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    for i, (label, tree) in enumerate(pattern):
        out = runner + f".{i}.json"
        _sh([sys.executable, runner, tree, out, str(args.runs), *args.queries], env=env)
        with open(out) as f:
            rec = json.load(f)
        for q, t in rec.items():
            if isinstance(t, (int, float)):
                cur = bests[label].get(q)
                bests[label][q] = t if cur is None else min(cur, t)
            else:
                bests[label][q] = t
        print(f"[abq] run {i} {label}: {rec}", flush=True)

    shared = [q for q in args.queries
              if isinstance(bests["head"].get(q), (int, float))
              and isinstance(bests["baseline"].get(q), (int, float))]
    result = {
        "baseline_sha": args.baseline_sha,
        "head_sha": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                   cwd=REPO, capture_output=True, text=True).stdout.strip()
        + ("-dirty" if subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                                      capture_output=True, text=True).stdout.strip() else ""),
        "runs_per_tree_per_slot": args.runs,
        "pattern": [p[0] for p in pattern],
        "head": bests["head"],
        "baseline": bests["baseline"],
        "per_query_ratio": {
            q: round(bests["head"][q] / bests["baseline"][q], 3) for q in shared
        },
        "head_total": round(sum(bests["head"][q] for q in shared), 3),
        "baseline_total": round(sum(bests["baseline"][q] for q in shared), 3),
    }
    if result["baseline_total"]:
        result["head_over_baseline_pct"] = round(
            (result["head_total"] - result["baseline_total"])
            / result["baseline_total"] * 100, 2)
    print(json.dumps(result, indent=1))
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
