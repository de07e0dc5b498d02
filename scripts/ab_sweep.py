"""Same-box full-registry-sweep A/B: committed r10 tree (96e2d8e) vs HEAD
(VERDICT r11 #2).

BENCH_r11 read the registry sweep at +11.3% raw / +33.9% normalized vs r10
— but the raw delta mixes (a) queries added in r11, (b) trained-tier
variance, (c) genuine regression, and the normalization assumes the CPU
calibration ruler transfers to trainer-dominated, scheduler-bound jobs
(the exact assumption the r10→r11 headline A/B discredited for I/O-bound
drift). This adjudicates it the same way the headline was adjudicated:
both trees, same box, interleaved head/r10/r10/head/head/r10, fresh JVM
per run, identical harness (scripts/ab_sweep_runner.py), per-query
best-of-3 across runs, totals compared over the SHARED sweep set only —
r11's additions are excluded by construction, and they are also reported
separately so the raw-delta decomposition is explicit.

Writes SCALE_AB_SWEEP.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Baseline tree to A/B against — override with argv[1] (any committed
# sha; default is the r10 round-end commit this harness first adjudicated).
R10_SHA = sys.argv[1] if len(sys.argv) > 1 else "96e2d8e"
WT_NAME = f"ab_{R10_SHA}"
WT = os.path.join(REPO, ".worktrees", WT_NAME)


def ensure_worktree() -> None:
    if not os.path.isdir(WT):
        os.makedirs(os.path.dirname(WT), exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", WT, R10_SHA], cwd=REPO, check=True
        )


def one_run(tree: str, out: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_sweep_runner.py"), tree, out],
        check=True,
        env=env,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ensure_worktree()
    tmp = os.path.join(REPO, ".worktrees", "ab_sweep_out")
    os.makedirs(tmp, exist_ok=True)
    pattern = [
        ("head", REPO),
        ("r10", WT),
        ("r10", WT),
        ("head", REPO),
        ("head", REPO),
        ("r10", WT),
    ]
    runs: dict[str, list[dict]] = {"head": [], "r10": []}
    for i, (label, tree) in enumerate(pattern):
        out = os.path.join(tmp, f"run{i}_{label}.json")
        rec = one_run(tree, out)
        runs[label].append(rec)
        print(
            f"[ab-sweep] run {i} {label}: wall={rec['sweep_wall_sec']} "
            f"n_ok={rec['n_ok']} calib={rec['calib_sec']}",
            flush=True,
        )

    result: dict = {"pattern": [p[0] for p in pattern], "r10_sha": R10_SHA}
    qbest: dict[str, dict[str, float]] = {}
    for label in ("head", "r10"):
        best: dict[str, float] = {}
        for rec in runs[label]:
            for q, t in rec["queries"].items():
                best[q] = min(best.get(q, float("inf")), t)
        qbest[label] = best
        result[label] = {
            "walls": [r["sweep_wall_sec"] for r in runs[label]],
            "calibs": [r["calib_sec"] for r in runs[label]],
            "n_queries": len(best),
        }
    shared = sorted(set(qbest["head"]) & set(qbest["r10"]))
    head_only = sorted(set(qbest["head"]) - set(qbest["r10"]))
    r10_only = sorted(set(qbest["r10"]) - set(qbest["head"]))
    h = round(sum(qbest["head"][q] for q in shared), 3)
    r = round(sum(qbest["r10"][q] for q in shared), 3)
    result["shared_n"] = len(shared)
    result["head_best_total_shared"] = h
    result["r10_best_total_shared"] = r
    result["head_over_r10_pct_shared"] = round((h - r) / r * 100, 2)
    result["head_only"] = {q: qbest["head"][q] for q in head_only}
    result["r10_only"] = {q: qbest["r10"][q] for q in r10_only}
    result["head_only_total"] = round(sum(result["head_only"].values()), 3)
    deltas = sorted(shared, key=lambda q: -(qbest["head"][q] - qbest["r10"][q]))
    result["worst_deltas"] = [
        {
            "q": q,
            "head": qbest["head"][q],
            "r10": qbest["r10"][q],
            "delta": round(qbest["head"][q] - qbest["r10"][q], 3),
        }
        for q in deltas[:15]
    ]
    with open(os.path.join(REPO, "SCALE_AB_SWEEP.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(
        f"shared={len(shared)} head={h} r10={r} "
        f"delta={result['head_over_r10_pct_shared']}% "
        f"(head-only adds {result['head_only_total']}s over {len(head_only)} queries)"
    )


if __name__ == "__main__":
    main()
