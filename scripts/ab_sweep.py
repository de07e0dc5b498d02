"""Same-box full-registry-sweep A/B: a committed BASELINE tree vs HEAD.

Baseline defaults to the r10 round-end commit (96e2d8e), overridable via
argv[1]; record keys are baseline-labelled with baseline_sha +
baseline_overridden (r12 ADVICE). Origin: VERDICT r11 #2.

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
BASELINE_SHA = sys.argv[1] if len(sys.argv) > 1 else "96e2d8e"
WT_NAME = f"ab_{BASELINE_SHA}"
WT = os.path.join(REPO, ".worktrees", WT_NAME)


def _head_sha() -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        return (out + ("-dirty" if dirty else "")) or None
    except Exception:  # noqa: BLE001
        return None


def ensure_worktree() -> None:
    if not os.path.isdir(WT):
        os.makedirs(os.path.dirname(WT), exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", WT, BASELINE_SHA], cwd=REPO, check=True
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
        ("baseline", WT),
        ("baseline", WT),
        ("head", REPO),
        ("head", REPO),
        ("baseline", WT),
    ]
    runs: dict[str, list[dict]] = {"head": [], "baseline": []}
    for i, (label, tree) in enumerate(pattern):
        out = os.path.join(tmp, f"run{i}_{label}.json")
        rec = one_run(tree, out)
        runs[label].append(rec)
        print(
            f"[ab-sweep] run {i} {label}: wall={rec['sweep_wall_sec']} "
            f"n_ok={rec['n_ok']} calib={rec['calib_sec']}",
            flush=True,
        )

    result: dict = {"pattern": [p[0] for p in pattern], "baseline_sha": BASELINE_SHA,
        "baseline_overridden": len(sys.argv) > 1,
        "head_sha": _head_sha()}
    qbest: dict[str, dict[str, float]] = {}
    for label in ("head", "baseline"):
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
    shared = sorted(set(qbest["head"]) & set(qbest["baseline"]))
    head_only = sorted(set(qbest["head"]) - set(qbest["baseline"]))
    baseline_only = sorted(set(qbest["baseline"]) - set(qbest["head"]))
    h = round(sum(qbest["head"][q] for q in shared), 3)
    r = round(sum(qbest["baseline"][q] for q in shared), 3)
    result["shared_n"] = len(shared)
    result["head_best_total_shared"] = h
    result["r10_best_total_shared"] = r
    result["head_over_baseline_pct_shared"] = round((h - r) / r * 100, 2)
    result["head_only"] = {q: qbest["head"][q] for q in head_only}
    result["baseline_only"] = {q: qbest["baseline"][q] for q in baseline_only}
    result["head_only_total"] = round(sum(result["head_only"].values()), 3)
    deltas = sorted(shared, key=lambda q: -(qbest["head"][q] - qbest["baseline"][q]))
    result["worst_deltas"] = [
        {
            "q": q,
            "head": qbest["head"][q],
            "baseline": qbest["baseline"][q],
            "delta": round(qbest["head"][q] - qbest["baseline"][q], 3),
        }
        for q in deltas[:15]
    ]
    with open(os.path.join(REPO, "SCALE_AB_SWEEP.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(
        f"shared={len(shared)} head={h} baseline={r} "
        f"delta={result['head_over_baseline_pct_shared']}% "
        f"(head-only adds {result['head_only_total']}s over {len(head_only)} queries)"
    )


if __name__ == "__main__":
    main()
