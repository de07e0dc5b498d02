"""Same-box headline-bench A/B: a committed BASELINE tree vs HEAD.

Baseline defaults to the r9 round-end commit (f2049f1), overridable via
argv[1]; record keys are baseline-labelled with baseline_sha +
baseline_overridden (r12 ADVICE). Origin: VERDICT r10 #1.

Round 10's headline bench regressed ~10% at matched CPU calibration
(118.98 s vs r9's 107.96 s) and the triage attributed it to host
I/O/memory-bandwidth drift — for the second consecutive round. This runs
the decisive experiment: both trees, same box, same session, interleaved
B A A B B A so slow environment drift cancels, fresh JVM per run, the
identical harness (scripts/ab_runner.py) for both. Per-tree result = min
across its 3 runs per query (bench.py's best-of protocol extended across
processes).

Verdict rule: if the r9 tree's best total lands within ~3% of HEAD's, the
round-over-round delta was host, not code; if r9 reproduces its committed
~108 s while HEAD stays ~119 s, the delta is code and gets bisected.

Writes SCALE_AB.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Baseline tree to A/B against — override with argv[1] (any committed
# sha; default is the r9 round-end commit this harness first adjudicated).
BASELINE_SHA = sys.argv[1] if len(sys.argv) > 1 else "f2049f1"
WT_NAME = f"ab_{BASELINE_SHA}"
WT = os.path.join(REPO, ".worktrees", WT_NAME)
# argv[2]: record path (default keeps the original file; pass a new name
# to preserve a prior round's committed adjudication record).
OUT_JSON = sys.argv[2] if len(sys.argv) > 2 else "SCALE_AB.json"


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
    # Keep each run's sys.path clean of the other tree.
    env.pop("PYTHONPATH", None)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_runner.py"), tree, out],
        check=True,
        env=env,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ensure_worktree()
    tmp = os.path.join(REPO, ".worktrees", "ab_out")
    os.makedirs(tmp, exist_ok=True)
    # Interleaved pattern: whichever direction the box drifts during the
    # ~30 min experiment, each tree sees both early and late slots.
    pattern = [("head", REPO), ("baseline", WT), ("baseline", WT), ("head", REPO), ("head", REPO), ("baseline", WT)]
    runs: dict[str, list[dict]] = {"head": [], "baseline": []}
    for i, (label, tree) in enumerate(pattern):
        out = os.path.join(tmp, f"run{i}_{label}.json")
        rec = one_run(tree, out)
        runs[label].append(rec)
        print(f"[ab] run {i} {label}: total={rec['total']} calib={rec['calib_sec']}", flush=True)

    result: dict = {"pattern": [p[0] for p in pattern], "baseline_sha": BASELINE_SHA,
        "baseline_overridden": len(sys.argv) > 1,
        "head_sha": _head_sha()}
    allbest: dict[str, dict[str, float]] = {}
    for label in ("head", "baseline"):
        qbest: dict[str, float] = {}
        for rec in runs[label]:
            for q, t in rec["queries"].items():
                qbest[q] = min(qbest.get(q, float("inf")), t)
        allbest[label] = qbest
        result[label] = {
            "totals": [r["total"] for r in runs[label]],
            "calibs": [r["calib_sec"] for r in runs[label]],
            "queries_best": qbest,
        }
    # best_total over the SHARED query set only (r11 ADVICE): if the two
    # trees' headline lists ever diverge, summing each tree's own set would
    # silently skew head_over_baseline_pct with workload differences.
    shared_set = set(allbest["head"]) & set(allbest["baseline"])
    result["shared_n"] = len(shared_set)
    result["unshared"] = sorted(
        (set(allbest["head"]) | set(allbest["baseline"])) - shared_set
    )
    for label in ("head", "baseline"):
        result[label]["best_total"] = round(
            sum(t for q, t in allbest[label].items() if q in shared_set), 3
        )
    h, n = result["head"]["best_total"], result["baseline"]["best_total"]
    result["head_over_baseline_pct"] = round((h - n) / n * 100, 2)
    # Per-query deltas on the shared set, worst first, for bisect targeting.
    hq, nq = result["head"]["queries_best"], result["baseline"]["queries_best"]
    shared = sorted(set(hq) & set(nq), key=lambda q: -(hq[q] - nq[q]))
    result["worst_deltas"] = [
        {"q": q, "head": hq[q], "baseline": nq[q], "delta": round(hq[q] - nq[q], 3)}
        for q in shared[:15]
    ]
    with open(os.path.join(REPO, OUT_JSON), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("head_over_baseline_pct",)}, indent=1))
    print(f"head best_total={h}  baseline best_total={n}")


if __name__ == "__main__":
    main()
