"""Same-box streaming-throughput A/B: a committed BASELINE tree vs HEAD.

Baseline defaults to the r10 round-end commit (96e2d8e) and is overridable
via argv[1]; the record labels runs "baseline"/"head" and stores
baseline_sha + baseline_overridden so an overridden adjudication cannot
read as if it were measured against r10 (r12 ADVICE). Origin: VERDICT r11 #1.

The r11 bench flipped ``streaming_regression: true`` (-5.8% normalized after
r10's -4.3%; ~-10% cumulative since r9). Static analysis says the entire
bench_streaming code closure — streaming/job.py, sources.py, schemas.py,
operators/candles.py, io.py, session.py AND the bench_streaming harness
itself — is byte-identical between the r10 tree and HEAD (the only
streaming-adjacent r11 change was streaming/stateful.py's max-fold fix,
which bench_streaming never imports). This runs the decisive measurement
anyway: both trees, same box, same session, interleaved
head/r10/r10/head/head/r10, fresh JVM per run, each run internally
best-of-3 drains. Identical code measured minutes apart bounds the box's
own run-to-run noise — the yardstick the -5.8% round-over-round delta must
clear before it can mean anything.

Before launching, the parent ASSERTS the two trees' bench_streaming ASTs
are identical (same guarantee ab_bench.py provides by sharing ab_runner).

Writes SCALE_AB_STREAM.json at the repo root.
"""

from __future__ import annotations

import ast
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


def _fn_ast(path: str, name: str) -> str | None:
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            return ast.dump(node)
    return None


def one_run(tree: str, out: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ab_stream_runner.py"), tree, out],
        check=True,
        env=env,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ensure_worktree()
    # Harness-identity guarantee: a measurement difference must not be
    # explainable by harness drift between the trees.
    a = _fn_ast(os.path.join(REPO, "bench.py"), "bench_streaming")
    b = _fn_ast(os.path.join(WT, "bench.py"), "bench_streaming")
    assert a is not None and a == b, "bench_streaming harness differs between trees"

    tmp = os.path.join(REPO, ".worktrees", "ab_stream_out")
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
            f"[ab-stream] run {i} {label}: rows/s={rec['streaming_rows_per_sec']} "
            f"wall={rec['streaming_wall_sec']} calib={rec['calib_sec']}",
            flush=True,
        )

    result: dict = {"pattern": [p[0] for p in pattern], "baseline_sha": BASELINE_SHA,
        "baseline_overridden": len(sys.argv) > 1,
        "head_sha": _head_sha()}
    for label in ("head", "baseline"):
        rps = [r["streaming_rows_per_sec"] for r in runs[label]]
        result[label] = {
            "rows_per_sec": rps,
            "best_rows_per_sec": max(rps),
            "walls": [r["streaming_wall_sec"] for r in runs[label]],
            "calibs": [r["calib_sec"] for r in runs[label]],
        }
    h = result["head"]["best_rows_per_sec"]
    r = result["baseline"]["best_rows_per_sec"]
    result["head_over_baseline_pct"] = round((h - r) / r * 100, 2)
    with open(os.path.join(REPO, "SCALE_AB_STREAM.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(f"head best rows/s={h}  baseline best rows/s={r}  delta={result['head_over_baseline_pct']}%")


if __name__ == "__main__":
    main()
