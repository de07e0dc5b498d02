"""Rebuild ORACLE_FPS.json from GIT HISTORY — run-order independent.

Each query's fingerprint is the md5 of its oracle text AS OF THE DRIVER
COMMIT of that query's own LATEST CORRECTNESS row (the "round N:
verdict/..." commit only adds result files, so its oracle sources are
exactly the tree the driver tested). That is the faithful per-row
fingerprint: the file now records what the driver ACTUALLY verified, so
- running this script at any point in a session is safe (it never reads
  the working tree's oracle texts), closing the r8 ADVICE fragility
  where a refresh run AFTER an oracle edit silently erased the
  needs-recheck marker; and
- an oracle edited in round N but NOT driver-checked that round (it
  missed the 50-slot window) keeps the fingerprint of the text its last
  row really proved, so it still re-enters the window.

Mechanics: for every round r with a CORRECTNESS_r{r}.json, find the
commit that last touched that file, materialize it in a throwaway git
worktree, import the registry there in a subprocess, and dump
{name: md5(oracle)}. Then fps[q] = dump[latest_round[q]][q]. Queries
whose exact-round dump is unavailable are OMITTED (never-fingerprinted
=> they re-enter the driver window; falling back to a newer round could
mask an unverified oracle edit); queries with no driver row are omitted
(they are never-checked and windowed regardless).

Usage: python scripts/refresh_oracle_fps.py   (any time; idempotent)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DUMP_SNIPPET = (
    "import sys, json, hashlib; sys.path.insert(0, '.'); "
    "from crypto_trading_data_pipeline_spark.queries import REGISTRY; "
    "print(json.dumps({n: hashlib.md5(s.oracle.encode()).hexdigest() "
    "for n, s in REGISTRY.items() if s.oracle is not None}))"
)


def _latest_round_per_query() -> dict[str, int]:
    latest: dict[str, int] = {}
    import glob

    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
            rows = json.load(open(f))
        except (ValueError, IndexError, OSError, json.JSONDecodeError):
            continue
        for q in rows if isinstance(rows, dict) else []:
            latest[q] = max(latest.get(q, 0), rnd)
    return latest


def _driver_commit(rnd: int) -> str | None:
    rel = f"CORRECTNESS_r{rnd:02d}.json"
    out = subprocess.run(
        ["git", "log", "-n1", "--format=%H", "--", rel],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    sha = out.stdout.strip()
    return sha or None


def _fps_at_commit(sha: str) -> dict[str, str] | None:
    wt = tempfile.mkdtemp(prefix="oracle_fps_wt_")
    os.rmdir(wt)  # git worktree add wants to create it
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", "-q", wt, sha],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
        out = subprocess.run(
            [sys.executable, "-c", _DUMP_SNIPPET],
            cwd=wt,
            capture_output=True,
            text=True,
            timeout=300,
        )
        if out.returncode != 0:
            print(
                f"warn: registry import failed at {sha[:9]}: "
                f"{out.stderr.strip().splitlines()[-1] if out.stderr.strip() else '?'}",
                file=sys.stderr,
            )
            return None
        return json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    latest = _latest_round_per_query()
    rounds = sorted({r for r in latest.values()})
    dumps: dict[int, dict[str, str]] = {}
    for r in rounds:
        sha = _driver_commit(r)
        if sha is None:
            print(f"warn: no commit found for round {r}", file=sys.stderr)
            continue
        fps = _fps_at_commit(sha)
        if fps is not None:
            dumps[r] = fps

    fps_out: dict[str, str] = {}
    omitted = 0
    for q, r in sorted(latest.items()):
        # EXACT round only. Falling back to a newer round's tree is unsound:
        # if the oracle was edited after its last driver check, the newer
        # tree's text matches the working tree and the fingerprint would
        # silently erase the needs-recheck marker (r9 ADVICE). An omitted
        # query is treated as never-fingerprinted, so it re-enters the
        # driver window — the safe direction.
        if r in dumps and q in dumps[r]:
            fps_out[q] = dumps[r][q]
        else:
            omitted += 1

    out = os.path.join(REPO, "ORACLE_FPS.json")
    with open(out, "w") as f:
        json.dump(fps_out, f, indent=0, sort_keys=True)
    note = f" ({omitted} omitted: exact-round dump unavailable)" if omitted else ""
    print(f"wrote {out}: {len(fps_out)} fingerprints from git history{note}")
