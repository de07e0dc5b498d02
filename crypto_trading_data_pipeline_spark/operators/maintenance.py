"""Table-maintenance tooling: small-file compaction for parquet layouts.

The small-file problem is the operational dual of q_zorder_layout's
clustering concern: a streaming sink or over-parallel writer leaves
thousands of KB-sized part files, and at 100 TB the NameNode/listing
pressure and per-file open cost dominate scan time.

``operators/scale.py::compact_files`` already handles the ONE-SHOT case:
read the whole table, coalesce to ~target-sized files, atomic swap. That
is the right tool for a small table or a one-off repair — but at 100 TB a
single monolithic rewrite job is an all-or-nothing multi-hour gamble.
This module is the INCREMENTAL form, split the way a lakehouse table
service (Delta OPTIMIZE / Iceberg rewrite_data_files) splits it:

- ``compaction_plan``: METADATA-ONLY planning — deterministic first-fit-
  decreasing bin packing of part files into rewrite groups bounded by a
  target size. O(files log files) on the driver; at 100 TB the file
  listing is the table manifest, not the data.
- ``apply_compaction``: executes a plan by reading each group and writing
  it as one file. Groups are independent rewrite jobs — a real service
  runs them as separate (retryable, incremental) tasks, which is why the
  plan is surfaced as data instead of hidden inside one monolithic
  repartition(): a failed group leaves every other group's output valid.

Reference: n/a (capability extension — the reference's Spark job writes
through JDBC and never manages file layouts; SURVEY.md §2.6).
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class CompactionGroup:
    group_id: int
    files: tuple[str, ...]
    total_bytes: int


def list_part_files(table_dir: str) -> list[tuple[str, int]]:
    """(path, size) for every parquet part file under ``table_dir``,
    name-sorted so planning is deterministic across runs and hosts."""
    out = []
    for root, _dirs, files in os.walk(table_dir):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith("_"):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    out.sort()
    return out


def compaction_plan(
    files: list[tuple[str, int]], target_bytes: int
) -> list[CompactionGroup]:
    """First-fit-decreasing bin packing of (path, size) into groups whose
    total stays under ``target_bytes`` (a file larger than the target gets
    its own group — it is already compact). Deterministic: sizes
    descending, path ascending as the tiebreak, first-fit into the lowest
    group id. FFD guarantees <= (11/9)*OPT + 1 groups — near-minimal
    rewrite output without an exact solver."""
    order = sorted(files, key=lambda fs: (-fs[1], fs[0]))
    groups: list[list[tuple[str, int]]] = []
    totals: list[int] = []
    for path, size in order:
        placed = False
        for i, t in enumerate(totals):
            if t + size <= target_bytes:
                groups[i].append((path, size))
                totals[i] = t + size
                placed = True
                break
        if not placed:
            groups.append([(path, size)])
            totals.append(size)
    return [
        CompactionGroup(
            group_id=i,
            files=tuple(p for p, _ in g),
            total_bytes=totals[i],
        )
        for i, g in enumerate(groups)
    ]


def apply_compaction(spark, plan: list[CompactionGroup], out_dir: str) -> int:
    """Rewrite each planned group as ONE parquet file under ``out_dir``
    (out_dir/group=<id>/). Returns total rows written. Each group is an
    independent job: schema comes from the files themselves, coalesce(1)
    is safe because the group is target-size-bounded by construction."""
    total = 0
    for g in plan:
        df = spark.read.parquet(*g.files).coalesce(1)
        dst = os.path.join(out_dir, f"group={g.group_id}")
        df.write.mode("overwrite").parquet(dst)
        total += spark.read.parquet(dst).count()
    return total
