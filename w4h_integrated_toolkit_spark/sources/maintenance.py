"""Table-maintenance operations: the small-files problem.

Every incremental pipeline (streaming sinks, per-batch appends, the
reference's tick-by-tick inserts) accretes many small files; at fleet
scale a table of million-row-but-kilobyte files makes every scan pay a
per-file open/footer cost that dwarfs the data read. ``compact_parquet``
is the standard maintenance pass: rewrite a parquet directory into
size-targeted files and report what changed.

Without a transaction log (Delta/Iceberg) the directory swap is not
atomic for concurrent readers — same caveat as ``etl.merge_upsert``;
swap in a log-backed writer for serving tables, the sizing logic is
identical.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

__all__ = ["compact_parquet", "parquet_file_stats"]


def parquet_file_stats(path: str) -> dict:
    """File count / byte totals of a parquet directory (data files only —
    _SUCCESS and checksums excluded)."""
    files = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    return {
        "n_files": len(files),
        "total_bytes": sum(os.path.getsize(f) for f in files),
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory into ``ceil(total/target)`` files.

    Sizing uses the CURRENT on-disk bytes (already-encoded parquet, so
    the post-compaction files land near the target without sampling
    decode ratios). The rewrite is a single repartition — one shuffle,
    no ordering assumptions; for z-ordered or sorted tables use
    ``catalog.write_zordered`` / ``write_sorted`` instead, which keep
    their clustering while compacting.

    Returns a report dict: files/bytes before and after, and the target
    file count. The swap is rename-based (write to a sibling tmp dir,
    move the old dir away, move tmp in, drop the old). A crash between
    the two renames leaves the data parked in ``.__compact_old__`` with
    no directory at ``path``; on entry that state is detected and the
    old directory restored before proceeding, so a re-run after any
    crash point completes the compaction. NOT atomic for concurrent
    readers (see module note). Local-filesystem paths only — the rename
    swap cannot span remote URI schemes, so those are rejected up front.
    """
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be positive, got {target_file_bytes}")
    if "://" in path:
        raise ValueError(
            f"compact_parquet swaps directories with os.rename and only "
            f"supports plain local paths; got URI {path!r}. Use a "
            f"log-backed table format (Delta/Iceberg) for remote stores."
        )
    base = path.rstrip("/")
    stale_old = base + ".__compact_old__"
    # crash recovery: a previous run that died between its two renames
    # left the original data in .__compact_old__ and nothing at `path`.
    if os.path.isdir(stale_old) and not os.path.exists(base):
        os.rename(stale_old, base)
    before = parquet_file_stats(path)
    if before["n_files"] == 0:
        raise ValueError(f"no parquet files under {path}")
    n_target = max(1, math.ceil(before["total_bytes"] / target_file_bytes))

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    spark.read.parquet(path).repartition(n_target).write.parquet(tmp)
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old)

    after = parquet_file_stats(path)
    return {
        "files_before": before["n_files"],
        "files_after": after["n_files"],
        "bytes_before": before["total_bytes"],
        "bytes_after": after["total_bytes"],
        "target_files": n_target,
    }
