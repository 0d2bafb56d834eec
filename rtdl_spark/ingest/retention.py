"""Partition retention/TTL — expire old time buckets from the lake.

The missing half of lake maintenance next to compaction: training-data and
event lakes are almost always retention-bound ("keep 90 days"), and the
partition layout this engine writes (``rtdl_table=<t>/rtdl_bucket=<b>``,
real columns — A9 redesign) makes expiry a metadata-cheap operation:
whole-partition directory drops, no row-level rewrite, no table scan.

The reference has no retention story at all (files accrete forever,
one per message — ingester.go:551-565); in Delta this is
``DELETE WHERE`` + ``VACUUM``, and this module is the plain-parquet
equivalent with the same dry-run-first ergonomics.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from rtdl_spark.ingest.pipeline import BUCKET_COL, TABLE_COL


@dataclass
class ExpiredPartition:
    table: str
    bucket: str
    path: str
    n_files: int
    bytes: int


def find_expired(
    root: str, cutoff_bucket: str, table: str | None = None
) -> list[ExpiredPartition]:
    """Partitions whose bucket sorts strictly below ``cutoff_bucket``.

    All bucket grains (SURVEY A9) are zero-padded except weekly/quarterly's
    final component, so lexicographic order equals time order within one
    grain — the same property partition pruning relies on. Callers pass a
    cutoff in the stream's own grain (e.g. '2024-01-15' for daily).
    """
    out: list[ExpiredPartition] = []
    for tdir in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if not tdir.startswith(f"{TABLE_COL}="):
            continue
        tname = tdir.split("=", 1)[1]
        if table is not None and tname != table:
            continue
        tpath = os.path.join(root, tdir)
        for bdir in sorted(os.listdir(tpath)):
            if not bdir.startswith(f"{BUCKET_COL}="):
                continue
            bucket = bdir.split("=", 1)[1]
            if bucket >= cutoff_bucket:
                continue
            bpath = os.path.join(tpath, bdir)
            files = [
                os.path.join(dp, f)
                for dp, _d, fs in os.walk(bpath)
                for f in fs
                if f.endswith(".parquet")
            ]
            out.append(
                ExpiredPartition(
                    table=tname,
                    bucket=bucket,
                    path=bpath,
                    n_files=len(files),
                    bytes=sum(os.path.getsize(f) for f in files),
                )
            )
    return out


def expire_partitions(
    root: str,
    cutoff_bucket: str,
    table: str | None = None,
    dry_run: bool = True,
) -> list[ExpiredPartition]:
    """Drop (or, with dry_run=True, just report) partitions older than the
    cutoff. Directory-level deletes — O(partitions), never O(rows). Returns
    the affected partitions either way, so callers log what a run would do
    before doing it."""
    expired = find_expired(root, cutoff_bucket, table)
    if not dry_run:
        for p in expired:
            shutil.rmtree(p.path, ignore_errors=True)
    return expired
