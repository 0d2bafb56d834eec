"""Versioned parquet table — Delta-shaped semantics (atomic commits,
snapshot isolation, time travel, version diff) on plain parquet.

The reference's deltawriter appends every message to a Delta table and
reads it back (`/root/reference/deltawriter/delta_writer.py:81-98`); this
container has no delta-spark package, so `sources/readers.py::read_delta`
is import-gated. This module supplies the SEMANTICS on plain parquet so
the capability isn't hostage to a package: each write lands in its own
`v=N` directory and becomes visible only when its commit marker lands in
`_commits/` — the marker write is the atomic commit point (single-file
create, same scheme as streaming/commit.py). Readers union only
committed versions, so a crashed half-written version is invisible
forever (and its directory is ignored, never half-read).

All control-plane FS ops go through sources/fsutil.py (Hadoop FS), so the
table is object-store-correct; data moves only through ordinary parquet
scans/writes.

Scale notes: a snapshot is ONE multi-path parquet scan (file listing per
version dir; at thousands of versions, `compact()` folds history into a
single base version — the OPTIMIZE/checkpoint analogue). Version counts
here are like Delta's: bounded by append frequency, not data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rtdl_spark.sources import fsutil

_COMMITS = "_commits"


class VersionedTable:
    """An append/overwrite parquet table with time travel.

    - ``append(df)``: new version containing only the new rows.
    - ``overwrite(df)``: new BASE version; snapshots never look behind it.
    - ``snapshot(as_of=None)``: DataFrame of the table at a version.
    - ``diff(v_from, v_to, keys)``: keyed change set between snapshots
      (added/removed/changed rows via merge.snapshot_diff).
    - ``compact()``: fold all committed history into one base version.

    Single-writer contract (like a Delta table without a coordination
    service): version numbers are allocated as latest+1, so concurrent
    writers could collide; run writes from one job (e.g. a foreachBatch
    sink, which Structured Streaming already serializes).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        partition_by: list[str] | None = None,
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.partition_by = list(partition_by or [])

    # -- commit log ------------------------------------------------------
    def _marker(self, version: int, kind: str) -> str:
        return f"{self.root}/{_COMMITS}/{version:020d}.{kind}"

    def history(self) -> list[tuple[int, str]]:
        """Committed (version, kind) pairs, ascending."""
        out = []
        for name in fsutil.list_names(self.spark, f"{self.root}/{_COMMITS}"):
            v, kind = name.split(".", 1)
            out.append((int(v), kind))
        return sorted(out)

    def versions(self) -> list[int]:
        return [v for v, _ in self.history()]

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    # -- writes ----------------------------------------------------------
    def _write(self, df: DataFrame, kind: str) -> int:
        if "v" in df.columns:
            # 'v=' is the version partition directory; a data column named
            # 'v' would be silently swallowed by the partition layout and
            # dropped on read — refuse loudly instead
            raise ValueError(
                "column name 'v' is reserved by VersionedTable's version "
                "partitioning; rename it before writing"
            )
        latest = self.latest_version()
        version = 0 if latest is None else latest + 1
        writer = df.write.mode("overwrite")
        if self.partition_by:
            # partition layout inside every version dir: snapshot reads
            # keep static partition pruning (the filter reaches the scan
            # as a directory prune, version count notwithstanding)
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(f"{self.root}/v={version}")
        # data is fully on disk; the marker makes it visible (atomic
        # point). create-if-absent turns a writer race on the same
        # version number into an error instead of a silent clobber
        fsutil.touch_new(self.spark, self._marker(version, kind))
        return version

    def append(self, df: DataFrame) -> int:
        return self._write(df, "append")

    def overwrite(self, df: DataFrame) -> int:
        return self._write(df, "base")

    # -- reads -----------------------------------------------------------
    def _live_versions(self, as_of: int | None) -> list[int]:
        hist = [
            (v, kind) for v, kind in self.history()
            if as_of is None or v <= as_of
        ]
        live: list[int] = []
        for v, kind in hist:
            if kind == "base":
                live = [v]  # a base version supersedes all history
            else:
                live.append(v)
        return live

    def snapshot(
        self, as_of: int | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """The table as of ``as_of`` (default: latest). Uncommitted
        version directories are never read.

        ``merge_schema=True`` unions the schemas of every live version
        (drifted appends' new columns surface as nullables — the Delta
        mergeSchema read); the default reads with the newest file
        footer's schema, which is the footer-cheap path when versions
        agree."""
        live = self._live_versions(as_of)
        if not live:
            raise ValueError(f"no committed versions in {self.root}")
        # basePath makes v= (and any partition_by dirs) partition columns
        # of ONE multi-path scan — only live version dirs are listed, and
        # a partition_by filter still prunes directories inside them
        reader = self.spark.read.option("basePath", self.root)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(
            *[f"{self.root}/v={v}" for v in live]
        ).drop("v")

    def diff(self, v_from: int, v_to: int, keys: list[str]) -> DataFrame:
        from rtdl_spark.operators.merge import snapshot_diff

        return snapshot_diff(
            self.snapshot(as_of=v_from), self.snapshot(as_of=v_to), keys
        )

    def history_frame(self) -> DataFrame:
        """DESCRIBE HISTORY analogue: one row per committed version —
        kind, per-version file count / bytes / rows (from the _metadata
        hidden columns via profile.file_manifest, so it is object-store-
        correct and one column-pruned scan per version)."""
        from functools import reduce

        from pyspark.sql import functions as F

        from rtdl_spark.operators.profile import file_manifest

        frames = []
        for v, kind in self.history():
            man = file_manifest(self.spark, f"{self.root}/v={v}")
            frames.append(
                man.agg(
                    F.lit(v).alias("version"),
                    F.lit(kind).alias("kind"),
                    F.count(F.lit(1)).alias("n_files"),
                    F.sum("file_bytes").alias("bytes"),
                    F.sum("n_rows").alias("n_rows"),
                )
            )
        if not frames:
            return self.spark.createDataFrame(
                [], "version bigint, kind string, n_files bigint, "
                "bytes bigint, n_rows bigint"
            )
        return reduce(lambda a, b: a.unionByName(b), frames)

    # -- maintenance -----------------------------------------------------
    def compact(self) -> int:
        """Fold committed history into one base version (checkpoint).
        Old version dirs stay for time travel until vacuum()."""
        return self.overwrite(self.snapshot())

    def vacuum(self, keep_from: int | None = None) -> list[int]:
        """Drop version dirs (and markers) no snapshot at or after the
        latest base — or ``keep_from`` — can reach. Returns dropped
        versions. Time travel behind the cut stops working, like Delta's
        VACUUM."""
        hist = self.history()
        if keep_from is None:
            bases = [v for v, kind in hist if kind == "base"]
            if not bases:
                return []
            keep_from = bases[-1]
        dropped = []
        for v, kind in hist:
            if v < keep_from:
                fsutil.delete(self.spark, f"{self.root}/v={v}")
                fsutil.delete(self.spark, self._marker(v, kind))
                dropped.append(v)
        return dropped


def tag_version(table: "VersionedTable", name: str, version: int | None = None) -> int:
    """Name a committed version (a data release: 'train-2024-08'). Tags
    are immutable create-once markers like commits themselves — re-tagging
    a name errors instead of silently moving a release. Returns the
    tagged version."""
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]+", name):
        raise ValueError(f"invalid tag name: {name!r}")
    v = table.latest_version() if version is None else version
    if v is None or v not in table.versions():
        raise ValueError(f"cannot tag uncommitted version {v!r}")
    for entry in fsutil.list_names(table.spark, f"{table.root}/_tags"):
        if entry.rpartition(".")[0] == name:
            raise ValueError(f"tag {name!r} already exists (immutable)")
    fsutil.touch_new(table.spark, f"{table.root}/_tags/{name}.{v}")
    return v


def resolve_tag(table: "VersionedTable", name: str) -> int:
    """Tag name → version number (for snapshot(as_of=resolve_tag(...)))."""
    for entry in fsutil.list_names(table.spark, f"{table.root}/_tags"):
        tag, _, v = entry.rpartition(".")
        if tag == name:
            return int(v)
    raise KeyError(f"no tag {name!r} in {table.root}")
