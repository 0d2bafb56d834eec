"""Streaming SOURCE over native Delta tables — `spark.readStream` tails
the commit log.

Round 5 gave the engine the Delta WRITE direction for streams
(streaming/jobs.py::stream_to_delta_table, SetTransaction exactly-once);
this module closes the READ direction: a Spark-4 Python Data Source
whose stream reader treats the transaction log itself as the offset
axis — one offset == one committed version, each micro-batch is exactly
the files ADDED by the commits in (start, end]. That is the same
contract delta-spark's streaming source implements:

- ``dataChange=false`` commits (OPTIMIZE / clustering rewrites) are
  SKIPPED — the flag exists in the protocol precisely so streaming
  readers don't re-emit rewritten rows;
- remove tombstones are ignored (appends-only streaming, like Delta's
  default; deletes/updates under a streaming reader need CDF, which is
  writer-v4 territory this engine refuses by name);
- a missing commit file inside the replay range raises loudly (a
  cleaned-up tail cannot be streamed, same as delta-spark);
- ``maxFilesPerTrigger`` (delta-spark's rate-limit option) bounds each
  micro-batch to at most N dataChange add files — a restart against a
  long backlog replays in bounded batches instead of one giant one.
  Offsets are commit-granular, so a single commit above the limit is
  admitted whole (the option's at-least-one guarantee). TRIGGER
  SEMANTICS, measured on this image: with a processingTime trigger the
  stream advances one bounded batch per tick until caught up; with
  Trigger.AvailableNow, Spark's wrapper for sources without native
  admission control captures latestOffset ONCE at start, so each RUN
  processes exactly one bounded batch and stops — the checkpoint
  advances, and repeated availableNow runs drain the backlog (pinned by
  test). Unbounded availableNow (no option) still means one
  full-catch-up batch, unchanged.

Execution shape: planning (offsets, commit parsing) is driver-side over
KB-scale JSON — the same work every Delta client does; reads yield
pyarrow RecordBatches straight from the data files (the Data Source
API's vectorized lane — no per-row Python), one InputPartition per
added file so executors scale with the commit's file count.

Scope, stated loudly: the Python Data Source runs outside the JVM, so
file access here is plain-filesystem (local/NFS paths; object stores
would plug fsspec into ``_open``/``_list``). On a cluster with
delta-spark installed, ``spark.readStream.format("delta")`` is the
production path; this source makes the same pipelines runnable with
zero extra packages.

Register + use::

    from rtdl_spark.sources.delta_stream_source import DeltaStreamDataSource
    spark.dataSource.register(DeltaStreamDataSource)
    stream = spark.readStream.format("rtdl_delta_stream") \
        .option("path", table_dir).load()
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_delta_log")


def _commit_versions(table_dir: str) -> list[int]:
    log = _log_dir(table_dir)
    if not os.path.isdir(log):
        return []
    out = []
    for n in os.listdir(log):
        stem, dot, ext = n.partition(".")
        if ext == "json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read_commit(table_dir: str, version: int) -> list[dict]:
    path = os.path.join(_log_dir(table_dir), f"{version:020d}.json")
    if not os.path.exists(path):
        raise ValueError(
            f"Delta commit {version} missing from {table_dir} — the log "
            "tail was cleaned up past the stream's offset; restart the "
            "stream from a fresh checkpoint"
        )
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _latest_meta(table_dir: str, upto: int) -> dict:
    """Latest metaData action at or below ``upto`` (JSON tail only —
    the streaming source requires the tail anyway)."""
    meta = None
    for v in _commit_versions(table_dir):
        if v > upto:
            break
        for action in _read_commit(table_dir, v):
            if "metaData" in action:
                meta = action["metaData"]
    if meta is None:
        raise ValueError(f"no Delta metaData found under {table_dir}")
    return meta


def _cm_info(meta: dict) -> dict:
    """Column-mapping facts the Arrow read lane needs, JSON-safe:
    {"mode", "phys": {logical: physicalName}} for the TOP-LEVEL fields
    (nested struct children are resolved POSITIONALLY — the protocol
    preserves field order between logical and physical schemas)."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode not in ("none", "name", "id"):
        raise ValueError(
            f"Delta column mapping mode {mode!r} unsupported by the "
            "streaming source"
        )
    fields = json.loads(meta["schemaString"]).get("fields") or []
    phys = {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in fields
    }
    ids = {
        f["name"]: (f.get("metadata") or {}).get("delta.columnMapping.id")
        for f in fields
    }
    return {"mode": mode, "phys": phys, "ids": ids}


def _latest_schema(table_dir: str, upto: int) -> StructType:
    meta = _latest_meta(table_dir, upto)
    _cm_info(meta)  # refuse unknown modes loudly at schema time
    return StructType.fromJson(json.loads(meta["schemaString"]))


def _relabel(arr, ttype):
    """Recursively align a physical Arrow array to the LOGICAL field
    type: struct children are renamed/realigned positionally (schema
    evolution may leave the file's struct SHORTER — missing children
    null-fill), everything else casts. Lists/maps of structs under
    column mapping are refused by name rather than mislabeled."""
    import pyarrow as pa

    if pa.types.is_struct(ttype):
        if not pa.types.is_struct(arr.type):
            return arr.cast(ttype)
        kids = []
        for i in range(ttype.num_fields):
            tfield = ttype.field(i)
            if i < arr.type.num_fields:
                kids.append(_relabel(arr.field(i), tfield.type))
            else:
                kids.append(pa.nulls(len(arr), tfield.type))
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(
            kids,
            fields=[ttype.field(i) for i in range(ttype.num_fields)],
            mask=mask,
        )
    if (
        pa.types.is_list(ttype) or pa.types.is_large_list(ttype)
    ) and pa.types.is_struct(ttype.value_type):
        raise ValueError(
            "list-of-struct columns under Delta column mapping are not "
            "supported by the streaming source (use the batch reader)"
        )
    if pa.types.is_map(ttype) and pa.types.is_struct(ttype.item_type):
        raise ValueError(
            "map-of-struct columns under Delta column mapping are not "
            "supported by the streaming source (use the batch reader)"
        )
    return arr.cast(ttype)


class _AddFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        partition_values: dict,
        schema_json: str,
        part_cols: list[str],
        cm_json: str = "{}",
    ):
        self.path = path
        self.partition_values = partition_values
        self.schema_json = schema_json
        self.part_cols = part_cols
        self.cm_json = cm_json


class _DeltaStreamReader(DataSourceStreamReader):
    """Offsets are commit versions: {"version": N} = everything through
    commit N has been emitted."""

    def __init__(self, schema: StructType, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("rtdl_delta_stream requires .option('path', ...)")
        self.schema = schema
        self.starting_version = options.get(
            "startingVersion", options.get("startingversion")
        )
        mft = options.get(
            "maxFilesPerTrigger", options.get("maxfilespertrigger")
        )
        self.max_files = int(mft) if mft is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        # last end version this reader has planned/committed — the base
        # the NEXT bounded latestOffset advances from (None until the
        # engine reveals the stream's position via initialOffset /
        # partitions / commit)
        self._planned_end: int | None = None

    def initialOffset(self):
        """Default: replay from version 0 (full history). With
        .option("startingVersion", N) the stream begins AT commit N;
        "latest" streams only commits after the current tip — the option
        a VACUUMed table needs, since its early add files no longer
        exist (same semantics and same reason as delta-spark's)."""
        sv = self.starting_version
        if sv is None:
            off = {"version": -1}
        elif str(sv).lower() == "latest":
            versions = _commit_versions(self.table_dir)
            off = {"version": versions[-1] if versions else -1}
        else:
            off = {"version": int(sv) - 1}
        self._planned_end = off["version"]
        return off

    def _bounded_end(self, base: int) -> int:
        """The furthest commit version a single micro-batch may advance
        to from ``base``: the tip, or — with maxFilesPerTrigger — the
        last version keeping the batch's dataChange add-file count within
        the limit. Offsets are commit-granular, so one commit larger than
        the limit is still admitted whole (delta-spark's option has the
        same at-least-one guarantee); commits with no dataChange adds
        (OPTIMIZE, delete-only) are free to cross."""
        versions = [v for v in _commit_versions(self.table_dir) if v > base]
        if not versions:
            return base
        if self.max_files is None:
            return versions[-1]
        total, end = 0, base
        for v in versions:
            n = sum(
                1
                for action in _read_commit(self.table_dir, v)
                if "add" in action
                and action["add"].get("dataChange", True)
            )
            if end > base and total + n > self.max_files:
                break
            total += n
            end = v
            if total >= self.max_files:
                break
        return end

    def latestOffset(self):
        """With maxFilesPerTrigger, a restart against a long backlog no
        longer becomes ONE giant micro-batch: each trigger advances the
        offset a bounded number of files forward. Position comes from
        the engine's own calls (initialOffset / partitions / commit); if
        a restarted reader is asked for latestOffset before either (tail
        fully committed at shutdown), the first bounded answer may land
        behind the checkpointed start — Spark then runs one empty batch,
        partitions() re-anchors the position, and bounding resumes."""
        if self._planned_end is None:
            self._planned_end = int(self.initialOffset()["version"])
        end = self._bounded_end(self._planned_end)
        self._planned_end = end
        return {"version": end}

    def partitions(self, start, end):
        lo, hi = int(start["version"]), int(end["version"])
        self._planned_end = max(self._planned_end or -1, lo, hi)
        parts: list[_AddFilePartition] = []
        schema_json = self.schema.json()
        # partition columns + column-mapping facts from the latest
        # metaData ≤ hi (partitionValues keys are PHYSICAL under CM)
        if hi >= 0:
            meta = _latest_meta(self.table_dir, hi)
            part_cols = list(meta.get("partitionColumns") or [])
            cm_json = json.dumps(_cm_info(meta))
        else:
            part_cols, cm_json = [], "{}"
        for v in range(lo + 1, hi + 1):
            for action in _read_commit(self.table_dir, v):
                if "add" not in action:
                    continue
                a = action["add"]
                if not a.get("dataChange", True):
                    continue  # OPTIMIZE rewrites: already emitted rows
                import urllib.parse

                parts.append(
                    _AddFilePartition(
                        os.path.join(
                            self.table_dir,
                            urllib.parse.unquote(a["path"]),
                        ),
                        a.get("partitionValues") or {},
                        schema_json,
                        part_cols,
                        cm_json,
                    )
                )
        return parts or [
            # the API requires ≥1 partition; an empty range yields none
            _AddFilePartition("", {}, schema_json, part_cols, cm_json)
        ]

    def read(self, partition: _AddFilePartition) -> Iterator:
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        schema = StructType.fromJson(json.loads(partition.schema_json))
        arrow_schema = to_arrow_schema(schema)
        cm = json.loads(partition.cm_json or "{}")
        mode = cm.get("mode", "none")
        phys = cm.get("phys") or {}
        ids = cm.get("ids") or {}
        pf = pq.ParquetFile(partition.path)
        # under id-mode the file's column NAMES are irrelevant — build a
        # field-id → physical-name map from the parquet arrow schema
        id_to_name: dict[int, str] = {}
        if mode == "id":
            for f in pf.schema_arrow:
                md = f.metadata or {}
                fid = md.get(b"PARQUET:field_id")
                if fid is not None:
                    id_to_name[int(fid)] = f.name
        for batch in pf.iter_batches():
            n = batch.num_rows
            cols = []
            for field in arrow_schema:
                name = field.name
                if name in partition.part_cols:
                    # partitionValues keys are PHYSICAL under CM
                    pv_key = phys.get(name, name) if mode != "none" else name
                    raw = partition.partition_values.get(pv_key)
                    if raw is None or raw == _HIVE_NULL:
                        cols.append(pa.nulls(n, type=field.type))
                    else:
                        cols.append(
                            pa.array([raw] * n, type=pa.string()).cast(
                                field.type
                            )
                        )
                    continue
                if mode == "name":
                    src = phys.get(name, name)
                elif mode == "id":
                    src = id_to_name.get(int(ids.get(name) or -1), "")
                else:
                    src = name
                if src and src in batch.schema.names:
                    cols.append(
                        _relabel(batch.column(src), field.type)
                    )
                else:
                    # schema evolution: file predates the column
                    cols.append(pa.nulls(n, type=field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)

    def commit(self, end):
        self._planned_end = max(
            self._planned_end or -1, int(end["version"])
        )

    def stop(self):
        pass


class DeltaStreamDataSource(DataSource):
    """spark.readStream.format("rtdl_delta_stream").option("path", dir)"""

    @classmethod
    def name(cls):
        return "rtdl_delta_stream"

    def schema(self):
        versions = _commit_versions(self.options["path"])
        if not versions:
            raise ValueError(
                f"no Delta log found under {self.options.get('path')!r}"
            )
        return _latest_schema(self.options["path"], versions[-1])

    def streamReader(self, schema):
        return _DeltaStreamReader(schema, self.options)
