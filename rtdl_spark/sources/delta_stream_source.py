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
  default); a commit with dataChange removes fails the stream by
  default, with skipChangeCommits / ignoreDeletes / ignoreChanges as
  the delta-spark-parity escapes; an EMITTED add that carries a
  deletion vector (ignoreChanges re-emission, RESTORE re-add) yields
  its VISIBLE rows — the DV mask is applied worker-side on the
  physical row index as batches stream through the Arrow lane;
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

# MEASURED runner protocol (this Spark build, traced per-PID): the
# FIRST engine call on the stream's reader is latestOffset — before
# initialOffset on a fresh start (initialOffset arrives only after,
# for batch 0's start), and with NO anchoring call at all on a restart
# whose last batch was fully committed (a crash between the commit-log
# write and the next offset-log write; graceful stops leave a trailing
# uncommitted offset entry, which the engine replays via partitions()
# first). latestOffset receives no start offset in the Python runner
# protocol (LATEST_OFFSET_FUNC_ID carries no payload), so the reader
# cannot tell those two cases apart — see latestOffset for the
# consequence.


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
    {"mode", "fields": <schemaString fields>}. The FULL field JSON rides
    along (physicalName / columnMapping.id metadata at every nesting
    level) so the read lane resolves nested struct children by PHYSICAL
    NAME (name mode) or FIELD ID (id mode) — never positionally: name
    mode exists precisely to support DROP/RENAME COLUMN, after which old
    files' struct children no longer line up by position."""
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode not in ("none", "name", "id"):
        raise ValueError(
            f"Delta column mapping mode {mode!r} unsupported by the "
            "streaming source"
        )
    fields = json.loads(meta["schemaString"]).get("fields") or []
    return {"mode": mode, "fields": fields}


def _logical_key(fjson: dict, mode: str):
    """How a LOGICAL field addresses its column in the file: physical
    name under name mode (falling back to the logical name — the
    protocol requires the metadata when CM is on), columnMapping.id
    under id mode (required — refuse rather than guess), plain name
    otherwise."""
    md = fjson.get("metadata") or {}
    if mode == "id":
        fid = md.get("delta.columnMapping.id")
        if fid is None:
            raise ValueError(
                f"id-mode column mapping but field {fjson['name']!r} "
                "carries no delta.columnMapping.id — refusing to guess"
            )
        return int(fid)
    if mode == "name":
        return md.get("delta.columnMapping.physicalName", fjson["name"])
    return fjson["name"]


def _file_key(arrow_field, mode: str):
    """The matching key of a FILE-side arrow field: PARQUET:field_id
    metadata under id mode (None when the file carries no id — such a
    column can never match and is treated as dropped), the parquet
    column name otherwise."""
    if mode == "id":
        md = arrow_field.metadata or {}
        fid = md.get(b"PARQUET:field_id")
        return int(fid) if fid is not None else None
    return arrow_field.name


def _latest_schema(table_dir: str, upto: int) -> StructType:
    meta = _latest_meta(table_dir, upto)
    _cm_info(meta)  # refuse unknown modes loudly at schema time
    return StructType.fromJson(json.loads(meta["schemaString"]))


def _align(arr, tjson, ttype, mode: str, n: int):
    """Recursively align a physical Arrow array to the LOGICAL field
    type. ``arr`` may be None (column absent from the file — schema
    evolution added it later): null-fill. Struct children are matched by
    PHYSICAL NAME (name/none modes) or FIELD ID (id mode) against the
    logical schema JSON ``tjson`` — file children matching no logical
    child are DROPPED columns and skipped; logical children matching no
    file child null-fill. Lists and maps recurse through their element/
    entry arrays (offsets and validity preserved — the flattened child
    arrays keep the parent's indexing, so realignment never moves rows).

    Positional matching is deliberately absent: name-mode CM exists to
    support DROP/RENAME COLUMN, after which old files' struct children
    no longer line up by position — mislabeling them would silently
    attribute one field's values to another."""
    import pyarrow as pa

    if arr is None:
        return pa.nulls(n, ttype)
    if pa.types.is_struct(ttype):
        if not pa.types.is_struct(arr.type):
            return arr.cast(ttype)
        kids_json = (tjson or {}).get("fields") or []
        if len(kids_json) != ttype.num_fields:
            raise ValueError(
                "Delta schemaString struct does not match the logical "
                "read schema — refusing to align struct children"
            )
        # flatten(): children with the parent's slice offset applied and
        # parent nulls merged in (the mask below re-asserts parent nulls)
        flat = arr.flatten()
        by_key = {}
        for i in range(arr.type.num_fields):
            k = _file_key(arr.type.field(i), mode)
            if k is not None:
                by_key[k] = flat[i]
        kids = []
        for i, fj in enumerate(kids_json):
            child = by_key.get(_logical_key(fj, mode))
            kids.append(
                _align(child, fj.get("type"), ttype.field(i).type, mode,
                       len(arr))
            )
        mask = arr.is_null() if arr.null_count else None
        return pa.StructArray.from_arrays(
            kids,
            fields=[ttype.field(i) for i in range(ttype.num_fields)],
            mask=mask,
        )
    if pa.types.is_list(ttype) or pa.types.is_large_list(ttype):
        if not (
            pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
        ):
            return arr.cast(ttype)
        ejson = (tjson or {}).get("elementType")
        values = _align(
            arr.values, ejson, ttype.value_type, mode, len(arr.values)
        )
        cls = (
            pa.LargeListArray
            if pa.types.is_large_list(ttype)
            else pa.ListArray
        )
        offsets = arr.offsets
        if pa.types.is_large_list(ttype) != pa.types.is_large_list(arr.type):
            offsets = offsets.cast(
                pa.int64() if pa.types.is_large_list(ttype) else pa.int32()
            )
        return cls.from_arrays(
            offsets, values,
            mask=arr.is_null() if arr.null_count else None,
        )
    if pa.types.is_map(ttype):
        if not pa.types.is_map(arr.type):
            return arr.cast(ttype)
        kjson = (tjson or {}).get("keyType")
        vjson = (tjson or {}).get("valueType")
        keys = _align(arr.keys, kjson, ttype.key_type, mode, len(arr.keys))
        items = _align(
            arr.items, vjson, ttype.item_type, mode, len(arr.items)
        )
        offsets = arr.offsets
        if arr.null_count:
            # MapArray.from_arrays has no mask kwarg: encode validity as
            # NULL OFFSETS instead (pyarrow fills them from the next
            # valid offset — exact for parquet-sourced arrays, whose
            # null slots always carry empty ranges)
            import pyarrow.compute as pc

            full_mask = pa.concat_arrays(
                [arr.is_null(), pa.array([False])]
            )
            offsets = pc.if_else(
                full_mask,
                pa.nulls(len(offsets), offsets.type),
                offsets,
            )
        return pa.MapArray.from_arrays(offsets, keys, items).cast(ttype)
    return arr.cast(ttype)


class _AddFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        partition_values: dict,
        schema_json: str,
        part_cols: list[str],
        cm_json: str = "{}",
        dv_json: str = "null",
        table_dir: str = "",
    ):
        self.path = path
        self.partition_values = partition_values
        self.schema_json = schema_json
        self.part_cols = part_cols
        self.cm_json = cm_json
        # deletion-vector descriptor (JSON or "null"): emitted rows are
        # the file MINUS the mask, applied worker-side on the physical
        # row index while batches stream through the Arrow lane
        self.dv_json = dv_json
        self.table_dir = table_dir
        # readChangeFeed facts (JSON or "null"): {"ct": change type or
        # None when the file carries _change_type itself, "v": commit
        # version, "ts": commit timestamp ms (ICT preferred)}
        self.cdf_json = "null"
        # readChangeFeed DV-derived selection (JSON or "null"):
        # {"a": desc|null, "b": desc|null, "op": "diff"|"vis"} — rows
        # are filtered to the mask-diff change set (diff: in a's mask
        # and not in b's; vis: not in b's) instead of the plain DV
        # subtraction
        self.cdf_sel = "null"


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
        mbt = options.get(
            "maxBytesPerTrigger", options.get("maxbytespertrigger")
        )
        self.max_bytes = int(mbt) if mbt is not None else None
        if self.max_bytes is not None and self.max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")

        def _flag(*names):
            for n in names:
                v = options.get(n)
                if v is not None:
                    return str(v).lower() == "true"
            return False

        # delta-spark's change-commit posture: a commit that REMOVES
        # data (DELETE/UPDATE/MERGE/RESTORE rewrites) breaks the
        # append-only stream contract — fail by default,
        # skipChangeCommits drops the commit entirely, ignoreChanges
        # re-emits its rewritten files (documented duplicates),
        # ignoreDeletes tolerates DELETE-ONLY commits (removes without
        # adds — partition drops) while still failing on rewrites
        self.skip_change_commits = _flag(
            "skipChangeCommits", "skipchangecommits"
        )
        self.ignore_changes = _flag("ignoreChanges", "ignorechanges")
        self.ignore_deletes = _flag("ignoreDeletes", "ignoredeletes")
        # readChangeFeed: emit CHANGE ROWS (table columns +
        # _change_type/_commit_version/_commit_timestamp) instead of
        # appended data — cdc-carrying commits read their _change_data
        # files, others derive inserts from dataChange adds and deletes
        # from dataChange removes (the batch CDF reader's contract,
        # delta-spark's readChangeFeed option). The change-commit
        # fail/skip gates don't apply: emitting changes is the point.
        self.read_changes = _flag("readChangeFeed", "readchangefeed")
        # readChangeFeed strictness: a commit made while
        # delta.enableChangeDataFeed was NOT 'true' recorded no cdc
        # actions, so a rewrite commit (DELETE/UPDATE/MERGE) in that
        # range would derive every old-file row as 'delete' and every
        # new-file row as 'insert' — silently over-reporting unchanged
        # rows. delta-spark refuses such ranges; so do we, unless the
        # caller explicitly opts into derivation for the insert/
        # full-delete commits it knows are safe
        self.allow_unrecorded = _flag(
            "allowUnrecordedChanges", "allowunrecordedchanges"
        )
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
        exist (same semantics and same reason as delta-spark's).

        The engine calls this only when the query's offset log is empty
        (fresh start) — and AFTER the first latestOffset, per the
        measured runner order (see the module note), which is why
        latestOffset cannot rely on it for anchoring."""
        off = {"version": self._initial_version()}
        self._planned_end = off["version"]
        return off

    def _initial_version(self) -> int:
        sv = self.starting_version
        if sv is None:
            return -1
        if str(sv).lower() == "latest":
            versions = _commit_versions(self.table_dir)
            return versions[-1] if versions else -1
        return int(sv) - 1

    def _bounded_end(self, base: int) -> int:
        """The furthest commit version a single micro-batch may advance
        to from ``base``: the tip, or — with maxFilesPerTrigger /
        maxBytesPerTrigger (r8) — the last version keeping the batch's
        dataChange add-file count / byte total within the limits
        (either limit being hit stops admission, like delta-spark when
        both are set). Offsets are commit-granular, so one commit
        larger than a limit is still admitted whole (delta-spark's
        at-least-one guarantee); commits with no dataChange adds
        (OPTIMIZE, delete-only) are free to cross."""
        versions = [v for v in _commit_versions(self.table_dir) if v > base]
        if not versions:
            return base
        if self.max_files is None and self.max_bytes is None:
            return versions[-1]
        total, total_b, end = 0, 0, base
        for v in versions:
            n = nb = 0
            for action in _read_commit(self.table_dir, v):
                if "add" in action and action["add"].get(
                    "dataChange", True
                ):
                    n += 1
                    nb += int(action["add"].get("size") or 0)
            if end > base and (
                (self.max_files is not None
                 and total + n > self.max_files)
                or (self.max_bytes is not None
                    and total_b + nb > self.max_bytes)
            ):
                break
            total += n
            total_b += nb
            end = v
            if (
                self.max_files is not None and total >= self.max_files
            ) or (
                self.max_bytes is not None and total_b >= self.max_bytes
            ):
                break
        return end

    def latestOffset(self):
        """With maxFilesPerTrigger, a restart against a long backlog no
        longer becomes ONE giant micro-batch: each trigger advances the
        offset a bounded number of files forward. Position comes from
        the engine's own calls (initialOffset / partitions / commit).

        NEVER emit an offset below a position already implied by the
        engine: a restarted reader whose last batch was fully committed
        (a crash between the commit-log write and the next offset-log
        write) is asked for latestOffset BEFORE any anchoring call —
        _planned_end is None and the checkpointed position is unknown
        here. Bounding from initialOffset would then return an offset
        BEHIND the checkpointed start, which Spark writes into its
        offset log and uses as the NEXT batch's start — replaying
        already-delivered commits (duplicate delivery). The unanchored
        answer is therefore the UNBOUNDED tip: the tip is ≥ every
        position the engine can hold, so it is the only answer that
        can never regress; bounding resumes once partitions()/commit()
        anchors the position.

        Known cost, inherent to the Python runner protocol: a FRESH
        start is indistinguishable from that crash-shaped restart (the
        first engine call is latestOffset in both — see the module
        note), so the initial-snapshot batch of a brand-new query is
        NOT bounded by maxFilesPerTrigger; every later batch is.
        delta-spark can bound batch 0 because its engine-side
        latestOffset(start, limit) RECEIVES the start; this API does
        not — correctness (no duplicate delivery) wins over first-batch
        admission control."""
        if self._planned_end is None:
            base = self._initial_version()
            versions = _commit_versions(self.table_dir)
            end = max(versions[-1] if versions else base, base)
            self._planned_end = end
            return {"version": end}
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
        # readChangeFeed: track whether delta.enableChangeDataFeed was
        # 'true' at each commit (latest metaData <= v) — derivation from
        # add/remove is only trustworthy for commits made under the
        # feed (see allow_unrecorded above)
        cdf_on = False
        if self.read_changes and lo >= 0:
            try:
                cdf_on = (
                    _latest_meta(self.table_dir, lo).get("configuration")
                    or {}
                ).get("delta.enableChangeDataFeed") == "true"
            except ValueError:
                cdf_on = False
        for v in range(lo + 1, hi + 1):
            actions = _read_commit(self.table_dir, v)
            if self.read_changes:
                for a in actions:
                    if "metaData" in a:
                        cdf_on = (
                            a["metaData"].get("configuration") or {}
                        ).get("delta.enableChangeDataFeed") == "true"
                self._plan_change_commit(
                    v, actions, parts, schema_json, part_cols, cm_json,
                    cdf_on,
                )
                continue
            commit_adds = [
                a["add"]
                for a in actions
                if "add" in a and a["add"].get("dataChange", True)
            ]
            # change commit: data was REMOVED (DELETE/UPDATE/MERGE/
            # RESTORE) — already-emitted rows can no longer be retracted
            # downstream. delta-spark's posture, mirrored: fail loudly
            # by default; skipChangeCommits drops the commit;
            # ignoreChanges re-emits the rewritten files (duplicates,
            # the caller asked for them)
            if any(
                "remove" in a and a["remove"].get("dataChange", True)
                for a in actions
            ):
                if self.skip_change_commits:
                    continue
                if self.ignore_deletes and not commit_adds:
                    continue  # delete-only commit (partition drop)
                if not self.ignore_changes:
                    raise ValueError(
                        f"Delta commit {v} changes existing data "
                        "(dataChange remove) — a streaming source cannot "
                        "retract already-emitted rows. Set option "
                        "skipChangeCommits=true to drop such commits, "
                        "ignoreDeletes=true to tolerate delete-only "
                        "commits, or ignoreChanges=true to re-emit "
                        "rewritten files (at-least-once duplicates)"
                    )
            for a in commit_adds:
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
                        # a DV-carrying add (re-emitted under
                        # ignoreChanges, or a RESTORE re-add) yields its
                        # VISIBLE rows — the mask applies at read time
                        json.dumps(a.get("deletionVector")),
                        self.table_dir,
                    )
                )
        return parts or [
            # the API requires ≥1 partition; an empty range yields none
            _AddFilePartition("", {}, schema_json, part_cols, cm_json)
        ]

    def _plan_change_commit(
        self, v, actions, parts, schema_json, part_cols, cm_json,
        cdf_on=True,
    ):
        """readChangeFeed planning for ONE commit: cdc actions describe
        it exclusively (change type read from the files); otherwise
        dataChange adds derive as inserts and dataChange removes as
        deletes (the removed file must still exist — a vacuumed range
        refuses loudly, like the batch CDF reader). Same-path
        remove+add pairs (a DV attach/detach — DV DELETE without CDF,
        RESTORE re-masking) derive from the MASK DIFF worker-side
        (r8, was a refusal): inserts = before-mask minus after-mask,
        deletes = after-mask minus before-mask; unpaired DV-carrying
        actions derive their VISIBLE rows only. ``cdf_on`` is whether
        delta.enableChangeDataFeed was
        'true' at this commit: derivation over a feed-less commit
        refuses (delta-spark parity) unless allowUnrecordedChanges was
        set — a rewrite commit made before CDF was enabled carries
        dataChange remove+add and no cdc, and deriving it would emit
        every unchanged row as delete+insert."""
        import urllib.parse

        info = next(
            (a["commitInfo"] for a in actions if "commitInfo" in a), {}
        )
        ts_ms = info.get("inCommitTimestamp", info.get("timestamp"))

        def _mk(action, change_type, sel=None):
            p = _AddFilePartition(
                os.path.join(
                    self.table_dir,
                    urllib.parse.unquote(action["path"]),
                ),
                action.get("partitionValues") or {},
                schema_json,
                part_cols,
                cm_json,
                "null",
                self.table_dir,
            )
            p.cdf_json = json.dumps(
                {"ct": change_type, "v": v, "ts": ts_ms}
            )
            if sel is not None:
                p.cdf_sel = json.dumps(sel)
            parts.append(p)

        cdc = [a["cdc"] for a in actions if "cdc" in a]
        if cdc:
            for c in cdc:
                _mk(c, None)  # _change_type lives in the file
            return
        if not cdf_on and not self.allow_unrecorded and any(
            ("add" in a and a["add"].get("dataChange", True))
            or ("remove" in a and a["remove"].get("dataChange", True))
            for a in actions
        ):
            raise ValueError(
                f"readChangeFeed: commit {v} was written while "
                "delta.enableChangeDataFeed was not 'true' — its "
                "changes were not recorded and deriving them from "
                "add/remove actions can over-report rewrites. Set "
                "option allowUnrecordedChanges=true to derive anyway "
                "(safe only for pure appends / full-file deletes)"
            )
        adds_by = {
            a["add"]["path"]: a["add"]
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        }
        removes_by = {
            a["remove"]["path"]: a["remove"]
            for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        }
        paired = set(adds_by) & set(removes_by)
        for rel in sorted(set(removes_by) | paired):
            abs_p = os.path.join(
                self.table_dir, urllib.parse.unquote(rel)
            )
            if not os.path.exists(abs_p):
                raise ValueError(
                    f"readChangeFeed needs removed file {rel!r} "
                    f"(commit {v}), which no longer exists (vacuumed) "
                    "— change history for this range is gone"
                )
        def _dv_key(d):
            return (
                (d.get("storageType"), d.get("pathOrInlineDv"),
                 d.get("offset"))
                if d
                else None
            )
        for rel in sorted(paired):
            a, r = adds_by[rel], removes_by[rel]
            dv_before = r.get("deletionVector")
            dv_after = a.get("deletionVector")
            if _dv_key(dv_before) == _dv_key(dv_after):
                continue  # same mask re-add: no visible change
            _mk(a, "insert",
                sel={"a": dv_before, "b": dv_after, "op": "diff"})
            _mk(a, "delete",
                sel={"a": dv_after, "b": dv_before, "op": "diff"})
        for rel, a in sorted(adds_by.items()):
            if rel in paired:
                continue
            dv = a.get("deletionVector")
            _mk(a, "insert",
                sel={"a": None, "b": dv, "op": "vis"} if dv else None)
        for rel, r in sorted(removes_by.items()):
            if rel in paired:
                continue
            if part_cols and "partitionValues" not in r:
                raise ValueError(
                    f"remove action in commit {v} carries no "
                    "partitionValues — cannot attribute the "
                    "deleted rows to a partition"
                )
            dv = r.get("deletionVector")
            _mk(r, "delete",
                sel={"a": None, "b": dv, "op": "vis"} if dv else None)

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
        fj_by_name = {f["name"]: f for f in cm.get("fields") or []}
        pf = pq.ParquetFile(partition.path)
        # deletion vector: deleted PHYSICAL row positions, subtracted
        # while batches stream through (iter_batches yields row groups
        # in file order, so the running offset IS the physical index)
        dv_desc = json.loads(partition.dv_json or "null")
        dv_idx = None
        if dv_desc:
            import numpy as np

            from rtdl_spark.sources.dv import deleted_row_indices_local

            dv_idx = np.asarray(
                deleted_row_indices_local(partition.table_dir, dv_desc),
                dtype="int64",
            )
        # readChangeFeed DV-derived selection: rows kept are the mask
        # DIFF (op diff: in a and not in b) or the VISIBLE set (op
        # vis: not in b) — never combined with dv_json (a sel
        # partition is a change-row partition)
        sel = json.loads(getattr(partition, "cdf_sel", "null") or "null")
        sel_a = sel_b = None
        if sel:
            import numpy as np

            from rtdl_spark.sources.dv import deleted_row_indices_local

            sel_a = (
                np.asarray(
                    deleted_row_indices_local(
                        partition.table_dir, sel["a"]
                    ),
                    dtype="int64",
                )
                if sel.get("a")
                else np.empty(0, dtype="int64")
            )
            sel_b = (
                np.asarray(
                    deleted_row_indices_local(
                        partition.table_dir, sel["b"]
                    ),
                    dtype="int64",
                )
                if sel.get("b")
                else np.empty(0, dtype="int64")
            )
        row_off = 0
        # top-level file fields by matching key (parquet name, or
        # PARQUET:field_id under id mode — id-less file columns can
        # never match and are treated as dropped)
        idx_by_key: dict = {}
        for i, f in enumerate(pf.schema_arrow):
            k = _file_key(f, mode)
            if k is not None:
                idx_by_key[k] = f.name
        cdf = json.loads(partition.cdf_json or "null")
        for batch in pf.iter_batches():
            if dv_idx is not None or sel:
                import numpy as np

                phys = row_off + np.arange(batch.num_rows, dtype="int64")
                row_off += batch.num_rows
                if sel:
                    not_in_b = ~np.isin(phys, sel_b)
                    keep = (
                        not_in_b
                        if sel["op"] == "vis"
                        else np.isin(phys, sel_a) & not_in_b
                    )
                else:
                    keep = ~np.isin(phys, dv_idx)
                if not keep.all():
                    batch = batch.filter(pa.array(keep))
                    if batch.num_rows == 0:
                        continue
            n = batch.num_rows
            cols = []
            for field in arrow_schema:
                name = field.name
                if cdf is not None and name in (
                    "_change_type", "_commit_version", "_commit_timestamp"
                ):
                    if name == "_change_type":
                        if cdf["ct"] is not None:
                            cols.append(
                                pa.array([cdf["ct"]] * n, type=field.type)
                            )
                        else:
                            # cdc files carry _change_type under its
                            # literal, unmapped name in every CM mode
                            if "_change_type" not in batch.schema.names:
                                raise ValueError(
                                    f"change-data file {partition.path!r} "
                                    "lacks the _change_type column — "
                                    "malformed CDF commit"
                                )
                            cols.append(
                                batch.column("_change_type").cast(
                                    field.type
                                )
                            )
                    elif name == "_commit_version":
                        cols.append(
                            pa.array(
                                [cdf["v"]] * n, type=pa.int64()
                            ).cast(field.type)
                        )
                    else:
                        ts = cdf.get("ts")
                        cols.append(
                            pa.nulls(n, type=field.type)
                            if ts is None
                            else pa.array(
                                [int(ts) * 1000] * n, type=pa.int64()
                            ).cast(field.type)
                        )
                    continue
                fj = fj_by_name.get(name)
                if name in partition.part_cols:
                    # partitionValues keys are PHYSICAL under BOTH CM
                    # modes (PROTOCOL.md Column Mapping)
                    pv_key = name
                    if mode != "none" and fj is not None:
                        pv_key = (fj.get("metadata") or {}).get(
                            "delta.columnMapping.physicalName", name
                        )
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
                src_key = _logical_key(fj, mode) if fj is not None else name
                src = idx_by_key.get(src_key)
                arr = (
                    batch.column(src)
                    if src is not None and src in batch.schema.names
                    else None  # schema evolution: file predates the column
                )
                cols.append(
                    _align(
                        arr,
                        fj.get("type") if fj is not None else None,
                        field.type,
                        mode,
                        n,
                    )
                )
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
        schema = _latest_schema(self.options["path"], versions[-1])
        rcf = str(
            self.options.get(
                "readChangeFeed", self.options.get("readchangefeed", "")
            )
        ).lower() == "true"
        if rcf:
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                TimestampType,
            )

            schema = StructType(
                list(schema.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", TimestampType()),
                ]
            )
        return schema

    def streamReader(self, schema):
        return _DeltaStreamReader(schema, self.options)
