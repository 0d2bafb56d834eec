"""StreamRegistry — stream-config CRUD with the semantics of the
reference's config service (config/config-service.go:59-697): one JSON file
per stream under a configs dir, UUID identity, ``active`` flag,
``stream_alt_id`` for external ids, validation of the store-type enum, and
enum listing endpoints.

The distributed-cache-invalidation machinery of the reference (refreshCache
broadcast + rtdl_205 control messages, SURVEY.md A2) collapses to
``reload()``: Spark jobs read the registry at job/batch start, so a config
change is picked up by the next batch with no cross-service choreography.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone

from rtdl_spark.config.constants import (
    COMPRESSION_TYPES,
    FILE_STORE_TYPES,
    PARTITION_TIMES,
)


@dataclass
class StreamConfig:
    """Parity with stream_json (config-service.go:21-48); credential and
    catalog-integration fields are accepted but unused locally."""

    stream_id: str = ""
    stream_alt_id: str = ""
    active: bool = True
    message_type: str = ""
    file_store_type_id: int = 1
    region: str = ""
    bucket_name: str = ""
    folder_name: str = ""
    partition_time_id: int = 2
    compression_type_id: int = 1
    namenode_host: str = ""
    namenode_port: int = 0
    functions: str = "ingester"
    # Engine extension (no reference analogue — the reference re-infers a
    # schema per message, ingester.go:453-520): optional pinned DDL schema
    # for this stream's raw events. When every active stream pins one,
    # ingest skips JSON schema inference entirely — at scale, inference is
    # a full extra pass over the batch.
    pinned_schema: str = ""
    # External-catalog integration fields (stream_json parity,
    # config-service.go:21-48; consumed by rtdl_spark.catalog_external)
    glue_role: str = ""
    glue_schedule_cron: str = ""
    aws_access_key_id: str = ""
    aws_secret_access_key: str = ""
    azure_storage_access_key: str = ""
    created_at: str = ""
    updated_at: str = ""
    extra: dict = field(default_factory=dict)

    def function_chain(self) -> list[str]:
        """Split + dedup preserving order (reference removeDuplicateStr,
        ingester.go:174-184)."""
        seen: list[str] = []
        for fn in self.functions.split(","):
            fn = fn.strip()
            if fn and fn not in seen:
                seen.append(fn)
        return seen


class StreamRegistry:
    def __init__(self, configs_dir: str):
        self.configs_dir = configs_dir
        os.makedirs(configs_dir, exist_ok=True)
        self._cache: dict[str, StreamConfig] = {}
        self.reload()

    # -- persistence ------------------------------------------------------
    def _path(self, stream_id: str) -> str:
        return os.path.join(self.configs_dir, f"{stream_id}.json")

    def reload(self) -> None:
        self._cache = {}
        for name in sorted(os.listdir(self.configs_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.configs_dir, name)) as f:
                raw = json.load(f)
            cfg = self._from_dict(raw)
            self._cache[cfg.stream_id] = cfg

    @staticmethod
    def _from_dict(raw: dict) -> StreamConfig:
        known = {f for f in StreamConfig.__dataclass_fields__ if f != "extra"}
        kwargs = {k: v for k, v in raw.items() if k in known}
        extra = {k: v for k, v in raw.items() if k not in known}
        return StreamConfig(**kwargs, extra=extra)

    def _persist(self, cfg: StreamConfig) -> None:
        d = asdict(cfg)
        d.update(d.pop("extra"))
        with open(self._path(cfg.stream_id), "w") as f:
            json.dump(d, f, indent=2, sort_keys=True)

    # -- validation (config-service.go:670-697) ---------------------------
    @staticmethod
    def validate(cfg: StreamConfig) -> None:
        if cfg.file_store_type_id not in FILE_STORE_TYPES:
            raise ValueError(
                f"file_store_type_id must be one of {sorted(FILE_STORE_TYPES)}"
            )
        if cfg.partition_time_id not in PARTITION_TIMES:
            raise ValueError(
                f"partition_time_id must be one of {sorted(PARTITION_TIMES)}"
            )
        if cfg.compression_type_id not in COMPRESSION_TYPES:
            raise ValueError(
                f"compression_type_id must be one of {sorted(COMPRESSION_TYPES)}"
            )

    # -- CRUD (config-service.go routes :59-76) ----------------------------
    def create(self, cfg: StreamConfig) -> StreamConfig:
        self.validate(cfg)
        if not cfg.stream_id:
            cfg.stream_id = str(uuid.uuid4())
        now = datetime.now(timezone.utc).isoformat()
        cfg.created_at = cfg.created_at or now
        cfg.updated_at = now
        self._persist(cfg)
        self._cache[cfg.stream_id] = cfg
        return cfg

    def get(self, stream_id: str) -> StreamConfig:
        return self._cache[stream_id]

    def get_all(self) -> list[StreamConfig]:
        return list(self._cache.values())

    def get_all_active(self) -> list[StreamConfig]:
        return [c for c in self._cache.values() if c.active]

    def update(self, cfg: StreamConfig) -> StreamConfig:
        self.validate(cfg)
        if cfg.stream_id not in self._cache:
            raise KeyError(cfg.stream_id)
        cfg.updated_at = datetime.now(timezone.utc).isoformat()
        self._persist(cfg)
        self._cache[cfg.stream_id] = cfg
        return cfg

    def delete(self, stream_id: str) -> None:
        os.remove(self._path(stream_id))
        del self._cache[stream_id]

    def set_active(self, stream_id: str, active: bool) -> StreamConfig:
        cfg = self.get(stream_id)
        cfg.active = active
        return self.update(cfg)

    # -- pinned schemas -----------------------------------------------------
    def pinned_union_schema(self):
        """Union StructType of every active stream's ``pinned_schema``, or
        None if any active stream leaves it empty (→ caller falls back to
        inference). Same-named fields must agree on type across streams —
        the source read is one scan shared by all routes, so there is one
        physical schema."""
        from pyspark.sql.types import StructType

        active = self.get_all_active()
        if not active or any(not c.pinned_schema for c in active):
            return None
        fields: dict[str, object] = {}
        for cfg in active:
            for f in StructType.fromDDL(cfg.pinned_schema).fields:
                prev = fields.get(f.name)
                if prev is not None and prev.dataType != f.dataType:
                    raise ValueError(
                        f"pinned_schema conflict on field {f.name!r}: "
                        f"{prev.dataType} vs {f.dataType} "
                        f"(stream {cfg.stream_id})"
                    )
                fields.setdefault(f.name, f)
        return StructType(list(fields.values()))

    # -- routing (A5: ingester.go:1565-1590) -------------------------------
    def match(self, stream_id: str | None, stream_alt_id: str | None) -> StreamConfig | None:
        """alt-id first, then stream_id; None if unmatched (caller drops the
        message, matching the reference's silent-drop semantics)."""
        for cfg in self._cache.values():
            if stream_alt_id and cfg.stream_alt_id == stream_alt_id and cfg.active:
                return cfg
        for cfg in self._cache.values():
            if stream_id and cfg.stream_id == stream_id and cfg.active:
                return cfg
        return None
