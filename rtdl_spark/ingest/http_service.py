"""HTTP ingest shim — the reference's two service daemons re-expressed as
one stdlib ``http.server`` front door for the Spark pipeline.

The reference runs two long-lived HTTP services:

- **ingest-service** (ingest/ingest-service.go:318-323): ``POST /ingest``
  wraps an arbitrary JSON message into the envelope {stream_id,
  stream_alt_id, message_type, payload} (projectId > writeKey → alt-id,
  ``type`` → message_type, :167-206), looks up the matching stream config
  (alt-id first, then stream_id, :214-244), routes to the topic named by
  the config's first function (``<fn>-ingress``, :246-258) and SILENTLY
  DROPS messages with no matching config (:244 — no error response).
  ``/refreshCache`` (:320) reloads configs and broadcasts an
  ``rtdl_205`` control message to every function topic (:262-276).
- **config-service** (config/config-service.go:59-76): stream CRUD;
  ``POST /createStream`` is the one a first-time user must call before
  ingesting.

This shim keeps those HTTP contracts but replaces the Kafka hop with a
spool directory: each accepted message is appended as one RAW-message
JSON line under ``spool_dir/<topic>/``, which is exactly the input
``IngestJob.ingest_json_dir`` replays (the pipeline applies the same
envelope semantics on read — pipeline.py::envelope). A user of the
reference can point their HTTP producer here unchanged:

    svc = IngestHttpService(registry, spool_dir)
    host, port = svc.start()
    # POST http://host:port/createStream {stream config json}
    # POST http://host:port/ingest      {"stream_id": ..., "type": ..., ...}
    svc.stop()
    IngestJob(spark, registry, lake_root).ingest_json_dir(
        f"{spool_dir}/ingester-ingress")

Scale note: this is the DEV/edge front door (the reference's own service
is a single-node Go process). At 100 TB the durable transport is Kafka →
``sources.readers.read_kafka_stream``; the shim's spool is the same
at-least-once contract at laptop scale (fsync'd appends, one file per
service lifetime per topic, replay = glob).
"""

from __future__ import annotations

import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from rtdl_spark.config.registry import StreamConfig, StreamRegistry

DEFAULT_TOPIC = "ingester-ingress"
CONTROL_BODY = {"type": "rtdl_205"}


def build_envelope(message: dict) -> dict:
    """Pure-Python twin of ingest-service.go:167-206 (and of the Spark-side
    pipeline.envelope): {stream_id, stream_alt_id, message_type, payload}.
    projectId takes precedence over writeKey (the Go only consults writeKey
    when projectId is nil); ``type`` becomes message_type; the whole
    original message rides in payload."""
    alt = message.get("projectId")
    if alt is None:
        alt = message.get("writeKey")
    return {
        "stream_id": message.get("stream_id"),
        "stream_alt_id": alt,
        "message_type": message.get("type"),
        "payload": message,
    }


def match_config(
    configs: list[StreamConfig], message: dict
) -> StreamConfig | None:
    """Config lookup, ingest-service.go:221-243: the service matches
    against the RAW message's own ``stream_alt_id``/``stream_id`` fields
    — NOT the envelope's derived alt-id (the projectId/writeKey mapping
    at :179-189 only populates the OUTGOING envelope; the lookup loop
    reads ``message["stream_alt_id"]`` directly, so a writeKey-only
    message routes by stream_id or is dropped at this layer — it is the
    downstream INGESTER that honors the derived alt-id,
    ingester.go:1565-1590 / pipeline.py::envelope). Per config record,
    alt-id is tested before stream_id, in registry iteration order;
    None = silent drop (:244)."""
    alt = message.get("stream_alt_id")
    sid = message.get("stream_id")
    for cfg in configs:
        if alt and cfg.stream_alt_id == alt:
            return cfg
        if sid and cfg.stream_id == sid:
            return cfg
    return None


def topic_for(cfg: StreamConfig) -> str:
    """ingest-service.go:246-258: the first function in the chain names
    the ingress topic; empty chain falls back to the default flow."""
    chain = cfg.function_chain()
    return f"{chain[0]}-ingress" if chain else DEFAULT_TOPIC


class IngestHttpService:
    """Threaded stdlib HTTP server exposing /ingest, /refreshCache and the
    config-service CRUD routes, spooling accepted messages as raw JSONL."""

    def __init__(
        self,
        registry: StreamRegistry,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.registry = registry
        self.spool_dir = spool_dir
        self.host = host
        self.port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._files: dict[str, io.TextIOWrapper] = {}
        self.n_ingested = 0
        self.n_dropped = 0

    # -- spool -------------------------------------------------------------
    def _append(self, topic: str, line: dict) -> None:
        with self._lock:
            fh = self._files.get(topic)
            if fh is None:
                d = os.path.join(self.spool_dir, topic)
                os.makedirs(d, exist_ok=True)
                fh = open(  # noqa: SIM115 — held across requests, closed in stop()
                    os.path.join(d, f"messages-{os.getpid()}.jsonl"), "a"
                )
                self._files[topic] = fh
            fh.write(json.dumps(line, separators=(",", ":")) + "\n")
            fh.flush()

    def _known_topics(self) -> list[str]:
        """Every topic any config routes to (the reference broadcasts
        control messages to its static all-functions list; the registry IS
        that list here), plus the default flow."""
        topics = {DEFAULT_TOPIC}
        for cfg in self.registry.get_all():
            topics.add(topic_for(cfg))
        return sorted(topics)

    # -- request handling ---------------------------------------------------
    def _handle(self, path: str, body: bytes) -> tuple[int, dict]:
        if path == "/ingest":
            try:
                message = json.loads(body)
            except (ValueError, UnicodeDecodeError):
                return 400, {"error": "body must be a JSON object"}
            if not isinstance(message, dict):
                return 400, {"error": "body must be a JSON object"}
            cfg = match_config(self.registry.get_all_active(), message)
            if cfg is None:
                # reference parity: no matching config = silent drop
                # (ingest-service.go:244) — 200, nothing spooled
                self.n_dropped += 1
                return 200, {"status": "dropped"}
            self._append(topic_for(cfg), message)
            self.n_ingested += 1
            return 200, {"status": "queued", "stream_id": cfg.stream_id}
        if path == "/refreshCache":
            self.registry.reload()
            for topic in self._known_topics():
                self._append(topic, CONTROL_BODY)
            return 200, {"status": "refreshed"}
        if path == "/createStream":
            try:
                raw = json.loads(body)
                if not isinstance(raw, dict):
                    return 400, {"error": "body must be a JSON object"}
                cfg = self.registry.create(StreamRegistry._from_dict(raw))
            except (ValueError, TypeError, KeyError, AttributeError) as exc:
                return 400, {"error": str(exc)}
            return 200, {"stream_id": cfg.stream_id}
        if path == "/getAllStreams":
            return 200, {
                "streams": [c.stream_id for c in self.registry.get_all()]
            }
        if path == "/deleteStream":
            try:
                sid = json.loads(body)["stream_id"]
            except (ValueError, KeyError, TypeError) as exc:
                return 400, {"error": str(exc)}
            try:
                self.registry.delete(sid)
            except FileNotFoundError:
                # unknown stream: a JSON 404, not a dropped connection
                return 404, {"error": f"no stream {sid}"}
            except (ValueError, KeyError, OSError) as exc:
                return 400, {"error": str(exc)}
            return 200, {"status": "deleted"}
        return 404, {"error": f"no route {path}"}

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> tuple[str, int]:
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def _respond(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                code, payload = svc._handle(self.path, body)
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            do_POST = do_GET = do_PUT = do_DELETE = _respond

            def log_message(self, *args):  # quiet test output
                pass

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self.host, self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        with self._lock:
            for fh in self._files.values():
                fh.close()
            self._files.clear()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False
