"""Ingestion dataflow (SURVEY.md §2A): envelope → route → resolve table →
partition → columnar write → catalog registration → function chain.

The reference runs this as 4 services over Kafka + Flink StateFun; here it
is one declarative Spark job (batch or Structured Streaming) — see
SURVEY.md §3.1 'Spark redesign'."""

from rtdl_spark.ingest.pipeline import IngestJob  # noqa: F401
