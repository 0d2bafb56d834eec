"""rtdl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of realtimedatalake/rtdl.

The reference (rtdl) is an ingestion layer that delegates all SQL to Dremio
(reference README.md:22-23). This engine owns both surfaces natively:

- ``rtdl_spark.ingest``     — the rtdl dataflow (envelope → route → schema
  inference → partitioned columnar write → catalog registration → chain),
  re-expressed as Spark batch / Structured Streaming jobs.
- ``rtdl_spark.queries``    — the full relational query surface rtdl delivers
  through Dremio, as Spark DataFrame/SQL plans (SURVEY.md §2B).
- ``rtdl_spark.operators``  — operators Spark lacks natively (as-of join,
  dedup families, similarity search) built Spark-first.
- ``rtdl_spark.functions``  — scalar function library (PII masking, text
  analysis, vector math, partition-bucket derivations).
- ``rtdl_spark.streaming``  — event-time windowing / watermark / stateful jobs.
"""

__version__ = "0.1.0"

from rtdl_spark.session import get_spark  # noqa: F401
