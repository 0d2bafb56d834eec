"""Enum constants — parity with the reference's constants/*.json.

file_store_types (constants/file_store_types.json): 1=local 2=aws 3=gcp
4=azure 5=hdfs; partition_times (constants/partition_times.json): 1=hourly
2=daily 3=weekly 4=monthly 5=quarterly; compression_types
(constants/compression_types.json): 1=snappy 2=gzip 3=lzo.

Spark ships no LZO codec in OSS builds; compression id 3 maps to zstd (the
modern columnar default) and the divergence is documented here rather than
silently failing at write time.
"""

FILE_STORE_TYPES = {1: "local", 2: "aws", 3: "gcp", 4: "azure", 5: "hdfs"}

PARTITION_TIMES = {1: "hourly", 2: "daily", 3: "weekly", 4: "monthly", 5: "quarterly"}

COMPRESSION_TYPES = {1: "snappy", 2: "gzip", 3: "zstd"}

# URI scheme per store type — the writer only varies the path prefix; the
# Hadoop FS layer handles the transport (SURVEY.md A12–A16).
STORE_URI_PREFIX = {
    "local": "file://",
    "aws": "s3a://",
    "gcp": "gs://",
    "azure": "abfss://",
    "hdfs": "hdfs://",
}

# The reference's in-band control message type (ingest-service.go:268);
# consumed, never written to the lake (ingester.go:1551-1561).
CONTROL_MESSAGE_TYPE = "rtdl_205"

DEFAULT_MESSAGE_TYPE = "rtdl_default"

ALL_FUNCTIONS = ("ingester", "deltawriter", "pii-detection")
