from rtdl_spark.sources.readers import (
    delta_available,
    kafka_stream_reader,
    read_csv,
    read_delta,
    read_json_envelopes,
    read_parquet,
)

__all__ = [
    "delta_available",
    "kafka_stream_reader",
    "read_csv",
    "read_delta",
    "read_json_envelopes",
    "read_parquet",
]
