"""Stream configuration: registry (CRUD) + enums, mirroring the
reference's config-service + constants (SURVEY.md A5/A6)."""

from rtdl_spark.config.constants import (  # noqa: F401
    COMPRESSION_TYPES,
    FILE_STORE_TYPES,
    PARTITION_TIMES,
)
from rtdl_spark.config.registry import StreamConfig, StreamRegistry  # noqa: F401
