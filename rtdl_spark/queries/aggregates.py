"""Filled in incrementally; see rtdl_spark.queries registry."""
