"""Operators Spark lacks natively, built Spark-first (composition of
DataFrame ops; Pandas UDFs only where semantics demand)."""
