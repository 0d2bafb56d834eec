"""PII masking transform — capability parity with the reference's
pii-detection stateful function.

The reference masks the *entire serialized message JSON* with two regexes
(PiiDetector.java:15-18: SSN ``\\d{3}-\\d{2}-\\d{4}``, US phone
``[2-9]\\d{2}-\\d{3}-\\d{4}``; applied in PiiDetector.maskPII), replacing
matches with ``###``. Here the same regexes are Catalyst ``regexp_replace``
expressions (JVM-side, codegen'd) applicable to a single column, every
string column, or a whole row serialized with to_json — the last mirrors
the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SSN_RE = r"\d{3}-\d{2}-\d{4}"
PHONE_RE = r"[2-9]\d{2}-\d{3}-\d{4}"
MASK = "###"


def mask_pii_col(col: Column | str) -> Column:
    """Mask SSN + US-phone patterns in one string column (A23 regexes,
    applied in the reference's order: SSN first, then phone)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, SSN_RE, MASK), PHONE_RE, MASK
    )


def mask_pii_strings(df: DataFrame) -> DataFrame:
    """Mask every string column in place — the columnar equivalent of the
    reference's whole-message masking (schema survives, unlike masking the
    serialized JSON, which could corrupt it if keys matched the patterns)."""
    out = df
    for name, dtype in df.dtypes:
        if dtype == "string":
            out = out.withColumn(name, mask_pii_col(name))
    return out


def mask_pii_serialized(df: DataFrame) -> DataFrame:
    """Exact reference semantics (PiiDetectionFn.java:32-69): serialize the
    whole row to JSON, mask the serialized text, return one masked_json
    string column."""
    return df.select(
        mask_pii_col(F.to_json(F.struct(*df.columns))).alias("masked_json")
    )
