"""Oracle comparison harness — a strict local replica of the driver's
row-count + schema + order-insensitive value-hash check.

We compare *exact* values (bit-level for floats after canonicalization):
if these tests pass, any reasonable hash the driver computes also matches.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def canon_cell(v):
    """Canonicalize one cell to a hashable, engine-independent token."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; bit-identical values agree.
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_tokens(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (as the driver does), canonicalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    toks = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(toks)


def compare(spark_df, duck_con, sql: str, name: str = "query") -> None:
    sdf = spark_df.toPandas()
    ddf = duck_con.sql(sql).fetchdf()

    assert len(sdf) == len(ddf), (
        f"{name}: row count mismatch spark={len(sdf)} duckdb={len(ddf)}"
    )
    s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
    assert s_cols == d_cols, f"{name}: columns mismatch {s_cols} vs {d_cols}"

    s_tok = frame_tokens(list(sdf.columns), list(sdf.itertuples(index=False, name=None)))
    d_tok = frame_tokens(list(ddf.columns), list(ddf.itertuples(index=False, name=None)))
    if s_tok != d_tok:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_tok, d_tok)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duckdb): {diffs}"
        )
