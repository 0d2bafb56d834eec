"""Z-order (Morton-curve) data layout — multi-column clustering for scan
pruning, the open equivalent of Delta's OPTIMIZE ZORDER BY.

Why it matters at 100 TB: partitioning prunes on ONE hierarchy
(table/bucket); queries that filter on other columns (customer, part,
price band) still scan every file in the partition. Writing files ordered
by a Z-value interleaved from several columns makes each file cover a
small hyper-rectangle of the value space, so parquet min/max footer stats
skip most files for predicates on ANY of the interleaved columns — a
single-column sort gives perfect skipping on that column and none on the
others; Z-order trades a little of the first column's locality for
skipping on all of them.

Mechanics: each column is normalized to a ``bits``-wide integer by uniform
min/max scaling (driver computes the 2-value bounds in one tiny agg), the
integers are combined into a curve key — Morton bit-interleave JVM-side
(shift/mask expressions — no UDF) or a Hilbert index (numpy kernel,
functions/hilbert_np.py; unit-step locality → tighter per-file bounding
boxes) — and the frame is range-partitioned + sorted by the key before
writing.
Uniform scaling is deliberate: quantile scaling handles skew better but
needs an approxQuantile pass; callers with pathological skew should
pre-transform (log, rank) the column instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_cols(
    df: DataFrame,
    cols: list[str],
    bits: int,
    scaling: str,
    bounds: dict[str, tuple[float | None, float | None]] | None = None,
) -> list[Column]:
    """Normalize each column to a ``bits``-bit long (shared by both
    curves). NULLs map to bucket 0 (they cluster together — the useful
    behavior for skipping).

    ``scaling``:
    - ``"uniform"``: min/max scaling — one tiny driver agg (2 doubles per
      column), right for roughly-even distributions.
    - ``"quantile"``: approxQuantile boundaries, bucket = number of
      boundaries ≤ value (an array-filter count, still pure codegen).
      Right for skewed columns, where uniform scaling collapses most rows
      into a few buckets and the curve degenerates to a sort on the other
      columns. Costs one approxQuantile pass per column and 2^bits
      comparisons per row, so pair it with modest ``bits``.

    ``bounds`` (uniform scaling only): precomputed {col: (min, max)}
    bounds — when the caller already KNOWS the value range (e.g. from a
    Delta table's per-file stats), the driver agg job is skipped
    entirely. Bounds may be wider than the data (clamping keeps every
    row in [0, top]); a (None, None) entry means the column has no
    usable range and scales to the constant 0 bucket, exactly like the
    agg path on an all-null column."""
    if scaling not in ("uniform", "quantile"):
        raise ValueError("scaling must be 'uniform' or 'quantile'")
    top = (1 << bits) - 1
    scaled: list[Column] = []
    if scaling == "quantile":
        probs = [i / (top + 1) for i in range(1, top + 1)]
        for c in cols:
            qs = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
                c, probs, 0.001
            )
            arr = F.array(*[F.lit(float(b)) for b in qs])
            scaled.append(
                F.coalesce(
                    F.size(
                        F.filter(
                            arr, lambda b: F.col(c).cast("double") >= b
                        )
                    ).cast("long"),
                    F.lit(0).cast("long"),
                )
            )
    else:
        if bounds is not None and set(bounds) >= set(cols):
            known = bounds
        else:
            row = df.agg(
                *[
                    F.min(F.col(c).cast("double")).alias(f"mn_{c}")
                    for c in cols
                ],
                *[
                    F.max(F.col(c).cast("double")).alias(f"mx_{c}")
                    for c in cols
                ],
            ).collect()[0]
            known = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
        for c in cols:
            mn, mx = known[c]
            if mn is None or mx is None or mx <= mn:
                scaled.append(F.lit(0).cast("long"))
                continue
            frac = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
            scaled.append(
                F.coalesce(
                    F.least(
                        F.floor(frac * F.lit(top + 1)).cast("long"), F.lit(top)
                    ),
                    F.lit(0).cast("long"),
                )
            )
    return scaled


def zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    scaling: str = "uniform",
    curve: str = "morton",
    bounds: dict[str, tuple[float | None, float | None]] | None = None,
) -> tuple[DataFrame, Column]:
    """Return (df, zcol): the space-filling-curve key of ``cols``
    normalized to ``bits``-bit integers (see _scaled_cols for scaling).

    ``curve``:
    - ``"morton"`` (default): bit interleave, pure shift/mask Catalyst
      expressions — zero Python anywhere.
    - ``"hilbert"``: Skilling transform via an Arrow/numpy kernel
      (functions/hilbert_np.py). Unit-step locality → tighter per-file
      bounding boxes than Morton's power-of-two jumps, i.e. better footer
      skipping for the same layout cost; the kernel runs only at
      layout-write time, never in the query path.

    ``bounds``: optional precomputed per-column (min, max) for uniform
    scaling — skips the bounds agg job (see _scaled_cols)."""
    scaled = _scaled_cols(df, cols, bits, scaling, bounds=bounds)
    if curve == "hilbert":
        from rtdl_spark.functions.hilbert_np import hilbert_key

        return df, hilbert_key(scaled, bits)
    if curve != "morton":
        raise ValueError("curve must be 'morton' or 'hilbert'")
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return df, z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 32,
    bits: int = 8,
    mode: str = "overwrite",
    scaling: str = "uniform",
    curve: str = "morton",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the chosen
    space-filling curve of ``cols``: range-partition by curve key
    (contiguous curve segments per file → tight per-file min/max on every
    interleaved column), sort within partitions (tight page-level stats
    too)."""
    base, z = zvalue(df, cols, bits, scaling, curve)
    (
        base.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
