"""Vectorized (Arrow/numpy) MinHash — the Python-side twin of the
Catalyst-expression MinHash in ``functions.text``.

Why both exist: the expression path (``text.minhash_signature``) keeps the
whole pipeline JVM-side, but Catalyst evaluates higher-order-function
lambdas interpreted (no whole-stage codegen inside array lambdas), so the
per-character polynomial hash fold costs ~µs/char. This module computes the
*same* integers — identical shingling, identical (h*31 + codepoint) mod P
fold, identical (a*h + b) mod P permutations — as a batched numpy kernel
behind a pandas UDF, turning the per-char fold into a handful of
vectorized array ops per Arrow batch. Signatures are bit-identical to the
expression path (tests/test_operators.py parity test), so the DuckDB
oracle for MinHash+LSH verifies either implementation unchanged.

Scale: the UDF is a narrow map — no shuffle, no state; Arrow batches
stream through Python workers, so it parallelizes exactly like any
projection. The cost is one JVM→Arrow→numpy hop, which the kernel
amortizes over the batch; at 100 TB the choice of path is per-cluster (CPU
budget of Python workers vs JVM), and both produce the same buckets.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from rtdl_spark.functions.text import (
    HASH_P,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_A,
    MINHASH_B,
)

_A = np.asarray(MINHASH_A, dtype=np.int64)[:, None]
_B = np.asarray(MINHASH_B, dtype=np.int64)[:, None]

# 31^k mod P for k up to the longest shingle seen; extended on demand.
_POW31 = np.asarray([1], dtype=np.int64)


def _pow31(upto: int) -> np.ndarray:
    global _POW31
    if len(_POW31) <= upto:
        ext = np.empty(upto + 1, dtype=np.int64)
        ext[: len(_POW31)] = _POW31
        for k in range(len(_POW31), upto + 1):
            ext[k] = (ext[k - 1] * 31) % HASH_P
        _POW31 = ext
    return _POW31


def _shingle(text: str, n: int) -> list[str]:
    """Word n-gram shingles, distinct, first-occurrence order — exactly
    ``text.shingles``: split on the literal single space (empties kept,
    as F.split does), join with a space, empty list below n tokens."""
    toks = text.split(" ")
    if len(toks) < n:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def _hash_shingles(flat: list[str]) -> np.ndarray:
    """Polynomial codepoint hash of each string, vectorized:
    h(s) = sum(cp_i * 31^(L-1-i)) mod P == fold((h*31 + cp) mod P).

    Codepoints come from one utf-32 decode of the concatenated batch (this
    matches F.ascii, which returns the full codepoint of the character).
    Products stay < 2^52 and per-shingle sums < 2^60 for shingles up to
    ~250 chars, safely inside int64; longer shingles reduce mod P in
    chunks below.
    """
    if not flat:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter(map(len, flat), dtype=np.int64, count=len(flat))
    codes = np.frombuffer("".join(flat).encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # exponent of 31 for each char: (shingle_len - 1 - offset_within)
    within = np.arange(codes.size, dtype=np.int64) - np.repeat(starts, lens)
    exp = np.repeat(lens, lens) - 1 - within
    prod = (codes * _pow31(int(lens.max(initial=0)))[exp]) % HASH_P
    if int(lens.max(initial=0)) > 250:  # keep reduceat sums inside int64
        prod %= HASH_P
    h = np.add.reduceat(prod, starts) % HASH_P
    h[lens == 0] = 0  # reduceat on empty segment returns neighbor, not 0
    return h


def _signatures(shingle_lists: list[list[str]]) -> np.ndarray:
    """(n_docs, 12) int64 signatures; -1 marks NULL (empty shingle set),
    mirroring array_min over an empty array in the expression path."""
    counts = np.fromiter(map(len, shingle_lists), dtype=np.int64, count=len(shingle_lists))
    flat = [s for doc in shingle_lists for s in doc]
    h = _hash_shingles(flat)
    perm = (_A * h[None, :] + _B) % HASH_P  # (12, n_shingles)
    out = np.full((len(shingle_lists), len(MINHASH_A)), -1, dtype=np.int64)
    nonempty = counts > 0
    if nonempty.any():
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))[nonempty]
        out[nonempty] = np.minimum.reduceat(perm, starts, axis=1).T
    return out


def _band_keys(sig_row: np.ndarray) -> list[str]:
    """Serialize a signature row to LSH band keys exactly as
    ``text.lsh_band_keys`` does (concat_ws drops NULL rows, so an empty
    document yields the bare band indices)."""
    keys = []
    for band in range(LSH_BANDS):
        parts = [str(band)] + [
            str(sig_row[band * LSH_ROWS + r])
            for r in range(LSH_ROWS)
            if sig_row[band * LSH_ROWS + r] >= 0
        ]
        keys.append(":".join(parts))
    return keys


def minhash_signature_np(text: Column, shingle_n: int = 3) -> Column:
    """pandas_udf: text -> array<long> MinHash signature (NULL elements
    where the expression path yields NULL). For parity tests and users
    who want raw signatures."""

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            sig = _signatures([_shingle(t, shingle_n) for t in s])
            yield pd.Series(
                [[None if v < 0 else int(v) for v in row] for row in sig]
            )

    return _sig(text)


def minhash_band_keys_np(text: Column, shingle_n: int = 3) -> Column:
    """pandas_udf: text -> array<string> LSH band keys, bit-identical to
    lsh_band_keys(minhash_signature(shingles(text)))."""

    @F.pandas_udf(ArrayType(StringType()))
    def _bands(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            sig = _signatures([_shingle(t, shingle_n) for t in s])
            yield pd.Series([_band_keys(row) for row in sig])

    return _bands(text)
