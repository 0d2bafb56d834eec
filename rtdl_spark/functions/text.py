"""Text-analysis expression library (north-star extension, SURVEY.md §2C):
tokenization, shingling, deterministic token hashing, MinHash signatures,
quality scoring, fingerprinting, language-ID heuristics.

Everything here is a Catalyst higher-order-function composition — array
lambdas run inside codegen on the JVM, so these scale like any built-in
(no Python in the row path, no shuffle until an explicit groupBy/join).

The polynomial char hash is chosen to be *reproducible in ANSI SQL*
(exact integer arithmetic), so MinHash/LSH results can be verified by an
independent engine — and so signatures are stable across Spark versions,
unlike F.hash/xxhash64 (whose seeds/impls are engine-private).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)

# Fixed MinHash permutation parameters (a*h + b) mod P — 12 hash functions
# arranged as 4 bands × 3 rows for LSH banding.
MINHASH_A = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)
MINHASH_B = (1, 7, 13, 19, 29, 37, 43, 53, 61, 71, 79, 89)
LSH_BANDS = 4
LSH_ROWS = 3

STOPWORDS = ("the", "a")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (single-space delimiter, matching the fixtures)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the standard near-dup unit.
    Documents shorter than n tokens yield an empty array (guarded:
    F.sequence(0, negative) would count *down*, not produce empty)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
    )
    return F.when(F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def token_hash(tok: Column) -> Column:
    """Deterministic 31-bit polynomial rolling hash of a string:
    fold(chars, h -> (h*31 + ascii(c)) mod P). Exactly reproducible in
    DuckDB/ANSI SQL with list_reduce — see queries/dedup.py oracles."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(31) + F.ascii(c)) % F.lit(HASH_P),
    )


def let(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``value`` once per row and
    reference it any number of times inside ``body`` via the bound lambda
    variable.

    Why this exists: Catalyst evaluates a higher-order-function's lambda
    body per element, re-evaluating any *free* sub-expression it contains
    each time — there is no loop-invariant hoisting. A MinHash signature
    that references the (expensive) shingle-hash array from inside a
    12-element transform therefore re-hashes every shingle 12×; banding on
    top multiplies it again (~48× observed — a 50× slowdown at sf0.1).
    Wrapping the value in a 1-element array and ``transform``-ing over it
    turns the value into a bound lambda *variable*, which is evaluated
    exactly once. Works at any scale — it's a plain deterministic
    expression, no caching or materialization involved.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def minhash_signature(shingle_col: Column) -> Column:
    """k=12 MinHash signature over a shingle array: for each permutation i,
    min over shingles of (a_i*H(s) + b_i) mod P. Pure integer arithmetic →
    bit-identical across engines. The shingle-hash array is let-bound so
    the 12 permutations share one hashing pass (see ``let``)."""
    a = F.array(*[F.lit(x) for x in MINHASH_A])
    b = F.array(*[F.lit(x) for x in MINHASH_B])
    return let(
        F.transform(shingle_col, token_hash),
        lambda hashes: F.transform(
            F.sequence(F.lit(0), F.lit(len(MINHASH_A) - 1)),
            lambda i: F.array_min(
                F.transform(
                    hashes,
                    lambda h: (
                        F.element_at(a, i + 1) * h + F.element_at(b, i + 1)
                    )
                    % F.lit(HASH_P),
                )
            ),
        ),
    )


def lsh_band_keys(sig: Column) -> Column:
    """Band the signature into LSH bucket keys: band index + its rows,
    serialized as a string key. Docs sharing any key are candidates.
    The signature is let-bound so the band keys share one signature
    evaluation (see ``let``)."""
    return let(
        sig,
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
            lambda band: F.concat_ws(
                ":",
                band,
                *[
                    F.element_at(s, band * LSH_ROWS + r + 1)
                    for r in range(LSH_ROWS)
                ],
            ),
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two (distinct-element) arrays, as double.
    NULL (not an error) when both sets are empty — empty documents are a
    fact of any real corpus, and under ANSI mode (Spark 4 default) a plain
    0/0 would fail the whole job."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    stops = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("double")
    return stops / F.size(toks).cast("double")


def distinct_token_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )


def avg_token_len(text: Column | str) -> Column:
    """Mean token length. With single-space joining this is exactly
    (len(text) - (n_tokens-1)) / n_tokens — pure arithmetic, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    return (F.length(c) - (n - F.lit(1))).cast("double") / n.cast("double")


def fingerprint(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct token set
    — robust to word order and repetition (the 'fingerprint dedup' family)."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    )


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over token hashes: bit b is set iff the sum over
    tokens of (2*bit_b(H(t)) - 1) is non-negative. Integer-exact, so
    SQL-reproducible; 16 bits keeps the expression tree small while still
    demonstrating the Hamming-bucket dedup family. The token-hash array is
    let-bound so the 16 bit-sums share one hashing pass (see ``let``)."""
    # shiftleft/shiftright need literal bit counts in PySpark, so extract
    # bit b arithmetically: (h / 2^b) % 2, with 2^b from a literal array.
    pow2 = F.array(*[F.lit(1 << b).cast("long") for b in range(16)])
    bit = lambda h, b: (  # noqa: E731
        (h / F.element_at(pow2, b + 1)).cast("long") % F.lit(2)
    )
    return let(
        F.transform(F.array_distinct(tokens(text)), token_hash),
        lambda hashes: F.aggregate(
            F.sequence(F.lit(0), F.lit(15)),
            F.lit(0).cast("long"),
            lambda acc, b: acc
            + F.when(
                F.aggregate(
                    hashes,
                    F.lit(0).cast("long"),
                    lambda s, h: s + bit(h, b) * F.lit(2) - F.lit(1),
                )
                >= 0,
                F.element_at(pow2, b + 1),
            ).otherwise(F.lit(0).cast("long")),
        ),
    )


def kgrams(text: Column | str, n: int = 4) -> Column:
    """Ordered word n-grams with duplicates KEPT (contrast ``shingles``,
    which dedups): winnowing needs every window position, since the same
    gram recurring later must still compete in its windows."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(
    text: Column | str, k: int = 4, w: int = 5
) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken's MOSS scheme):
    hash every word k-gram with the rolling polynomial hash, slide a
    w-hash window, keep each window's minimum, return the sorted distinct
    minima as the document's fingerprint set.

    Guarantees: any shared run of at least k+w-1 tokens between two
    documents contributes at least one *identical* fingerprint to both —
    the property that catches partial overlap (shared paragraphs) that
    whole-document fingerprints miss. Documents with fewer than k tokens
    fingerprint to []; with fewer than w hashes, the single window is the
    whole hash list (global minimum), per the algorithm's boundary case.

    Cost: O(tokens) map-side expression work, no shuffle; the k-gram hash
    array is let-bound so window minima share one hashing pass (the
    functions/text.py::let HOF-recompute lesson)."""
    return let(
        F.transform(kgrams(text, k), token_hash),
        lambda hs: F.when(
            F.size(hs) > 0,
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(F.size(hs) - w + 1, F.lit(1)),
                        ),
                        lambda i: F.array_min(F.slice(hs, i, w)),
                    )
                )
            ),
        ).otherwise(F.array().cast("array<long>")),
    )


def ngram_repetition(text: Column | str, n: int = 2) -> Column:
    """Fraction of duplicated word n-grams, 1 - distinct/total (0 for
    texts shorter than n tokens) — the repetition signal from the
    Gopher-style quality rules: templated/looping text scores high while
    natural prose stays low. Pure codegen over the kept-duplicates
    ``kgrams``."""
    return let(
        kgrams(text, n),
        lambda g: F.when(
            F.size(g) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(g)).cast("double")
            / F.size(g).cast("double"),
        ).otherwise(F.lit(0.0)),
    )


def top_ngram_share(text: Column | str, n: int = 2) -> Column:
    """Share of all n-gram occurrences taken by the single most frequent
    n-gram (0 below n tokens) — catches the one-phrase-repeated failure
    mode that the aggregate repetition ratio can miss. O(d·t) expression
    work per row (d distinct × t total n-grams), let-bound so the gram
    array is built once; fine for documents, not for books — chunk
    first."""
    return let(
        kgrams(text, n),
        lambda g: F.when(
            F.size(g) > 0,
            F.array_max(
                F.transform(
                    F.array_distinct(g),
                    lambda x: F.size(F.filter(g, lambda y: y == x)),
                )
            ).cast("double")
            / F.size(g).cast("double"),
        ).otherwise(F.lit(0.0)),
    )


def canonical_url(col: Column | str) -> Column:
    """Canonicalize a URL for dedup keys: lowercase scheme+host (path case
    preserved), strip the #fragment, drop tracking query params
    (utm_*, fbclid, gclid), sort the surviving params, strip one trailing
    slash from the path. Pure Catalyst string/HOF expressions — the
    pre-dedup normalization step of every web-corpus pipeline (raw URL
    variants of the same page otherwise defeat exact dedup)."""
    c = F.col(col) if isinstance(col, str) else col
    nofrag = F.element_at(F.split(c, "#", 2), 1)
    base = F.element_at(F.split(nofrag, r"\?", 2), 1)
    qry = F.when(
        F.size(F.split(nofrag, r"\?", 2)) > 1,
        F.element_at(F.split(nofrag, r"\?", 2), 2),
    ).otherwise(F.lit(""))
    sep = F.locate("://", base)
    scheme = F.lower(F.substring(base, F.lit(1), sep - 1))
    rest = F.substring(base, sep + 3, F.length(base))
    host = F.lower(F.element_at(F.split(rest, "/", 2), 1))
    path = F.regexp_replace(
        F.substring(rest, F.length(host) + 1, F.length(rest)), "/$", ""
    )
    params = F.array_sort(
        F.filter(
            F.split(qry, "&"),
            lambda p: (~p.startswith("utm_"))
            & (~p.startswith("fbclid="))
            & (~p.startswith("gclid="))
            & (p != ""),
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
