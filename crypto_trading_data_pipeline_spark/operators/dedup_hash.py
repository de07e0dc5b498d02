"""Portable hashing primitives for near-dup detection (MinHash/LSH, SimHash,
n-gram Jaccard).

The driver's correctness gate compares Spark against DuckDB, so every hash
must be computable IDENTICALLY in both engines. Neither engine's native
hash() matches the other, so we build one from primitives both share:

    token_hash(t) = CAST(first 15 hex chars of md5(t) AS int) mod P,
    P = 2^31 - 1 (Mersenne prime)

15 hex chars = 60 bits < 63, so the parse fits a signed int64 in both
engines; reducing mod P keeps products a*h below 2^62 — no overflow in the
universal-hash family h_i(x) = (a_i*x + b_i) mod P used for MinHash
permutations.

Scale notes: all of this is per-row expression work (whole-stage codegen,
zero shuffles). MinHash+LSH turns O(n^2) near-dup search into
O(n * bands) + a self-join on (band_id, band_hash) buckets — the join key
is a 128-bit digest, so bucket skew only appears if the corpus truly
contains thousands of copies of one document (then: salt the band key).

The same constants generate both the Spark Columns and the DuckDB oracle
SQL (single source of truth — see sql_* helpers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for the universal-hash family (Mersenne prime 2^31-1).
MINHASH_P = 2_147_483_647

#: 16 fixed (a, b) pairs — a odd, both < P. Hardcoded so signatures are
#: stable across releases (a signature store is only useful if stable).
MINHASH_PERMS: list[tuple[int, int]] = [
    (1_203_114_875, 613_258_943),
    (954_271_733, 1_726_554_089),
    (642_938_111, 271_828_183),
    (1_856_430_029, 314_159_261),
    (777_767_777, 1_414_213_561),
    (1_234_567_891, 987_654_323),
    (432_902_611, 1_097_393_921),
    (1_640_531_527, 97_531_863),
    (265_443_577, 1_839_256_361),
    (1_013_904_223, 75_312_417),
    (1_372_383_749, 440_817_757),
    (599_479_067, 1_919_810_113),
    (1_103_515_245, 12_345_679),
    (214_013_133, 2_531_011_01),
    (1_664_525_013, 1_013_904_243),
    (22_695_477, 1_342_177_279),
]

#: LSH banding: 16 rows -> 4 bands of 4. With Jaccard similarity s, the
#: candidate probability is 1-(1-s^4)^4 (~0.5 at s≈0.55).
LSH_BANDS = 4
LSH_ROWS_PER_BAND = 4

#: SimHash width (bits of the token hash used).
SIMHASH_BITS = 32


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def token_hash(c: Column) -> Column:
    """Portable 31-bit hash of a string column (see module docstring)."""
    h60 = F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    return h60 % MINHASH_P


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (word k-grams) of a whitespace-tokenized
    text; empty array when the text has fewer than k tokens."""
    toks = F.split(text, " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))  # 1-based, matches DuckDB
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])  # noqa: E731
    return F.when(n >= k, F.array_distinct(F.transform(idx, shingle))).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(hashes: Column) -> list[Column]:
    """16 MinHash values (one per permutation); NULL for empty shingle sets.

    ``hashes`` must be a MATERIALIZED column of token hashes (build it with
    ``withColumn('hs', F.transform(shingles, token_hash))`` first): passing
    the hash expression tree directly would duplicate the md5 work into all
    16 permutation expressions — a 16x slowdown measured at sf0.1.

    Alternative considered and rejected: folding all 16 minima in one
    array traversal (16-wide accumulator via aggregate + zip_with/least).
    Measured SLOWER than 16 independent array_min passes on the full
    query (1.07 s vs 0.87 s warm at sf0.1) — the per-element accumulator
    array allocation outweighs the saved traversals, and the independent
    passes stay simple codegen loops.
    """
    return [
        F.array_min(F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P)).alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]


def band_hashes(sig_cols: list[str]) -> list[Column]:
    """Group the 16 signature columns into LSH band digests."""
    out = []
    for band in range(LSH_BANDS):
        cols = sig_cols[band * LSH_ROWS_PER_BAND : (band + 1) * LSH_ROWS_PER_BAND]
        out.append(
            F.md5(
                F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).cast("binary")
            ).alias(f"band{band}")
        )
    return out


def simhash(hashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over a MATERIALIZED token-hash array column: bit j of the
    result is the majority vote of bit j across all token hashes (ties -> 0).
    Row-local, no shuffle. Like minhash_signature, requires the hash array
    as a real column — an expression tree would recompute md5 per bit."""
    n = F.size(hashes)
    acc = F.lit(0).cast("long")
    for j in range(bits):
        ones = F.size(F.filter(hashes, lambda h: h.bitwiseAND(F.lit(1 << j)) != 0))
        acc = acc + F.when(ones * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


# ---------------------------------------------------------------------------
# Spark-SQL text generators (r14 fixed-floor work). Building the MinHash/LSH
# expression forest as Column objects costs hundreds of ~2 ms py4j round
# trips PER QUERY CONSTRUCTION (profiled in OPTIMIZATION_r14.md); rendering
# the SAME expressions as SQL text parsed JVM-side cuts that to a handful of
# selectExpr calls. These mirror the Column builders above expression by
# expression — keep all three families (Column / Spark SQL / DuckDB SQL) in
# lockstep.
# ---------------------------------------------------------------------------


def sparksql_token_hash(expr: str) -> str:
    """Spark-SQL text of ``token_hash`` applied to ``expr``."""
    return (
        f"(CAST(conv(substring(md5(CAST({expr} AS binary)), 1, 15), 16, 10) "
        f"AS bigint) % {MINHASH_P})"
    )


def sparksql_word_shingles(text_expr: str, k: int = 3) -> str:
    """Spark-SQL text of ``word_shingles`` over ``text_expr``."""
    toks = f"split({text_expr}, ' ')"
    parts = ", ".join(f"element_at({toks}, i + {j})" for j in range(k))
    return (
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def sparksql_minhash_signature(hs_expr: str = "hs") -> list[str]:
    """Spark-SQL text of ``minhash_signature`` (16 aliased items) over a
    materialized hash-array column."""
    return [
        f"array_min(transform({hs_expr}, h -> (({a} * h + {b}) % {MINHASH_P}))) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]


def sparksql_token_hash_list(toks_expr: str) -> str:
    """Spark-SQL text of a token-hash array over a token-array expression."""
    return f"transform({toks_expr}, t -> {sparksql_token_hash('t')})"


def sparksql_simhash(hs_col: str, bits: int = SIMHASH_BITS) -> str:
    """Spark-SQL text of ``simhash`` over a materialized hash-array column.
    The Column form folds 32 majority-vote terms (~8 py4j calls each)."""
    terms = " + ".join(
        f"(CASE WHEN size(filter({hs_col}, h -> (h & {1 << j}) != 0)) * 2 "
        f"> size({hs_col}) THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"(CAST(0 AS bigint) + {terms})"


def sparksql_band_hashes(sig_cols: list[str]) -> list[str]:
    """Spark-SQL text of ``band_hashes`` (un-aliased band digests)."""
    out = []
    for band in range(LSH_BANDS):
        cols = sig_cols[band * LSH_ROWS_PER_BAND : (band + 1) * LSH_ROWS_PER_BAND]
        cat = ", ".join(f"CAST({c} AS string)" for c in cols)
        out.append(f"md5(CAST(concat_ws(',', {cat}) AS binary))")
    return out


# ---------------------------------------------------------------------------
# DuckDB-side SQL generators (same constants — keep in lockstep with above)
# ---------------------------------------------------------------------------


def sql_token_hash(expr: str) -> str:
    return f"(CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT) % {MINHASH_P})"


def sql_word_shingles(text_expr: str, k: int = 3) -> str:
    toks = f"string_split({text_expr}, ' ')"
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {k - 2}), i -> {parts})) "
        f"ELSE [] END"
    )


def sql_minhash_values(shingles_expr: str) -> list[str]:
    th = sql_token_hash("s")
    return [
        f"list_aggregate(list_transform({shingles_expr}, s -> ({a} * {th} + {b}) % {MINHASH_P}), 'min')"
        for a, b in MINHASH_PERMS
    ]


def sql_band_hash(sig_exprs: list[str]) -> list[str]:
    out = []
    for band in range(LSH_BANDS):
        cols = sig_exprs[band * LSH_ROWS_PER_BAND : (band + 1) * LSH_ROWS_PER_BAND]
        concat = ", ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        out.append(f"md5(concat_ws(',', {concat}))")
    return out


def sql_token_hash_list(toks_expr: str) -> str:
    """List of token hashes — bind to a CTE column, then feed sql_simhash_sum."""
    th = sql_token_hash("t")
    return f"list_transform({toks_expr}, t -> {th})"


def sql_simhash_sum(hs_col: str, bits: int = SIMHASH_BITS) -> str:
    """Majority-vote bit sum over a precomputed hash-list column."""
    terms = []
    for j in range(bits):
        ones = f"len(list_filter({hs_col}, h -> (h & {1 << j}) != 0))"
        terms.append(f"(CASE WHEN {ones} * 2 > len({hs_col}) THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)
