"""Reusable column-expression helpers.

Everything here stays JVM-side (built-in higher-order functions, no
Python UDFs) so it participates in whole-stage codegen — the hot-path
rule from SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def asum(a: Column) -> Column:
    """Sum of an array<double> column's elements (JVM-side fold)."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (JVM-side fold)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column) -> Column:
    """Squared L2 norm of an array<double> column."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def word_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(text), " ")


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-token shingles joined by single spaces.

    Built as an elementwise `zip_with` chain over shifted O(m) slices —
    the per-index `transform(sequence, i -> slice(t, i, n))` form does
    an O(m) slice per position (O(m^2) per doc) and measured 3.4x
    slower for the shingle pass itself at sf0.1 (2.10 s -> 0.61 s; the
    dedup queries around it are join-bound, so their end-to-end gain is
    smaller).  Guarded for docs shorter than n tokens."""
    m = F.size(tokens)
    acc = tokens
    for k in range(1, n):
        ln = F.greatest(m - k, F.lit(0))
        acc = F.zip_with(
            F.slice(acc, 1, ln),
            F.slice(tokens, k + 1, ln),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(m >= n, F.array_distinct(acc)).otherwise(
        F.array().cast("array<string>")
    )


def word_grams_positional(tokens: Column, n: int) -> Column:
    """ORDERED n-token grams joined by single spaces — element i is the
    gram starting at token position i (0-based), so `posexplode` over
    the result yields (start_pos, gram).  Same zip_with-chain build as
    `word_shingles` (O(m) per shift, not O(m^2) per doc) but WITHOUT
    array_distinct: position identity is the point — the substring-run
    dedup chains grams along document diagonals.  Docs shorter than n
    tokens yield an empty array."""
    m = F.size(tokens)
    acc = tokens
    for k in range(1, n):
        ln = F.greatest(m - k, F.lit(0))
        acc = F.zip_with(
            F.slice(acc, 1, ln),
            F.slice(tokens, k + 1, ln),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(m >= n, acc).otherwise(F.array().cast("array<string>"))


def hash_bottom_k(df, part_cols, k: int, id_col: str = "vec_id"):
    """Per-group bottom-k rows under the (md5(id-as-string), id) total
    order — the MERGE-INVARIANT selection (min-k(A u B) =
    min-k(min-k(A) u B)) that the streaming admission probe state, the
    stratified reservoir, and their DuckDB replay oracles all rely on.
    ONE shared implementation keeps the order key identical at every
    site; editing the key here is editing the operator==oracle identity
    and must be mirrored in the oracles' ORDER BY md5(CAST(id AS
    VARCHAR)), id.  For a GLOBAL (ungrouped) bottom-k prefer
    orderBy(md5..).limit(k) — TakeOrderedAndProject — over an
    empty-partition window, which would run on one task."""
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_hbk_rk", F.row_number().over(w))
        .where(F.col("_hbk_rk") <= k)
        .drop("_hbk_rk")
    )


def round_half_away(x: float, digits: int = 4) -> float:
    """Python-side half-away-from-zero rounding on the BINARY double —
    i.e. the DuckDB / C `round()` contract our oracles compare against.
    (Spark's F.round on doubles goes through BigDecimal.valueOf — the
    SHORTEST-DECIMAL repr — so it can differ on values like 2.675 that
    have no exact binary form; this helper deliberately matches the
    oracle, not F.round.)  The built-in Python round() is half-to-even,
    which disagrees on exact .5 boundaries — use this in any pandas UDF
    whose output is hash-compared against the DuckDB oracle's ROUND."""
    import math

    scale = 10**digits
    return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)
