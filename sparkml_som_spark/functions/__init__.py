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

    `sequence(1, size-n+1)` indexes are 1-based to match SQL slicing in
    the DuckDB oracle. Guarded for docs shorter than n tokens — Spark's
    sequence(1, 0) counts DOWN instead of yielding empty."""
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
        )
    )
    return F.when(F.size(tokens) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )
