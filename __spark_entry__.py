"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``sparkml_som_spark``; this module is glue
over its operator registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Fits a 5x5 SOM on the embeddings table and returns per-cell
    occupancy + dominant label — the reference's full pipeline
    (fit → transform → summarize) as one query.  (The registered
    `som_cluster_summary` entry surfaces the same computation's
    conservation invariants so the driver can value-hash it; the
    per-cell view lives here.)"""
    from sparkml_som_spark.operators.registry import load_all
    from sparkml_som_spark.operators.som_queries import som_cell_summary

    load_all()
    return som_cell_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sparkml_som_spark.operators.registry import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    from sparkml_som_spark.operators.registry import load_all

    return {
        name: spec.sql for name, spec in load_all().items() if spec.sql is not None
    }
