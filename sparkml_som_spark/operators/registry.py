"""Query registry backing the driver contract (`__spark_entry__.py`).

Every operator the engine claims ships as a named entry: a PySpark
builder ``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL for the DuckDB oracle. Column names/aliases must
match exactly between the two — the driver's compare hashes values
after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => driver records rows-only check
    desc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def materialize_small(df: DataFrame, cleanup: tuple = ()) -> DataFrame:
    """Collect a SMALL result, release held resources (persisted
    DataFrames / broadcasts), and return an equivalent fresh DataFrame.

    Queries that persist an intermediate for multi-action summaries
    would otherwise leak cache for the rest of the session (the caller
    collects after we return, so there is no later unpersist point).
    Only use when the result is bounded (grid cells, top-k, per-doc
    rows) — it pins the result on the driver."""
    spark = df.sparkSession
    rows = df.collect()
    for h in cleanup:
        # Broadcast has both destroy and unpersist — destroy is the full
        # release; DataFrames only have unpersist
        if hasattr(h, "destroy"):
            h.destroy()
        elif hasattr(h, "unpersist"):
            h.unpersist()
    return spark.createDataFrame(rows, df.schema)


def register(name: str, sql: str | None = None, desc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, desc=desc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its @register calls run."""
    import sparkml_som_spark.operators.dedup  # noqa: F401
    import sparkml_som_spark.operators.relational  # noqa: F401
    import sparkml_som_spark.operators.relational2  # noqa: F401
    import sparkml_som_spark.operators.relational3  # noqa: F401
    import sparkml_som_spark.operators.similarity  # noqa: F401
    import sparkml_som_spark.operators.som_queries  # noqa: F401
    import sparkml_som_spark.operators.stats  # noqa: F401
    import sparkml_som_spark.operators.text  # noqa: F401
    import sparkml_som_spark.operators.text_pipeline  # noqa: F401
    import sparkml_som_spark.operators.windows  # noqa: F401

    return REGISTRY
