"""analytics19 mechanics: parameter binding pushes down like
literals, and the SQL script equals its CTE twin."""

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.plans import formatted_plan
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_param_sql_pushes_down_and_matches_dataframe(spark):
    """Bound :params must behave exactly like literals: the p_size
    filter reaches the scan, and the result equals the DataFrame
    twin."""
    from sparkml_som_spark.operators.analytics19 import (
        _PARAM_MIN_SIZE,
        _PARAM_TYPE_PREFIX,
    )

    reg = _registry()
    df = reg["param_sql_part_stats"].fn(spark, SF)
    plan = formatted_plan(df)
    assert "PushedFilters" in plan and "p_size" in plan, plan
    got = {r["p_brand"]: (r["n_parts"], r["avg_price"]) for r in df.collect()}
    part = load_table(spark, SF, "part")
    want = {
        r["p_brand"]: (r["n_parts"], r["avg_price"])
        for r in (
            part.where(
                (F.col("p_size") >= _PARAM_MIN_SIZE)
                & F.col("p_type").startswith(_PARAM_TYPE_PREFIX)
            )
            .groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n_parts"),
                F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            )
            .collect()
        )
    }
    assert got == want


def test_sql_script_equals_cte_twin(spark):
    """The scripted report (DECLARE/SET variable) must equal the
    single-statement CTE formulation."""
    reg = _registry()
    got = {
        r["band"]: (r["n_orders"], r["band_value"])
        for r in reg["sql_script_price_band_report"].fn(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    avg_price = o.agg(F.avg("o_totalprice")).collect()[0][0]
    band = (
        F.when(F.col("o_totalprice") >= 2 * avg_price, "high")
        .when(F.col("o_totalprice") >= avg_price, "above")
        .otherwise("below")
    )
    want = {
        r["band"]: (r["n_orders"], r["band_value"])
        for r in (
            o.groupBy(band.alias("band"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 4).alias("band_value"),
            )
            .collect()
        )
    }
    assert got == want
