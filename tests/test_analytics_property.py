"""Property-based tests for the round-5 analytics machinery: the
distributed prefix-max against a naive scan, interval-union merging
against a sweep line, and degree-oriented triangle counting against
brute-force enumeration — all on randomized inputs."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(-100, 100)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 9),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_max_property(spark, rows, n_parts):
    """prev_max equals the running max of all strictly-earlier rows,
    for any key distribution and any partition count."""
    from sparkml_som_spark.operators.analytics8 import distributed_prefix_max

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k long, v double"
    )
    got = {
        r["k"]: r["prev_max"]
        for r in distributed_prefix_max(df, "k", "v", n_parts=n_parts).collect()
    }
    run = float("-inf")
    for k, v in sorted(rows):
        assert got[k] == run, (k, got[k], run)
        run = max(run, float(v))


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300), st.integers(1, 60)),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_union_property(spark, spec):
    """The running-max-end island merge equals a Python sweep line on
    arbitrary (possibly duplicated, nested, touching) intervals."""
    rows = [(u, s, s + d) for u, s, d in spec]
    df = spark.createDataFrame(rows, "u long, s long, e long")
    wprev = (
        Window.partitionBy("u")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("u")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "ni",
        F.when(F.col("s") > F.max("e").over(wprev), 1)
        .when(F.max("e").over(wprev).isNull(), 1)
        .otherwise(0),
    )
    merged = (
        flagged.withColumn("isl", F.sum("ni").over(wrun))
        .groupBy("u", "isl")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("me") - F.col("ms")).alias("cov"))
    )
    got = {r["u"]: (r["n"], r["cov"]) for r in merged.collect()}
    per_user = {}
    for u, s, e in rows:
        per_user.setdefault(u, []).append((s, e))
    for u, ivs in per_user.items():
        ivs.sort()
        out = []
        for s, e in ivs:
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        assert got[u] == (len(out), sum(e - s for s, e in out)), (u, got[u], out)


@given(
    st.sets(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda t: t[0] < t[1]),
        min_size=0,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_triangle_count_property(spark, edges):
    """Degree-oriented wedge counting equals brute-force triangle
    enumeration on arbitrary small graphs (including empty and
    disconnected ones)."""
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    if not edges:
        assert expected == 0
        return
    e = spark.createDataFrame(sorted(edges), "u int, v int")
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(F.broadcast(deg).withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(F.broadcast(deg).withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    oriented = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("td"),
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), "s")
        .where(
            F.struct(F.col("e1.td"), F.col("e1.t"))
            < F.struct(F.col("e2.td"), F.col("e2.t"))
        )
        .select(F.col("e1.t").alias("ws"), F.col("e2.t").alias("wt"))
    )
    got = wedges.join(
        oriented.select(F.col("s").alias("ws"), F.col("t").alias("wt")), ["ws", "wt"]
    ).count()
    assert got == expected
