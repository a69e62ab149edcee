"""analytics25 mechanics: gains-table identities, information-gain
bounds, and a pandas replay of Cohen's kappa over the langid
confusion."""

from sparkml_som_spark.operators.registry import load_all

SF = "/root/testdata/sf0.001"


def _registry():
    return load_all()


def test_gains_table_identities(spark):
    """Gain is monotone in targeted share, ends at exactly (1.0, 1.0),
    and lift * targeted_share == gain on every row."""
    reg = _registry()
    rows = reg["gains_lift_price_bands"].fn(spark, SF).collect()
    rows.sort(key=lambda r: -r.band)  # targeting order: top band first
    prev = 0.0
    for r in rows:
        assert r.gain >= prev - 1e-9
        prev = r.gain
        assert 0.0 <= r.gain <= 1.0 and 0.0 < r.targeted_share <= 1.0
        assert abs(r.lift * r.targeted_share - r.gain) < 5e-6
    assert rows[-1].gain == 1.0 and rows[-1].targeted_share == 1.0
    total_pos = sum(r.n_urgent for r in rows)
    assert rows[-1].n_orders >= 0 and total_pos > 0


def test_info_gain_bounds(spark):
    """All features see the same label entropy, and 0 <= IG <= H(label)
    (within the 5-decimal rounding slack)."""
    reg = _registry()
    rows = reg["info_gain_urgency_features"].fn(spark, SF).collect()
    assert {r.feature for r in rows} == {"price_band", "order_month", "mktsegment"}
    hs = {r.h_label for r in rows}
    assert len(hs) == 1
    h = hs.pop()
    for r in rows:
        assert -1e-4 <= r.info_gain <= h + 1e-4
        assert r.n_bands >= 2


def test_kappa_matches_pandas_replay(spark):
    """Kappa must equal the direct confusion-matrix formula computed in
    pandas from the same langid predictions."""
    from sparkml_som_spark.operators.text import text_langid_ngram

    reg = _registry()
    row = reg["kappa_langid_agreement"].fn(spark, SF).collect()[0]
    pred = text_langid_ngram(spark, SF).toPandas()
    gold = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .toPandas()
    )
    df = pred.merge(gold, on="doc_id")
    n = len(df)
    po = (df.predicted_lang == df.lang).mean()
    gm = df.lang.value_counts()
    pm = df.predicted_lang.value_counts()
    pe = sum(gm.get(c, 0) * pm.get(c, 0) for c in set(gm.index) | set(pm.index)) / (
        n * n
    )
    kappa = (po - pe) / (1.0 - pe)
    assert row.n_docs == n
    assert abs(row.accuracy - round(po, 6)) < 1e-9
    assert abs(row.kappa - round(kappa, 6)) < 1e-6
