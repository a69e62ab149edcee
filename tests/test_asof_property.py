"""Property-based test: the union+carry-forward as-of join agrees with
pandas.merge_asof (an independent implementation) on randomized inputs,
including duplicate timestamps, keys with no matches, and empty sides."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkml_som_spark.operators.asof import asof_join_backward

BASE = dt.datetime(2024, 1, 1)


def _mk_rows(spec):
    return [(key, BASE + dt.timedelta(minutes=m), i) for i, (key, m) in enumerate(spec)]


@st.composite
def asof_case(draw):
    keys = st.integers(min_value=0, max_value=3)
    minutes = st.integers(min_value=0, max_value=500)
    left = draw(st.lists(st.tuples(keys, minutes), min_size=1, max_size=25))
    right = draw(st.lists(st.tuples(keys, minutes), min_size=0, max_size=25))
    return left, right


@given(asof_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, case):
    left_spec, right_spec = case
    left = spark.createDataFrame(
        _mk_rows(left_spec), "k long, ts timestamp, lid long"
    )
    right_rows = [(k, BASE + dt.timedelta(minutes=m)) for k, m in right_spec]
    right = spark.createDataFrame(
        right_rows or [(None, None)], "k long, rts timestamp"
    ).where("k is not null")

    got = asof_join_backward(
        left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["rts"]
    ).collect()
    got_map = {r["lid"]: r["rts_asof"] for r in got}

    lp = pd.DataFrame(_mk_rows(left_spec), columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(right_rows, columns=["k", "rts"]).sort_values("rts", kind="stable")
        if right_rows
        else pd.DataFrame({"k": pd.Series(dtype="int64"), "rts": pd.Series(dtype="datetime64[ns]")})
    )
    want = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    want_map = {
        int(r.lid): (None if pd.isna(r.rts) else r.rts.to_pydatetime())
        for r in want.itertuples()
    }
    assert len(got_map) == len(left_spec)
    assert got_map == want_map
