"""Property-based test: the funnel's stage tables agree with a direct
Python reference implementation on randomized event sets — duplicate
timestamps, users missing stages, out-of-order arrival, boundary hits
at exactly +7 days."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkml_som_spark.operators.corpus_ops3 import _funnel_stages

BASE = dt.datetime(2024, 1, 1)
WINDOW = dt.timedelta(days=7)


@st.composite
def funnel_case(draw):
    users = st.integers(min_value=0, max_value=4)
    hours = st.integers(min_value=0, max_value=24 * 30)
    etypes = st.sampled_from(["signup", "click", "purchase", "view"])
    return draw(
        st.lists(st.tuples(users, etypes, hours), min_size=1, max_size=40)
    )


def _reference(events):
    """Direct per-user funnel: first signup; first click in
    [s, s+7d); first purchase in [c, c+7d)."""
    out = {}
    by_user: dict = {}
    for u, ty, h in events:
        by_user.setdefault(u, []).append((ty, BASE + dt.timedelta(hours=h)))
    for u, evs in by_user.items():
        signups = sorted(t for ty, t in evs if ty == "signup")
        if not signups:
            continue
        s = signups[0]
        clicks = sorted(t for ty, t in evs if ty == "click" and s <= t < s + WINDOW)
        c = clicks[0] if clicks else None
        p = None
        if c is not None:
            purchases = sorted(
                t for ty, t in evs if ty == "purchase" and c <= t < c + WINDOW
            )
            p = purchases[0] if purchases else None
        out[u] = (s, c, p)
    return out


@given(funnel_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_funnel_stages_match_reference(spark, events):
    rows = [
        (u, ty, BASE + dt.timedelta(hours=h)) for (u, ty, h) in events
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    s, c, p = _funnel_stages(ev)
    got_s = {r["user_id"]: r["s_ts"] for r in s.collect()}
    got_c = {r["user_id"]: r["c_ts"] for r in c.collect()}
    got_p = {r["user_id"]: r["p_ts"] for r in p.collect()}
    want = _reference(events)
    assert got_s == {u: v[0] for u, v in want.items()}
    assert got_c == {u: v[1] for u, v in want.items() if v[1] is not None}
    assert got_p == {u: v[2] for u, v in want.items() if v[2] is not None}
