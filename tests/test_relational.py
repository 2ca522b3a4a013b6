"""Relational operator unit tests (sessionization edge cases; rollup)."""

import datetime as dt

from pdf2ontology_spark.operators import relational


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m if m < 60 else m % 60) + dt.timedelta(
        hours=m // 60
    )


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: events at 0min, 29min (same session), 60min (> 30min gap -> new)
        (1, _ts(0), 1, "a", 1.0),
        (2, _ts(29), 1, "a", 2.0),
        (3, _ts(60), 1, "a", 4.0),
        # user 2: single event
        (4, _ts(5), 2, "b", 8.0),
        # user 3: exactly 30min gap -> NOT a new session (strictly greater)
        (5, _ts(0), 3, "c", 1.0),
        (6, _ts(30), 3, "c", 1.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = relational.sessionize(events, gap_minutes=30).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2
    assert sorted(s.n_events for s in by_user[1]) == [1, 2]
    assert len(by_user[2]) == 1 and by_user[2][0].total_value == 8.0
    assert len(by_user[3]) == 1 and by_user[3][0].n_events == 2


def test_region_rollup_counts(spark):
    region = spark.createDataFrame([(0, "EU"), (1, "NA")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "DE", 0), (1, "US", 1)], "n_nationkey int, n_name string, n_regionkey int"
    )
    customer = spark.createDataFrame(
        [(1, "c1", 0, 10.0, "X"), (2, "c2", 0, 5.0, "X"), (3, "c3", 1, 1.0, "X")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 1, 7.0)], "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    )
    out = {r.r_name: r for r in relational.region_rollup(region, nation, customer, supplier).collect()}
    assert out["EU"].n_customers == 2 and out["EU"].cust_acctbal == 15.0
    assert out["EU"].n_suppliers == 0
    assert out["NA"].n_suppliers == 1 and out["NA"].supp_acctbal == 7.0
