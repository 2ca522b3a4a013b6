"""Relational analytics demos over the driver's TPC-H-ish star schema +
events stream table — the general-purpose query surface (joins, multi-way
star joins with broadcast dims, grouped aggregates, windows,
sessionization) a user of the reference's data would expect from a
replacement engine.

Plan notes:
- nation/region are broadcast (dozens of rows) — no shuffle for the
  rollup's dimension side;
- the Q3-style join orders customer (filtered) -> orders -> lineitem so
  Catalyst can push the segment/date filters into the scans
  (PushedFilters visible in .explain);
- sessionization is the lag-over-user window pattern: one shuffle on
  user_id, gap -> boundary flag -> running sum = session id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1 analog: per (returnflag, linestatus) pricing rollup."""
    # compare in the NTZ domain: parquet timestamps are TIMESTAMP_NTZ and
    # a plain timestamp literal would coerce through the SESSION timezone
    # (wrong answers if the driver's session is not UTC)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1995-03-15",
) -> DataFrame:
    """TPC-H Q3 analog: top-10 unshipped orders by revenue."""
    cut = F.lit(cutoff).cast("timestamp_ntz")
    return (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cut)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cut)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def region_rollup(
    region: DataFrame, nation: DataFrame, customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Star rollup through broadcast dims: per-region customer/supplier
    counts and account balances."""
    dim = F.broadcast(
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    ).select("n_nationkey", "r_name")
    cust = (
        customer.join(dim, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("cust_acctbal"),
        )
    )
    supp = (
        supplier.join(dim, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("supp_acctbal"),
        )
    )
    return cust.join(supp, "r_name", "full_outer").na.fill(
        {"n_customers": 0, "n_suppliers": 0, "cust_acctbal": 0.0, "supp_acctbal": 0.0}
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event sessionization: per-user sessions split on inactivity gaps.
    Returns (user_id, session_id, n_events, session_start, session_end,
    total_value)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    # ts is TIMESTAMP_NTZ (parquet): derive wall-clock epoch seconds from
    # date/time PARTS — timezone-independent on NTZ (a cast through
    # TIMESTAMP would coerce via the session timezone and shift results
    # if the harness session is not UTC; DST hours would corrupt gaps)
    epoch = (
        F.unix_date(F.to_date("ts")) * F.lit(86400).cast("long")
        + F.hour("ts") * 3600
        + F.minute("ts") * 60
        + F.second("ts")
    )
    boundary = (epoch - F.lag(epoch).over(w) > gap).cast("int")
    sessions = (
        events.withColumn("is_new", F.coalesce(boundary, F.lit(1)))
        .withColumn("session_seq", F.sum("is_new").over(w))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .withColumn("session_id", F.concat_ws("#", "user_id", "session_seq"))
        .select(
            "user_id", "session_id", "n_events", "session_start", "session_end",
            "total_value",
        )
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """Per event_type histogram + value stats (A3/A10 analog over the
    stream table): count, distinct users, median and stddev of value."""
    return events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        F.round(F.stddev("value"), 4).alias("stddev_value"),
    )
