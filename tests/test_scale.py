"""Scale-helper tests: bucketed joins eliminate the shuffle; salted
aggregation/join match their plain equivalents exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_spark.operators.scale import salted_agg, salted_join, write_bucketed
from vectordb_spark.plans.audit import plan_of

SF = "/root/testdata/sf0.001"


def test_bucketed_join_no_exchange(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed(li, str(tmp_path / "li"), "b_lineitem", "l_orderkey", 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        str(tmp_path / "o"),
        "b_orders",
        "l_orderkey",
        8,
    )
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    joined = bl.hint("MERGE").join(bo, "l_orderkey")
    plan = plan_of(joined)
    # co-located bucketed sides: the sort-merge join needs no Exchange
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    # and it returns the right rows
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == expected
    spark.sql("DROP TABLE b_lineitem")
    spark.sql("DROP TABLE b_orders")


def test_salted_agg_matches_plain(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    plain = {
        (r.event_type): (r.n, r.mx)
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r.event_type): (r.n, r.mx)
        for r in salted_agg(
            e, "event_type", "event_id", {"n": "count", "mx": "max:value"}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey", "o_orderkey", n_salts=8).count()
    assert salted == plain
