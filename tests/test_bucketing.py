"""Bucketing: the co-located-join strategy for the 100 TB media store
(SURVEY §2.3 J6: 'bucket media by media_ref to make the join co-located').
A bucketed+sorted pair of tables must sort-merge join with ZERO exchanges."""

from __future__ import annotations

import uuid

import pytest


def test_bucketed_join_has_no_exchange(spark, sf_tiny):
    li = spark.read.parquet(f"{sf_tiny}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{sf_tiny}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    suffix = uuid.uuid4().hex[:8]
    t1, t2 = f"li_b_{suffix}", f"od_b_{suffix}"
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(t1)
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(t2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a, b = spark.table(t1), spark.table(t2)
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        # and it actually computes the right thing
        expected = (
            li.join(od, li.l_orderkey == od.o_orderkey).count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")
