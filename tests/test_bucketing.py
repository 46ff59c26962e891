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


def test_bucketed_media_store_never_shuffles_bytes(spark, sf_tiny):
    """The 100 TB media-store strategy from the pipeline's design note:
    bucket media by media_ref so the payload join is co-located on the
    media side — the slim ref side shuffles to meet it, the image BYTES
    never enter an exchange."""
    from kiri_ocr_spark.fixtures import build_fixture

    docs, media = build_fixture(spark, sf_tiny)
    suffix = uuid.uuid4().hex[:8]
    t = f"media_b_{suffix}"
    media.write.bucketBy(8, "media_ref").sortBy("media_ref").saveAsTable(t)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from pyspark.sql import functions as F

        refs = (
            docs.select("doc_id", F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select("doc_id", F.col("s.media_ref").alias("media_ref"))
        )
        bucketed = spark.table(t)
        j = refs.join(bucketed, "media_ref")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # every exchange in the plan is on the slim ref side: none may
        # carry the binary payload column
        exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
        assert exchanges  # the ref side does shuffle to meet the buckets
        for ln in exchanges:
            assert "png_bytes" not in ln, ln
        # row parity with the plain join
        assert j.count() == refs.join(media, "media_ref").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
