"""Skew/bucketing operator tests: salted results must equal unsalted;
bucketed joins must not shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from bda_spadochrony_spark.operators.skew import (salted_agg, salted_join,
                                                  write_bucketed)


def _skewed_df(spark):
    hot = [("hot", float(i % 10)) for i in range(5000)]
    cold = [(f"k{i}", float(i)) for i in range(50)]
    return spark.createDataFrame(hot + cold, ["k", "v"])


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {(r["k"]): (r["cnt"], round(r["sum_v"], 6)) for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"),
                                 F.sum("v").alias("sum_v")).collect()}
    salted = {(r["k"]): (r["cnt"], round(r["sum_v"], 6)) for r in
              salted_agg(df, ["k"],
                         measures=[F.count(F.lit(1)).alias("c"),
                                   F.sum("v").alias("s")],
                         final_measures=[F.sum("c").alias("cnt"),
                                         F.sum("s").alias("sum_v")]).collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k7", "K7")], ["k", "label"])
    plain = sorted(map(tuple, fact.join(dim, "k").select("k", "v", "label").collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, ["k"])
                        .select("k", "v", "label").collect()))
    assert plain == salted
    assert len(plain) == 5002


def test_bucketed_join_has_no_shuffle(spark):
    a = spark.range(0, 10000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("vb", F.col("id") * 3)
    write_bucketed(a, "bkt_a", ["id"], num_buckets=8)
    write_bucketed(b, "bkt_b", ["id"], num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path (small test tables would broadcast and
        # the planner then ignores bucketing entirely)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        joined = ta.join(tb, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan          # bucket-local join, zero shuffle
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_partition_pruning_static_and_dynamic(spark):
    """Date-partitioned lake layout: a static date filter prunes partitions
    at plan time; a join against a small date dim triggers dynamic
    partition pruning (DPP) so the fact scan reads only matching dirs."""
    import shutil
    import tempfile

    from bda_spadochrony_spark.sources.readers import scan
    from bda_spadochrony_spark.sources.writers import write_parquet

    lake = tempfile.mkdtemp(prefix="bda_dpp_")
    try:
        ev = scan(spark, "/root/testdata/sf0.001/events.parquet") \
            .withColumn("date", F.to_date("ts"))
        write_parquet(ev, lake, partition_by=["date"])
        part = spark.read.parquet(lake)
        n_dates = part.select("date").distinct().count()

        # static pruning: one date selected -> scan lists 1 of n partitions
        one = part.where(F.col("date") == ev.select(F.min("date")).first()[0])
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert one.count() > 0

        # dynamic pruning: join against a tiny independent dim carrying a
        # SELECTIVE filter on its side (DPP requires one) -> the fact scan
        # gets a dynamicpruning partition filter at runtime
        import datetime as _dt
        dates = [r[0] for r in part.select("date").distinct().limit(2).collect()]
        dim_rows = [(d, 1) for d in dates] + [(_dt.date(1999, 1, 1), 0)]
        dim = spark.createDataFrame(dim_rows, ["date", "flag"]) \
                   .where(F.col("flag") == 1)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1048576")
            joined = part.join(dim.hint("broadcast"), "date")
            jplan = joined._jdf.queryExecution().executedPlan().toString()
            assert "dynamicpruning" in jplan.lower()
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert n_dates >= 2
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """The 100 TB fact-dim shuffle-join path: a selective filter on the
    creation side makes Spark build a bloom_filter_agg of the join keys
    and inject might_contain() into the fact side BEFORE its shuffle.
    Default-on (session.py pins it); only the 10 GB application-side scan
    threshold keeps it quiet at test scale (and the rule needs file-source
    stats, hence parquet inputs), so the test lowers the threshold and
    asserts both the plan shape and result parity with the filter off."""
    from tests.conftest import SF_SMALL
    from bda_spadochrony_spark.sources.readers import scan
    li = scan(spark, f"{SF_SMALL}/lineitem.parquet")
    orders = (scan(spark, f"{SF_SMALL}/orders.parquet")
              .where(F.col("o_orderpriority") == "1-URGENT"))
    expected = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                .count())  # broadcast plan, no bloom — the parity baseline
    prev_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_t = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        n_bloom = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_b)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_t)
    assert n_bloom == expected > 0  # bloom prunes, never drops matches
