"""Unit tests for the semantic quirks SURVEY §5.2(4) calls out: mode
tie-break, avg-of-avgs, null-skipping count, forward range frame,
unionByName null-fill, conform casts."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from bda_spadochrony_spark.sources.readers import conform, union_by_name
from bda_spadochrony_spark.operators.aggregates import (mode_by_struct_max,
                                                        two_level_avg)
from bda_spadochrony_spark.operators.joins import interval_join
from bda_spadochrony_spark.operators.windows import range_frame_agg, top_k_per_group
from bda_spadochrony_spark.functions.encode import one_hot


def test_mode_tiebreak_prefers_larger_value(spark):
    # 2×'a', 2×'c', 1×'b' in group 1 → tie between 'a' and 'c' → 'c' wins
    # (max(struct(count, value)) semantics, reference batch_openweather.py:12-20)
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "c"), (1, "c"), (1, "b"), (2, "b")],
        ["g", "v"])
    out = {r["g"]: r["mode_v"] for r in mode_by_struct_max(df, ["g"], "v").collect()}
    assert out == {1: "c", 2: "b"}


def test_mode_prefers_higher_count_over_value(spark):
    df = spark.createDataFrame([(1, "z"), (1, "a"), (1, "a")], ["g", "v"])
    out = mode_by_struct_max(df, ["g"], "v").collect()
    assert out[0]["mode_v"] == "a"  # count 2 beats the larger value 'z'


def test_two_level_avg_is_unweighted(spark):
    # group x: id1 avg = 10 (2 rows), id2 avg = 20 (1 row)
    # avg-of-avgs = 15.0, NOT the weighted 13.33 (reference batch_tomtom.py:114-117)
    df = spark.createDataFrame(
        [("x", "id1", 10.0), ("x", "id1", 10.0), ("x", "id2", 20.0)],
        ["g", "id", "val"])
    out = two_level_avg(df, ["g", "id"], ["g"], "val", "id",
                        avg_alias="aa", count_alias="n").collect()
    assert out[0]["aa"] == 15.0
    assert out[0]["n"] == 2


def test_forward_range_frame_includes_bounds(spark):
    # row at t=0 sums values in [0, 10]: 1+2+3 (t=0,5,10), not t=11
    df = spark.createDataFrame(
        [(0, 1.0), (5, 2.0), (10, 3.0), (11, 4.0)], ["t", "v"])
    out = range_frame_agg(df, "t", (0, 10), [(F.sum("v"), "s")])
    got = {r["t"]: r["s"] for r in out.collect()}
    assert got[0] == 6.0 and got[5] == 9.0 and got[10] == 7.0 and got[11] == 4.0


def test_union_by_name_null_fills(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "a_only"])
    b = spark.createDataFrame([(2, 3.5)], ["id", "b_only"])
    u = union_by_name(a, b)
    rows = {r["id"]: r for r in u.collect()}
    assert set(u.columns) == {"id", "a_only", "b_only"}
    assert rows[1]["b_only"] is None and rows[2]["a_only"] is None


def test_conform_casts_and_nullfills(spark):
    df = spark.createDataFrame([("1", "2.5")], ["i", "d"])
    target = StructType([
        StructField("i", IntegerType()),
        StructField("d", DoubleType()),
        StructField("missing", StringType()),
    ])
    out = conform(df, target)
    assert [f.dataType for f in out.schema.fields] == [IntegerType(), DoubleType(), StringType()]
    row = out.collect()[0]
    assert row["i"] == 1 and row["d"] == 2.5 and row["missing"] is None


def test_interval_join_bounds(spark):
    l = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 1, 0))], ["lid", "lts"])
    r = spark.createDataFrame(
        [(10, datetime(2024, 1, 1, 0, 0, 30)),   # exactly -30s → included
         (11, datetime(2024, 1, 1, 0, 1, 30)),   # exactly +30s → included
         (12, datetime(2024, 1, 1, 0, 1, 31))],  # +31s → excluded
        ["rid", "rts"])
    out = interval_join(l, r, "lts", "rts", 30.0, how="inner")
    assert sorted(x["rid"] for x in out.collect()) == [10, 11]


def test_one_hot_other_flag(spark):
    df = spark.createDataFrame([("a",), ("z",)], ["c"])
    out = one_hot(df, "c", ["a", "b"], prefix="c", other_col="c_other")
    rows = {r["c"]: r for r in out.collect()}
    assert rows["a"]["c_a"] == 1 and rows["a"]["c_other"] == 0
    assert rows["z"]["c_a"] == 0 and rows["z"]["c_other"] == 1


def test_top_k_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([5, 5, 3, 9])], ["grp", "id", "v"])
    out = top_k_per_group(df, ["grp"], [F.col("v").desc(), F.col("id").asc()], 2)
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [(0, 5.0), (3, 9.0)]


def test_asof_join_backward_and_tolerance(spark):
    from bda_spadochrony_spark.operators.asof import asof_join
    l = spark.createDataFrame(
        [(1, "u", datetime(2024, 1, 1, 0, 10, 0)),
         (2, "u", datetime(2024, 1, 1, 0, 0, 30)),
         (3, "v", datetime(2024, 1, 1, 0, 5, 0))],   # key with no right rows
        ["lid", "k", "lts"])
    r = spark.createDataFrame(
        [("u", datetime(2024, 1, 1, 0, 0, 0), 100),
         ("u", datetime(2024, 1, 1, 0, 9, 0), 101)],
        ["k", "rts", "rv"])
    out = {x["lid"]: (x["rv"], x["rts"]) for x in
           asof_join(l, r, "lts", "rts", by=["k"]).collect()}
    assert out[1][0] == 101      # latest rts <= 0:10
    assert out[2][0] == 100      # only 0:00 precedes 0:00:30
    assert out[3][0] is None     # no right side for key v
    # with 60s tolerance, lid=1 (gap 60s) still matches; lid=2 (gap 30s) too
    tol = {x["lid"]: x["rv"] for x in
           asof_join(l, r, "lts", "rts", by=["k"], tolerance_seconds=45).collect()}
    assert tol[2] == 100 and tol[1] is None  # 60s gap > 45s tolerance


def test_null_fallback_coalesce(spark):
    from bda_spadochrony_spark.functions.encode import null_fallback
    df = spark.createDataFrame(
        [(None, "b1", "c1"), ("a2", None, "c2"), (None, None, None)],
        ["a", "b", "c"])
    got = [r["pick"] for r in
           df.select(null_fallback("a", "b", "c").alias("pick")).collect()]
    assert got == ["b1", "a2", None]


def test_limit_and_first_row(spark):
    from bda_spadochrony_spark.operators.sorts import limit_rows, first_row, sort_by
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    assert limit_rows(df, 3).count() == 3
    assert limit_rows(df, 0).count() == 0
    ordered = sort_by(df, ["x"], ascending=[False])
    assert first_row(ordered)["x"] == 9
    empty = df.where("x < 0")
    assert first_row(empty) is None


def test_asof_join_rejects_overlapping_columns(spark):
    import pytest as _pytest
    from bda_spadochrony_spark.operators.asof import asof_join
    l = spark.createDataFrame([(1, "u", datetime(2024, 1, 1))], ["id", "k", "ts"])
    r = spark.createDataFrame([("u", datetime(2024, 1, 1), 5)], ["k", "ts", "v"])
    with _pytest.raises(ValueError, match="both sides"):
        asof_join(l, r, "ts", "ts", by=["k"])


def test_binned_interval_join_matches_naive_and_avoids_nested_loop(spark):
    """The bin-bucketed interval join must return exactly the naive range
    join's rows while planning as a hash join (no BroadcastNestedLoop /
    CartesianProduct) even though there is no natural equality key."""
    import datetime
    from bda_spadochrony_spark.operators.joins import (binned_interval_join,
                                                       interval_join)
    base = datetime.datetime(2024, 1, 1)
    lrows = [(i, base + datetime.timedelta(seconds=17 * i)) for i in range(80)]
    rrows = [(1000 + i, base + datetime.timedelta(seconds=11 * i + 5))
             for i in range(120)]
    left = spark.createDataFrame(lrows, ["l_id", "l_ts"])
    right = spark.createDataFrame(rrows, ["r_id", "r_ts"])
    binned = binned_interval_join(left, right, "l_ts", "r_ts", 30.0) \
        .select("l_id", "r_id")
    naive = interval_join(left, right, "l_ts", "r_ts", 30.0, how="inner") \
        .select("l_id", "r_id")
    a = sorted(map(tuple, binned.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b and len(a) > 0
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_binned_interval_join_boundary_pairs_included(spark):
    """Rows exactly at ±tolerance and rows one bin apart must be kept;
    rows just past the bound dropped."""
    import datetime
    from bda_spadochrony_spark.operators.joins import binned_interval_join
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0)], ["l_id", "l_ts"])
    right = spark.createDataFrame(
        [(10, t0 - datetime.timedelta(seconds=30)),   # at -tol: keep
         (11, t0 + datetime.timedelta(seconds=30)),   # at +tol: keep
         (12, t0 + datetime.timedelta(seconds=31)),   # past: drop
         (13, t0)],                                   # same instant: keep
        ["r_id", "r_ts"])
    got = sorted(r["r_id"] for r in
                 binned_interval_join(left, right, "l_ts", "r_ts", 30.0)
                 .collect())
    assert got == [10, 11, 13]


def test_driver_memory_env_override(monkeypatch):
    """ADVICE r6: spark.driver.memory must be overridable via
    $SPARK_GRAFT_DRIVER_MEM so cgroup-limited containers can size the
    heap below the 24g engine default instead of being OOM-killed."""
    import importlib
    from bda_spadochrony_spark import session as sess
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "4g")
    try:
        importlib.reload(sess)
        assert sess._BASE_CONF["spark.driver.memory"] == "4g"
    finally:
        monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM")
        importlib.reload(sess)
    assert sess._BASE_CONF["spark.driver.memory"] == "24g"
