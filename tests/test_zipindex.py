"""plans/zipindex.py — global rank / prefix sums without a
single-partition window: exact equality with the global-window answer,
plan-shape pin, and edge cases."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from waka_spark.plans.zipindex import with_global_order_stats


def test_rank_matches_global_window(spark):
    df = spark.createDataFrame(
        [(i % 7, f"w{i}") for i in range(200)], "freq int, word string")
    got = with_global_order_stats(
        df, [F.col("freq").desc(), F.col("word").asc()],
        rank_col="rank", n_parts=5)
    want = df.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("word").asc()))
        .cast("long"))
    assert sorted(map(tuple, got.select("freq", "word", "rank").collect())) \
        == sorted(map(tuple, want.select("freq", "word", "rank").collect()))


def test_prefix_sum_matches_global_window(spark):
    df = spark.createDataFrame(
        [(float(i), i % 3) for i in range(100)], "s double, n int")
    got = with_global_order_stats(
        df, [F.col("s").asc()], rank_col=None,
        prefix_sums={"n": "n_below"}, n_parts=4)
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn(
        "n_below", F.coalesce(F.sum("n").over(w), F.lit(0)))
    assert sorted(map(tuple, got.select("s", "n_below").collect())) \
        == sorted(map(tuple, want.select("s", "n_below").collect()))


def test_rank_start_and_fractional_prefix(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k int, v double")
    got = with_global_order_stats(
        df, [F.col("k").asc()], rank_col="idx", rank_start=0,
        prefix_sums={"v": "v_before"}, n_parts=3)
    rows = {r["k"]: (r["idx"], r["v_before"]) for r in got.collect()}
    assert rows[0] == (0, 0.0)
    assert rows[9] == (9, pytest.approx(sum(range(9))))


def test_empty_input(spark):
    df = spark.createDataFrame([], "k int, v int")
    got = with_global_order_stats(
        df, [F.col("k")], rank_col="rank", prefix_sums={"v": "pv"})
    assert got.count() == 0


def test_no_single_partition_window(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k int")
    plan = with_global_order_stats(df, [F.col("k")], n_parts=4) \
        ._jdf.queryExecution().executedPlan().toString()
    norm = plan.lower().replace(" ", "")
    assert "partitionspec=[]" not in norm


def test_pin_scope_releases_only_scope_pins(spark):
    from waka_spark.plans.pins import pin, pin_scope

    outside = pin(spark.range(10))
    outside.count()
    with pin_scope():
        inside = pin(spark.range(20))
        inside.count()
        assert inside.storageLevel.useMemory
    assert not inside.storageLevel.useMemory  # released on exit
    assert outside.storageLevel.useMemory     # untouched
    outside.unpersist()
