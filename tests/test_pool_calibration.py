"""pool_vectors (ann.py) and calibration_bins (curation.py)."""

import numpy as np
import pytest


def test_pool_vectors_matches_numpy_mean(spark):
    from waka_spark.operators.ann import pool_vectors

    rows = [
        ("c0", [1.0, 2.0, 3.0]),
        ("c0", [3.0, 0.0, 1.0]),
        ("c1", [10.0, 10.0, 10.0]),
    ]
    df = spark.createDataFrame(rows, "conv string, embedding array<double>")
    out = {r.group_id: (r.n_vecs, r.pooled)
           for r in pool_vectors(df, group_col="conv").collect()}
    assert out["c0"][0] == 2 and out["c1"][0] == 1
    np.testing.assert_allclose(out["c0"][1], [2.0, 1.0, 2.0])
    np.testing.assert_allclose(out["c1"][1], [10.0, 10.0, 10.0])


def test_pool_vectors_normalize_unit_norm(spark):
    from waka_spark.operators.ann import pool_vectors

    df = spark.createDataFrame(
        [("c0", [3.0, 4.0])], "conv string, embedding array<double>")
    (row,) = pool_vectors(df, group_col="conv", normalize=True).collect()
    np.testing.assert_allclose(row.pooled, [0.6, 0.8])


def test_pool_vectors_no_corpus_explode(spark):
    """The corpus must not be posexploded — pooling is one wide hash-agg;
    the plan has no Generate node."""
    from waka_spark.operators.ann import pool_vectors

    df = spark.createDataFrame(
        [("c0", [1.0, 2.0])] * 4, "conv string, embedding array<double>")
    plan = pool_vectors(df, group_col="conv")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Generate" not in plan


def test_time_weighted_avg_hand_computed(spark):
    """value 10 held 3s then 40 held 1s → twap (10·3+40·1)/4 = 17.5;
    the final observation carries no weight; single-obs key → NULL twap."""
    import datetime as dt

    from waka_spark.operators.temporal import time_weighted_avg

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(seconds=3), 40.0),
        (1, t0 + dt.timedelta(seconds=4), 999.0),  # last: weightless
        (2, t0, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double")
    out = {r.key: r for r in time_weighted_avg(df).collect()}
    assert out[1].twap == pytest.approx(17.5)
    assert out[1].n_obs == 3
    assert out[2].twap is None
    assert out[2].plain_avg == pytest.approx(7.0)


def test_time_weighted_avg_single_shuffle(spark):
    """Window and agg share one Exchange on the key."""
    import datetime as dt

    from waka_spark.operators.temporal import time_weighted_avg

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1), 1.0)],
        "user_id int, ts timestamp, value double")
    plan = time_weighted_avg(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_calibration_bins_exact(spark):
    from waka_spark.operators.curation import calibration_bins

    rows = [
        (0.05, True), (0.08, False),       # bin 0 → pos_rate 0.5
        (0.95, True), (1.0, True),          # score 1.0 clamps into bin 9
        (0.42, False),                      # bin 4
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r.bin: r for r in calibration_bins(df).collect()}
    assert set(out) == {0, 4, 9}
    assert out[0].n_docs == 2 and out[0].pos_rate == pytest.approx(0.5)
    assert out[9].n_docs == 2 and out[9].pos_rate == pytest.approx(1.0)
    assert out[4].pos_rate == 0.0
    assert out[0].mean_score == pytest.approx(0.065)


def test_pool_vectors_zero_vector_survives_normalize(spark):
    from waka_spark.operators.ann import pool_vectors

    # opposite-sign vectors mean to exactly zero: normalize must pass
    # the zero vector through, not emit x/0 -> an array of NULLs
    df = spark.createDataFrame(
        [("g", [1.0, -2.0]), ("g", [-1.0, 2.0]), ("h", [3.0, 4.0])],
        "conv_id string, embedding array<double>",
    )
    got = {r["group_id"]: r["pooled"] for r in pool_vectors(
        df, group_col="conv_id", normalize=True).collect()}
    assert got["g"] == [0.0, 0.0]
    assert got["h"] == [pytest.approx(0.6), pytest.approx(0.8)]
