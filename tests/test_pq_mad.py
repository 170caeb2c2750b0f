"""pq_encode / mad_outliers tests."""

import datetime


def test_pq_codes_and_reconstruction(spark):
    from waka_spark.operators.ann import pq_encode

    # two tight direction bundles per subspace: vectors 0-2 vs 3-5
    rows = [
        (0, [1.0, 0.0, 0.0, 1.0]), (1, [0.99, 0.01, 0.02, 0.98]),
        (2, [1.0, 0.02, 0.01, 1.0]),
        (3, [0.0, 1.0, 1.0, 0.0]), (4, [0.01, 0.99, 0.98, 0.02]),
        (5, [0.0, 1.0, 1.0, 0.01]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (list(r["code"]), r["recon_mse"])
           for r in pq_encode(emb, m=2, k=2, n_iters=2).collect()}
    assert len(got) == 6
    assert all(len(c) == 2 for c, _ in got.values())
    # bundle members share codes; the two bundles differ
    assert got[0][0] == got[1][0] == got[2][0]
    assert got[3][0] == got[4][0] == got[5][0]
    assert got[0][0] != got[3][0]
    # tight bundles reconstruct well
    assert all(mse < 0.01 for _, mse in got.values())


def test_pq_identical_vectors_zero_error(spark):
    from waka_spark.operators.ann import pq_encode

    emb = spark.createDataFrame(
        [(i, [2.0, -1.0, 0.5, 3.0]) for i in range(5)],
        "vec_id long, embedding array<double>")
    rows = pq_encode(emb, m=2, k=2, n_iters=1).collect()
    assert all(r["recon_mse"] == 0.0 for r in rows)


def test_mad_outliers_flags_spike_not_masked_by_it(spark):
    from waka_spark.operators.temporal import mad_outliers

    t = datetime.datetime(2024, 1, 1)
    # 9 values near 10, one absurd spike; the spike must be flagged and
    # must not drag the center (which a mean/stddev screen would allow)
    vals = [9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 11.0, 9.8, 10.2, 1000.0]
    events = spark.createDataFrame(
        [(i, t, 1, "click", v) for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    flagged = mad_outliers(events, threshold=3.0).collect()
    assert [r["id"] for r in flagged] == [9]
    assert flagged[0]["med"] == 10.0
    assert flagged[0]["dev_ratio"] > 100


def test_mad_zero_mad_degeneracy_kept_with_null_ratio(spark):
    from waka_spark.operators.temporal import mad_outliers

    t = datetime.datetime(2024, 1, 1)
    vals = [5.0] * 6 + [7.0]     # MAD = 0, the 7.0 deviates
    events = spark.createDataFrame(
        [(i, t, 1, "view", v) for i, v in enumerate(vals)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double")
    flagged = mad_outliers(events).collect()
    assert [r["id"] for r in flagged] == [6]
    assert flagged[0]["dev_ratio"] is None
    assert flagged[0]["mad"] == 0.0


def test_pq_adc_matches_exact_on_separable_data(spark):
    from waka_spark.operators.ann import pq_adc_topk

    # 12 vectors in 4d, two subspaces; candidates cover the whole corpus
    # so ADC prune cannot drop the true top-k -> result == exact L2 top-k
    rows = [(i, [float((i * 3) % 5), float((i + 1) % 7),
                 float((i * 2 + 3) % 4), float(i % 3)])
            for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 2").selectExpr(
        "vec_id as q_id", "embedding as q_vec")
    got = pq_adc_topk(emb, q, m=2, k=4, n_iters=2,
                      n_candidates=12, topk=3).collect()

    import numpy as np
    vecs = {i: np.array(v) for i, v in rows}
    for q_id in (0, 1):
        dists = sorted(
            (round(float(((vecs[q_id] - vecs[i]) ** 2).sum()), 6), i)
            for i in vecs if i != q_id)
        expect = [i for _, i in dists[:3]]
        mine = [r["vec_id"] for r in sorted(
            (r for r in got if r["q_id"] == q_id), key=lambda r: r["rank"])]
        assert mine == expect, q_id
