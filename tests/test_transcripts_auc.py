"""context_tail / loss_mask_stats / score_auc / covariance_matrix tests."""

import numpy as np
from pyspark.sql import functions as F


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_context_tail_keeps_longest_fitting_suffix(spark):
    from waka_spark.operators.transcripts import context_tail

    rows = [
        ("c1", 0, "user", "a b c d e"),        # 5 tokens — dropped
        ("c1", 1, "assistant", "f g h"),        # 3 — kept (cum 7)
        ("c1", 2, "user", "i j"),               # 2 — kept (cum 4)
        ("c1", 3, "assistant", "k l"),          # 2 — kept (cum 2)
        ("c2", 0, "user", "one"),               # 1 — kept
    ]
    got = {
        (r["conv_id"], r["turn_idx"]): (r["kept"], r["cum_tokens_from_end"])
        for r in context_tail(_tr(spark, rows), token_budget=7).collect()
    }
    assert got[("c1", 3)] == (True, 2)
    assert got[("c1", 2)] == (True, 4)
    assert got[("c1", 1)] == (True, 7)
    assert got[("c1", 0)] == (False, 12)
    assert got[("c2", 0)] == (True, 1)


def test_loss_mask_stats_counts_assistant_only(spark):
    from waka_spark.operators.transcripts import loss_mask_stats

    rows = [
        ("c1", 0, "user", "q q q"),
        ("c1", 1, "assistant", "a a"),
        ("c1", 2, "tool", "t"),
        ("c1", 3, "assistant", "b b b"),
    ]
    r = loss_mask_stats(_tr(spark, rows)).collect()[0]
    assert (r["n_turns"], r["total_tokens"], r["trained_tokens"]) == (4, 9, 5)
    assert r["mask_ratio"] == round(5 / 9, 6)


def test_score_auc_perfect_random_and_ties(spark):
    from waka_spark.operators.curation import score_auc

    perfect = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.2, False), (0.1, False)],
        "score double, label boolean")
    assert score_auc(perfect).collect()[0]["auc"] == 1.0

    inverted = spark.createDataFrame(
        [(0.1, True), (0.2, True), (0.8, False), (0.9, False)],
        "score double, label boolean")
    assert score_auc(inverted).collect()[0]["auc"] == 0.0

    # all-tied scores: AUC must be exactly 0.5 (midrank convention)
    tied = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.5, True), (0.5, False)],
        "score double, label boolean")
    assert score_auc(tied).collect()[0]["auc"] == 0.5


def test_score_auc_matches_sklearn_style_pair_count(spark):
    from waka_spark.operators.curation import score_auc

    rows = [(0.3, True), (0.3, False), (0.7, True), (0.1, False),
            (0.9, False), (0.7, True), (0.2, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    # brute-force pair counting: P(pos > neg) + 0.5 P(pos == neg)
    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    expect = round(num / (len(pos) * len(neg)), 6)
    assert score_auc(df).collect()[0]["auc"] == expect


def test_covariance_matches_numpy(spark):
    from waka_spark.operators.ann import covariance_matrix

    rng = [[float((i * 13 + j * 7) % 5) - 2.0 for j in range(4)]
           for i in range(30)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)],
        "vec_id long, embedding array<double>")
    got = {(r["i"], r["j"]): r["cov"]
           for r in covariance_matrix(emb, dim=4).collect()}
    m = np.array(rng)
    expect = np.cov(m, rowvar=False, bias=True)
    assert len(got) == 4 * 5 / 2
    for (i, j), v in got.items():
        assert abs(v - expect[i, j]) < 2e-6, (i, j)


def test_task_outcome_pairs(spark):
    from waka_spark.operators.transcripts import task_outcome_pairs

    rows = [
        ("c1", 0, "tool", "banner"),
        ("c1", 1, "user", "please do X"),
        ("c1", 2, "assistant", "working"),
        ("c1", 3, "user", "refine"),
        ("c1", 4, "assistant", "done: X"),
        ("c2", 0, "user", "solo question"),      # no assistant turn
    ]
    got = {r["conv_id"]: r for r in
           task_outcome_pairs(_tr(spark, rows)).collect()}
    assert got["c1"]["task_text"] == "please do X"
    assert got["c1"]["task_turn"] == 1
    assert got["c1"]["outcome_text"] == "done: X"
    assert got["c1"]["outcome_turn"] == 4
    assert got["c1"]["n_turns"] == 5
    assert got["c2"]["outcome_text"] is None
    assert got["c2"]["task_text"] == "solo question"


def test_boilerplate_turns_detects_cross_conv_templates(spark):
    from waka_spark.operators.transcripts import boilerplate_turns

    rows = (
        [(f"c{i}", 0, "tool", "You are  a helpful assistant.")
         for i in range(4)]
        + [(f"c{i}", 1, "user", f"unique question {i}") for i in range(4)]
        + [("c0", 2, "user", "repeated in one conv"),
           ("c0", 3, "user", "repeated in one conv")]
    )
    got = boilerplate_turns(_tr(spark, rows), min_convs=3).collect()
    assert len(got) == 1
    r = got[0]
    # whitespace-normalized surface, all 4 conversations counted
    assert r["text"] == "you are a helpful assistant."
    assert r["n_convs"] == 4 and r["n_occurrences"] == 4
