"""random_walks / cooccurrence_pmi / containment_pairs /
validity_intervals operator tests."""

import datetime
import math


def test_random_walks_are_valid_paths_and_deterministic(spark):
    from waka_spark.operators.graph import random_walks, symmetrize

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)],
        "doc_a long, doc_b long")
    edges = symmetrize(pairs)
    nbrs = {}
    for r in edges.collect():
        nbrs.setdefault(r["src"], set()).add(r["dst"])

    def walk_map(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
        return out

    w1 = walk_map(random_walks(edges, length=3))
    w2 = walk_map(random_walks(edges.repartition(7), length=3))
    assert w1 == w2  # partitioning-independent

    assert set(w1) == {1, 2, 3, 4}
    for start, steps in w1.items():
        assert steps[0] == start
        assert set(steps) == {0, 1, 2, 3}
        for s in range(1, 4):
            assert steps[s] in nbrs[steps[s - 1]], (start, s)


def test_cooccurrence_pmi_hand_computed(spark):
    from waka_spark.operators.graph import cooccurrence_pmi

    # 4 groups: {a,b} {a,b} {a,c} {c}
    occ = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
         ("g3", "a"), ("g3", "c"), ("g4", "c"), ("g4", "c")],
        "conv_id string, url string")
    got = {(r["item_a"], r["item_b"]): (r["n_ab"], r["pmi"])
           for r in cooccurrence_pmi(occ).collect()}
    # n(a)=3, n(b)=2, n(c)=2, N=4; duplicate (g4,c) collapses
    assert got[("a", "b")][0] == 2
    assert abs(got[("a", "b")][1] - round(math.log(2 * 4 / (3 * 2)), 6)) < 1e-9
    assert got[("a", "c")][0] == 1
    assert abs(got[("a", "c")][1] - round(math.log(1 * 4 / (3 * 2)), 6)) < 1e-9
    assert ("b", "c") not in got  # never co-occur


def test_containment_catches_subset_jaccard_misses(spark):
    from waka_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string")

    cont = containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["cont_a"] == 1.0      # every shingle of short is in long
    assert row["cont_b"] < 0.2

    # Jaccard at the same strictness finds nothing
    assert ngram_jaccard_pairs(docs, threshold=0.9).count() == 0


def test_validity_intervals_scd2(spark):
    from waka_spark.operators.temporal import validity_intervals

    t = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t + datetime.timedelta(minutes=m)

    events = spark.createDataFrame(
        [
            (1, "active", ts(0)),
            (1, "active", ts(5)),     # no change — absorbed
            (1, "idle", ts(10)),
            (1, "active", ts(20)),
            (2, "idle", ts(3)),
        ],
        "user_id long, event_type string, ts timestamp")
    rows = {
        (r["key"], r["valid_from"]): (r["state"], r["valid_to"])
        for r in validity_intervals(events).collect()
    }
    assert rows[(1, ts(0))] == ("active", ts(10))
    assert rows[(1, ts(10))] == ("idle", ts(20))
    assert rows[(1, ts(20))] == ("active", None)
    assert rows[(2, ts(3))] == ("idle", None)
    assert len(rows) == 4


def test_validity_intervals_single_shuffle(spark):
    """lag + lead reuse one (key x ts) partitioning — exactly one Exchange."""
    from waka_spark.operators.temporal import validity_intervals

    events = spark.createDataFrame(
        [(1, "a", datetime.datetime(2024, 1, 1))],
        "user_id long, event_type string, ts timestamp")
    plan = (
        validity_intervals(events)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
