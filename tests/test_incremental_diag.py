"""Unit tests for plans/incremental.py (edge merge, negative sampling,
predicate profile) and operators/diagnostics.py (key-skew profile)."""

import pytest
from pyspark.sql import functions as F


def _triples(spark):
    return spark.createDataFrame(
        [
            ("c1", "A", "P1", "B", 0.5),
            ("c2", "A", "P1", "B", 0.9),   # same edge, higher score
            ("c2", "A", "P2", "C", 0.3),
            ("c3", "B", "P1", "C", 0.7),
        ],
        "conv_id string, subj_url string, pred_url string, obj_url string, "
        "score double",
    )


def test_edges_from_triples(spark):
    from waka_spark.plans.incremental import edges_from_triples

    rows = {
        (r["subj_url"], r["pred_url"], r["obj_url"]):
            (r["score"], r["support"], r["n_convs"])
        for r in edges_from_triples(_triples(spark)).collect()
    }
    assert rows[("A", "P1", "B")] == (0.9, 2, 2)   # max score, 2 convs
    assert rows[("A", "P2", "C")] == (0.3, 1, 1)
    assert len(rows) == 3


def test_merge_edges_equals_rebuild(spark):
    """The merge algebra: folding a delta into a base equals recomputing
    from scratch over the union of batches (disjoint conv sets)."""
    from waka_spark.plans.incremental import edges_from_triples, merge_edges

    t = _triples(spark)
    base = edges_from_triples(t.filter(F.col("conv_id") != "c3"))
    delta = edges_from_triples(t.filter(F.col("conv_id") == "c3"))
    merged = {
        tuple(r[k] for k in ("subj_url", "pred_url", "obj_url",
                             "score", "support", "n_convs"))
        for r in merge_edges(base, delta).collect()
    }
    rebuilt = {
        tuple(r[k] for k in ("subj_url", "pred_url", "obj_url",
                             "score", "support", "n_convs"))
        for r in edges_from_triples(t).collect()
    }
    assert merged == rebuilt


def test_negative_samples_deterministic_and_joined(spark):
    from waka_spark.plans.incremental import negative_samples

    t = _triples(spark)
    a = sorted(map(tuple, negative_samples(t, k=3).collect()))
    b = sorted(map(tuple, negative_samples(t, k=3).collect()))
    assert a == b                                  # reproducible
    assert len(a) == 3 * 3                         # k per distinct edge
    nodes = {"A", "B", "C"}
    for row in a:
        subj, pred, obj, neg_idx, neg_obj, degen = row
        assert neg_obj in nodes                    # corrupted to a real node
        assert degen == int(neg_obj == obj)        # flagged, not resampled


def test_key_skew_profile(spark):
    from waka_spark.operators.diagnostics import key_skew_profile

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1, "k string"
    )
    rows = key_skew_profile(df, "k", top_n=2).collect()
    assert [r["key"] for r in rows] == ["hot", "warm"]  # top-2 only
    hot = rows[0]
    assert hot["rank"] == 1 and hot["n_rows"] == 6
    assert abs(hot["share"] - 0.6) < 1e-9
    # mean key mass = 10/3; hot skew = 6 / (10/3) = 1.8
    assert abs(hot["skew_vs_mean"] - 1.8) < 1e-9


def test_key_skew_profile_is_take_ordered(spark):
    """Plan shape: the top-k must be TakeOrdered, never a global sort of
    the full key dictionary."""
    from waka_spark.operators.diagnostics import key_skew_profile

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    plan = key_skew_profile(df, "k", top_n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_nodes_from_triples(spark):
    from waka_spark.plans.incremental import nodes_from_triples

    rows = {
        r["url"]: (r["n_as_subj"], r["n_as_obj"], r["support"],
                   r["n_convs"], r["score"])
        for r in nodes_from_triples(_triples(spark)).collect()
    }
    # A: subj of 3 triples (c1, c2x2), never obj; best score 0.9
    assert rows["A"] == (3, 0, 3, 2, 0.9)
    # B: obj twice (c1, c2), subj once (c3)
    assert rows["B"] == (1, 2, 3, 3, 0.9)
    # C: obj twice (c2 P2, c3 P1)
    assert rows["C"] == (0, 2, 2, 2, 0.7)


def test_merge_nodes_equals_rebuild(spark):
    from waka_spark.plans.incremental import merge_nodes, nodes_from_triples

    t = _triples(spark)
    base = nodes_from_triples(t.filter(F.col("conv_id") != "c3"))
    delta = nodes_from_triples(t.filter(F.col("conv_id") == "c3"))
    cols = ("url", "n_as_subj", "n_as_obj", "support", "n_convs", "score")
    merged = {tuple(r[k] for k in cols)
              for r in merge_nodes(base, delta).collect()}
    rebuilt = {tuple(r[k] for k in cols)
               for r in nodes_from_triples(t).collect()}
    assert merged == rebuilt


def test_predicate_profile_functionality(spark):
    from waka_spark.plans.incremental import predicate_profile

    # p_multi: s1->{o1,o2}, s2->o1 (dup row collapses);
    # p_func: s1->o1, s2->o2 — functional AND inverse-functional.
    triples = spark.createDataFrame(
        [
            ("s1", "p_multi", "o1"), ("s1", "p_multi", "o2"),
            ("s2", "p_multi", "o1"), ("s2", "p_multi", "o1"),
            ("s1", "p_func", "o1"), ("s2", "p_func", "o2"),
        ],
        "subj_url string, pred_url string, obj_url string",
    )
    got = {r["pred_url"]: r for r in predicate_profile(triples).collect()}
    m = got["p_multi"]
    assert (m["n_edges"], m["n_subjects"], m["n_objects"]) == (3, 2, 2)
    assert (m["max_out_fanout"], m["max_in_fanout"]) == (2, 2)
    assert m["functionality"] == pytest.approx(2 / 3, abs=1e-6)
    assert m["inv_functionality"] == pytest.approx(2 / 3, abs=1e-6)
    f = got["p_func"]
    assert (f["n_edges"], f["max_out_fanout"], f["max_in_fanout"]) == (2, 1, 1)
    assert f["functionality"] == 1.0 and f["inv_functionality"] == 1.0


def test_apply_edge_changes_retract_upsert_semantics(spark):
    from waka_spark.plans.incremental import apply_edge_changes

    base = spark.createDataFrame(
        [("a", "p", "b", 0.5, 2, 2), ("a", "p", "c", 0.9, 1, 1),
         ("x", "q", "y", 0.3, 4, 3)],
        "subj_url string, pred_url string, obj_url string, "
        "score double, support long, n_convs long",
    )
    changes = spark.createDataFrame(
        [
            # plain retract
            ("a", "p", "b", None, 0, 0, "retract"),
            # retract + re-assert in one batch: upsert values alone win
            ("a", "p", "c", 0.4, 1, 1, "retract"),
            ("a", "p", "c", 0.4, 1, 1, "upsert"),
            # upsert of existing identity merges
            ("x", "q", "y", 0.8, 2, 1, "upsert"),
            # retract of an absent identity is a no-op
            ("z", "q", "z", None, 0, 0, "retract"),
            # brand-new insert
            ("n", "p", "m", 0.7, 1, 1, "upsert"),
        ],
        "subj_url string, pred_url string, obj_url string, "
        "score double, support long, n_convs long, op string",
    )
    got = {(r["subj_url"], r["pred_url"], r["obj_url"]):
           (r["score"], r["support"], r["n_convs"])
           for r in apply_edge_changes(base, changes).collect()}
    assert ("a", "p", "b") not in got
    assert got[("a", "p", "c")] == (0.4, 1, 1)  # delete-then-insert
    assert got[("x", "q", "y")] == (0.8, 6, 4)  # merge algebra
    assert got[("n", "p", "m")] == (0.7, 1, 1)
    assert ("z", "q", "z") not in got
    assert len(got) == 3
