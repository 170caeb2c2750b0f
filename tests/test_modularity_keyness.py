"""modularity / keyness_terms / sample_k_per_group tests."""

from pyspark.sql import functions as F


def test_modularity_two_cliques_vs_random(spark):
    from waka_spark.operators.graph import modularity, symmetrize

    # two 3-cliques joined by one bridge edge
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "doc_a long, doc_b long")
    edges = symmetrize(pairs)
    good = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "b")],
        "node long, community string")
    r = modularity(edges, good).collect()[0]
    assert r["n_communities"] == 2
    assert r["m_edges"] == 7
    # hand computation: m_dir=14; within a: 6, d_a=7; within b: 6, d_b=7
    expect = round((6 / 14 - (7 / 14) ** 2) * 2, 6)
    assert r["modularity"] == expect
    assert r["modularity"] > 0.2

    # everyone in one community: Q = 1 - 1 = 0 exactly
    trivial = good.selectExpr("node", "'x' as community")
    assert modularity(edges, trivial).collect()[0]["modularity"] == 0.0


def test_keyness_flags_slice_specific_words(spark):
    from waka_spark.operators.textstats import keyness_terms

    docs = spark.createDataFrame(
        [
            (0, "alpha alpha alpha shared shared", "s1"),
            (1, "alpha alpha shared shared shared", "s1"),
            (2, "omega omega omega shared shared", "s2"),
            (3, "omega omega shared shared shared", "s2"),
        ],
        "doc_id long, text string, lang string")
    got = {}
    for r in keyness_terms(docs, slice_col="lang", k=2).collect():
        got.setdefault(r["slice"], []).append((r["rank"], r["word"], r["z"]))
    # each slice's most distinctive word is its exclusive one, positive z
    assert sorted(got["s1"])[0][1] == "alpha"
    assert sorted(got["s2"])[0][1] == "omega"
    assert sorted(got["s1"])[0][2] > 0
    # "shared" is balanced -> never the top keyness word
    assert all(w != "shared" or rk != 1
               for slc in got.values() for rk, w, _ in slc)


def test_sample_k_per_group_exact_counts_and_determinism(spark):
    from waka_spark.operators.curation import sample_k_per_group

    docs = spark.createDataFrame(
        [(i, f"t{i}", "g1" if i < 30 else "g2") for i in range(40)],
        "doc_id long, text string, lang string")
    s1 = sample_k_per_group(docs, "lang", k=5)
    counts = {r["lang"]: r["n"] for r in
              s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g1": 5, "g2": 5}
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sample_k_per_group(docs.repartition(7), "lang", k=5).collect()
    )
    assert ids1 == ids2  # partitioning-independent membership

    # k larger than the group: the whole group comes back
    tiny = sample_k_per_group(docs.filter("doc_id >= 30"), "lang", k=99)
    assert tiny.count() == 10


def test_weighted_sample_k_biases_toward_heavy_rows(spark):
    from waka_spark.operators.curation import weighted_sample_k_per_group

    # One group, 200 rows: even ids weigh 1000, odd ids weigh 1. With
    # k=30 the heavy half should dominate the (deterministic) draw.
    rows = [(i, "g", 1000.0 if i % 2 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    got = weighted_sample_k_per_group(
        df, group_col="grp", weight_col="w", k=30).collect()
    assert len(got) == 30
    assert sorted(r["sample_rank"] for r in got) == list(range(1, 31))
    n_heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert n_heavy >= 25

    # determinism: same draw on re-run
    again = weighted_sample_k_per_group(
        df, group_col="grp", weight_col="w", k=30).collect()
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in again}


def test_weighted_sample_k_drops_nonpositive_weights(spark):
    from waka_spark.operators.curation import weighted_sample_k_per_group

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 0.0), (3, "g", -2.0), (4, "g", 1.0)],
        "doc_id long, grp string, w double",
    )
    got = weighted_sample_k_per_group(
        df, group_col="grp", weight_col="w", k=10).collect()
    assert {r["doc_id"] for r in got} == {1, 4}
