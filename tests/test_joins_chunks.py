"""skew_salted_join (operators/joins.py), chunk_documents, and
random_projection: result-identity, windowing, and projection-matrix
invariants."""

import pytest
from pyspark.sql import functions as F

from waka_spark.operators.joins import skew_salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key ("hot" = 50 rows), two cold keys
    rows = [(i, "hot" if i < 50 else ("a" if i % 2 else "b"), float(i))
            for i in range(60)]
    big = spark.createDataFrame(rows, "row_id long, k string, v double")
    small = spark.createDataFrame(
        [("hot", 1), ("a", 2), ("b", 3), ("unmatched", 9)],
        "k string, w int")
    return big, small


def test_salted_join_equals_plain_join(skewed):
    big, small = skewed
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    salted = sorted(map(tuple, skew_salted_join(big, small, "k").collect()))
    assert salted == plain
    assert len(salted) == 60  # every big row matched exactly once


def test_salted_join_left_keeps_unmatched(skewed):
    big, small = skewed
    # add a big-side key absent from small
    big2 = big.union(big.sparkSession.createDataFrame(
        [(99, "nowhere", 0.0)], big.schema))
    plain = sorted(map(tuple, big2.join(small, "k", "left").collect()))
    salted = sorted(map(tuple,
                        skew_salted_join(big2, small, "k", how="left").collect()))
    assert salted == plain


def test_salted_join_salts_the_hot_key(skewed):
    big, small = skewed
    # the hot key's rows must spread across >1 salt value
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                        F.lit(8)).cast("int"))
    n = (salted.filter(F.col("k") == "hot")
         .select("_salt").distinct().count())
    assert n > 1


def test_chunk_documents_windows(spark):
    from waka_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6"), (2, "only three words")],
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_words=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_words"])
           for r in out}
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(1, 2)] == ("w6", 1)          # tail chunk runs short
    assert got[(2, 0)] == ("only three words", 3)
    assert len(got) == 4


def test_random_projection_one_hot_reads_matrix(spark):
    """proj(e_i)[j] must equal sign(i, j)/sqrt(out_dim) exactly — the
    one-hot probe reads the baked-in Rademacher matrix back out."""
    import hashlib

    from waka_spark.operators.ann import random_projection

    dim, k, i = 16, 4, 5
    vec = [0.0] * dim
    vec[i] = 1.0
    emb = spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<float>")
    [row] = random_projection(emb, in_dim=dim, out_dim=k).collect()
    for j in range(k):
        h = hashlib.md5(f"rp:{i}:{j}".encode()).hexdigest()
        sign = 1 if int(h[:2], 16) % 2 == 0 else -1
        assert row["proj"][j] == pytest.approx(sign / k ** 0.5, abs=1e-6)


def test_random_projection_is_linear(spark):
    from waka_spark.operators.ann import random_projection

    a = [float(x % 7 - 3) for x in range(16)]
    b = [float((x * 3) % 5 - 2) for x in range(16)]
    ab = [x + y for x, y in zip(a, b)]
    emb = spark.createDataFrame(
        [(0, a), (1, b), (2, ab)], "vec_id long, embedding array<float>")
    rows = {r["vec_id"]: r["proj"]
            for r in random_projection(emb, in_dim=16, out_dim=4).collect()}
    for j in range(4):
        assert rows[2][j] == pytest.approx(rows[0][j] + rows[1][j], abs=2e-6)


def test_salted_join_rejects_right_full(skewed):
    big, small = skewed
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError):
            skew_salted_join(big, small, "k", how=how)


def test_salted_join_anti_semi(skewed):
    big, small = skewed
    big2 = big.union(big.sparkSession.createDataFrame(
        [(99, "nowhere", 0.0)], big.schema))
    anti = sorted(map(tuple,
                      skew_salted_join(big2, small, "k", how="left_anti").collect()))
    assert anti == sorted(map(tuple, big2.join(small, "k", "left_anti").collect()))
    semi = sorted(map(tuple,
                      skew_salted_join(big2, small, "k", how="left_semi").collect()))
    assert semi == sorted(map(tuple, big2.join(small, "k", "left_semi").collect()))
