"""Randomized brute-force cross-check for bigram_logprob.

The operator computes the per-doc average bigram NLL as a count-weighted
mean over *distinct* per-doc bigrams (one (doc_id, w1, w2) hash-agg feeds
the model, the context rollup, and the scoring join — see
textstats.bigram_logprob). This pins that rewrite against the plain
instance-level average a pure-Python pass computes, on seeded corpora with
heavy bigram multiplicity (tiny vocabulary, repeated words in one doc) —
exactly the regime where a weighted-mean bug would diverge.
"""

from __future__ import annotations

import math
import random

import pytest


VOCAB = ["a", "b", "c", "aa", "b"]  # duplicate "b" boosts multiplicity


def _brute(rows):
    """Instance-level reference: corpus bigram/context counts, then the
    plain mean NLL over each doc's bigram *instances*."""
    docs = {i: t.strip().lower().split() for i, t in rows}
    c12: dict[tuple, int] = {}
    c1: dict[str, int] = {}
    for ws in docs.values():
        for w1, w2 in zip(ws, ws[1:]):
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    out = {}
    for i, ws in docs.items():
        nlls = [-math.log(c12[(w1, w2)] / c1[w1])
                for w1, w2 in zip(ws, ws[1:])]
        if nlls:
            out[i] = (len(nlls), round(sum(nlls) / len(nlls), 6))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bigram_logprob_matches_instance_level_brute_force(spark, seed):
    from waka_spark.operators.textstats import bigram_logprob

    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
           for r in bigram_logprob(df).collect()}
    want = _brute(rows)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"doc {i} bigram count"
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), f"doc {i}"
