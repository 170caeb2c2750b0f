"""cms_top_words / delta_dedup tests."""


def test_cms_estimate_upper_bounds_exact(spark):
    from waka_spark.operators.diagnostics import cms_top_words

    docs = spark.createDataFrame(
        [(i, "alpha beta " * (5 - i % 3) + "gamma") for i in range(12)],
        "doc_id long, text string")
    rows = cms_top_words(docs, d=4, w=16, k=5).collect()
    assert len(rows) == 3  # vocabulary has only 3 words
    for r in rows:
        # CMS never underestimates (collisions only inflate)
        assert r["cms_estimate"] >= r["exact_count"]
    # with a wide grid relative to vocab, top words are exact
    wide = {r["word"]: (r["exact_count"], r["cms_estimate"])
            for r in cms_top_words(docs, d=4, w=512, k=3).collect()}
    for word, (exact, est) in wide.items():
        assert est == exact, word


def test_cms_sketch_is_fixed_size(spark):
    """The sketch agg key cardinality is d*w, never vocabulary-sized —
    plan must not carry a vocab-keyed exchange for the sketch side."""
    from waka_spark.operators.diagnostics import cms_top_words

    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string")
    plan = (
        cms_top_words(docs, d=2, w=8, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan   # top-k, not a global sort
    assert "BroadcastHashJoin" in plan       # sketch probed via broadcast


def test_delta_dedup_flags(spark):
    from waka_spark.operators.dedup import delta_dedup

    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different text about spark clusters here"),
        ],
        "doc_id long, text string")
    delta = spark.createDataFrame(
        [
            (10, "The quick  brown fox jumps over the lazy dog today"),
            (11, "the quick brown fox jumps over the lazy dog yesterday"),
            (12, "nothing like anything in the base corpus at all zz"),
        ],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["exact_dup"], r["near_dup"])
           for r in delta_dedup(base, delta).collect()}
    assert got[10] == (True, True)      # normalization-equal duplicate
    assert got[11][0] is False          # one word changed: not exact
    assert got[11][1] is True           # ...but MinHash-band near-dup
    assert got[12] == (False, False)


def test_delta_dedup_semi_join_plan(spark):
    """Both probes must be LeftSemi — base payloads never join through."""
    from waka_spark.operators.dedup import delta_dedup

    base = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    delta = spark.createDataFrame([(2, "a b c d")], "doc_id long, text string")
    plan = (
        delta_dedup(base, delta)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan


def test_jaccard_threshold_curve_zero_thresholds_present(spark):
    """Round-3 (ADVICE): thresholds with zero qualifying pairs emit
    (threshold, 0, 0) rows — the tuning curve has no silent holes."""
    from waka_spark.operators.dedup import jaccard_threshold_curve

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    got = {r["threshold"]: (r["n_pairs"], r["n_docs"])
           for r in jaccard_threshold_curve(
               docs, thresholds=(0.5, 0.9, 1.1)).collect()}
    # 1.1 can never qualify (jaccard <= 1.0): present with zeros
    assert got[1.1] == (0, 0)
    assert got[0.5][0] >= 1 and got[0.9][0] >= 1
    assert set(got) == {0.5, 0.9, 1.1}


def test_minhash_recall_bounds_and_perfect_on_exact_dups(spark):
    """Exact duplicates share every shingle, so every band collides:
    recall must be 1.0; the one-row output carries the truth count."""
    from waka_spark.operators.dedup import minhash_recall

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "one two three four five six seven")],
        "doc_id long, text string",
    )
    r = minhash_recall(docs, threshold=0.9).collect()[0]
    assert (r["n_true_pairs"], r["n_caught"]) == (1, 1)
    assert r["recall"] == 1.0


def test_minhash_recall_empty_truth_is_null(spark):
    from waka_spark.operators.dedup import minhash_recall

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    r = minhash_recall(docs, threshold=0.5).collect()[0]
    assert r["n_true_pairs"] == 0
    assert r["recall"] is None
