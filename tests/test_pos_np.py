"""POS-lite tokenizer + noun-run NER backend + constituency NP extraction."""

from waka_spark.operators.pos import extract_noun_phrases, noun_run_ner, pos_lite_tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, text string")


def test_pos_lite_tokens(spark):
    docs = _docs(spark, [("c1", "The school was renamed Bauhaus. Walter Gropius led it.")])
    toks = {r.text: r.pos for r in pos_lite_tokens(
        docs, noun_lexicon=["school"]).collect()}
    assert toks["school"] == "NOUN"
    assert toks["Bauhaus"] == "PROPN"
    assert toks["Walter"] == "PROPN"     # sentence-initial but capitalized...
    assert toks["Gropius"] == "PROPN"
    assert toks["was"] == "X"
    assert toks["."] == "PUNCT"


def test_noun_run_ner_merges_propn_runs(spark):
    docs = _docs(spark, [("c1", "It was renamed by Walter Adolph Gropius later.")])
    got = {(r.start_idx, r.end_idx): r.text for r in noun_run_ner(docs).collect()}
    full = "It was renamed by Walter Adolph Gropius later."
    s = full.index("Walter")
    # singles
    assert got[(s, s + 6)] == "Walter"
    # run prefixes: Walter Adolph, Walter Adolph Gropius
    assert got[(s, s + 13)] == "Walter Adolph"
    assert got[(s, s + 21)] == "Walter Adolph Gropius"


def test_extract_noun_phrases_reference_semantics():
    # "the university in Weimar" — DT child does not open the span
    text = "the university in Weimar"
    words = [(0, 3, "the"), (4, 14, "university"), (15, 17, "in"), (18, 24, "Weimar")]
    leaf = lambda w: (w, [])
    tree = ("ROOT", [
        ("S", [
            ("NP", [("DT", [leaf("the")]), ("NN", [leaf("university")])]),
            ("PP", [("IN", [leaf("in")]), ("NP", [("NNP", [leaf("Weimar")])])]),
        ]),
    ])
    nps = extract_noun_phrases(tree, words, text)
    spans = {(p["start_idx"], p["end_idx"], p["text"]) for p in nps}
    assert (4, 14, "university") in spans
    assert (18, 24, "Weimar") in spans
    assert len(nps) == 2


def test_extract_noun_phrases_nested():
    # nested NP: outer spans both words, inner only the head
    text = "old Weimar town"
    words = [(0, 3, "old"), (4, 10, "Weimar"), (11, 15, "town")]
    leaf = lambda w: (w, [])
    tree = ("ROOT", [
        ("NP", [
            ("ADJP", [("JJ", [leaf("old")])]),
            ("NP", [("NNP", [leaf("Weimar")]), ("NN", [leaf("town")])]),
        ]),
    ])
    nps = extract_noun_phrases(tree, words, text)
    spans = {(p["start_idx"], p["end_idx"]) for p in nps}
    assert (0, 15) in spans   # outer
    assert (4, 15) in spans   # inner
