"""Golden cases for the tag-grammar decoders (relation_extraction.py:41-103,
152-205). These are the pure-function cores of the transformer RE backends."""

from waka_spark.operators.relations import decode_mrebel_tags, decode_rebel_tags


def test_mrebel_single_triplet():
    tagged = "<s>tp_XX <triplet> Walter Gropius <per> Bauhaus <org> employer</s>"
    triples = decode_mrebel_tags(tagged)
    assert triples == [{
        "subj_text": "Walter Gropius",
        "subj_type": "per",
        "pred_text": "employer",
        "obj_text": "Bauhaus",
        "obj_type": "org",
    }]


def test_mrebel_multiple_objects_same_subject():
    # after a completed relation, a new <type> marker flushes and starts a
    # new object for the same subject (relation_extraction.py:176-190)
    tagged = ("<triplet> Weimar <loc> Germany <loc> country "
              "<loc> Thuringia <loc> located in")
    triples = decode_mrebel_tags(tagged)
    assert len(triples) == 2
    assert triples[0]["pred_text"] == "country"
    assert triples[0]["obj_text"] == "Germany"
    assert triples[1]["pred_text"] == "located in"
    assert triples[1]["obj_text"] == "Thuringia"
    assert triples[1]["subj_text"] == "Weimar"


def test_mrebel_two_triplets():
    tagged = ("<triplet> A <per> B <org> works for "
              "<triplet> C <per> D <loc> lives in")
    triples = decode_mrebel_tags(tagged)
    assert [(t["subj_text"], t["pred_text"], t["obj_text"]) for t in triples] \
        == [("A", "works for", "B"), ("C", "lives in", "D")]


def test_mrebel_incomplete_tail_dropped():
    assert decode_mrebel_tags("<triplet> A <per> B") == []
    assert decode_mrebel_tags("") == []


def test_rebel_offsets_first_unclaimed():
    text = "Paris is in France. Paris is beautiful."
    tagged = ("<s><triplet> Paris <subj> France <obj> country "
              "<triplet> Paris <subj> France <obj> country</s>")
    triples = decode_rebel_tags(tagged, text)
    assert len(triples) == 2
    # first Paris claims offset 0, second claims offset 20
    assert triples[0]["subj_start"] == 0
    assert triples[1]["subj_start"] == 20
    assert triples[0]["subj_end"] == 5
    assert triples[0]["pred_text"] == "country"
    assert triples[0]["obj_text"] == "France"


def test_rebel_multiword_endpoint_offsets():
    text = "Walter Gropius founded the Bauhaus."
    tagged = "<triplet> Walter Gropius <subj> Bauhaus <obj> founded by"
    [t] = decode_rebel_tags(tagged, text)
    # start anchored at first token's occurrence; end = start + len(text)
    assert t["subj_start"] == 0
    assert t["subj_end"] == len("Walter Gropius")
    assert t["obj_start"] == text.index("Bauhaus")
