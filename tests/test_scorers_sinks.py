"""P20 coherence scorer, mREBEL generation replay, JSON sink."""

import json

from waka_spark import schemas
from waka_spark.operators.relations import decoded_mrebel_to_df
from waka_spark.operators.scorers import coherence_scorer, lexical_coherence


def test_lexical_coherence_range():
    hi = lexical_coherence("Weimar is city", "located is place", "city is town")
    lo = lexical_coherence("aa is bb", "cc is dd", "ee is ff")
    assert 0.3 <= lo < hi <= 1.0


def test_coherence_scorer_in_fusion(spark):
    from waka_spark.operators.fusion import fuse_triples

    ents = spark.createDataFrame(
        [("c1", "Q1", "alpha city", "a city", 0.8, "entity",
          [(0, 5, "alpha", "GPE", "alpha city", "a city", 0.8)]),
         ("c1", "Q2", "beta city", "a city", 0.8, "entity",
          [(8, 12, "beta", "GPE", "beta city", "a city", 0.8)])],
        schemas.ENTITIES,
    )
    triples = spark.createDataFrame(
        [("c1", "alpha", None, "near", "beta", None, "P1", "near", "closeness")],
        schemas.LINKED_TRIPLES,
    )
    plain = fuse_triples(triples, ents, use_scorers=False).collect()[0]
    scored = fuse_triples(
        triples, ents, extra_scorer=coherence_scorer()).collect()[0]
    assert scored.score < plain.score        # multiplied by coherence <= 1
    assert scored.score > 0.3 * plain.score  # calibration floor


def test_decoded_mrebel_replay(spark):
    gens = spark.createDataFrame(
        [("c1", "tp_XX <triplet> Walter Gropius <per> Bauhaus <org> employer"),
         ("c1", "tp_XX <triplet> Walter Gropius <per> Bauhaus <org> employer"),
         ("c2", "<triplet> A <per> B <org> works for")],
        "conv_id string, tagged_text string",
    )
    got = decoded_mrebel_to_df(gens).collect()
    rows = {(r.conv_id, r.subj_text, r.pred_text, r.obj_text) for r in got}
    # beam duplicates dedup per doc (relation_extraction.py:143-148)
    assert len(got) == 2
    assert ("c1", "Walter Gropius", "employer", "Bauhaus") in rows
    assert ("c2", "A", "works for", "B") in rows


def test_kg_json_rows(spark):
    from waka_spark.sources.sinks import kg_json_rows

    triples = spark.createDataFrame(
        [("c1", "t1", "id1", "Q1", "P1", "Q2", 0.9,
          "S", "sd", "entity", "O", "od", "entity", "pl", "pd")],
        "conv_id string, ts_id string, id_ string, subj_url string, "
        "pred_url string, obj_url string, score double, subj_label string, "
        "subj_description string, subj_e_type string, obj_label string, "
        "obj_description string, obj_e_type string, pred_label string, "
        "pred_description string",
    )
    [row] = kg_json_rows(triples).collect()
    payload = json.loads(row.triple_json)
    assert payload["subject"]["url"] == "Q1"
    assert payload["predicate"]["label"] == "pl"
    assert payload["score"] == 0.9
