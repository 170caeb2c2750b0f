"""Coverage for the thin public-API wrappers that mirror tested twins:
read_rebel (twin of read_redfm), write_ntriples (file path over
to_ntriples), gazetteer_df (fixture builder), collapse_whitespace
(frontend parity, web/main.js:488-490), year_datetime_url_col (bare-year
DATE fast path). Untested-but-public is exactly where wiring bugs hide."""

import json

from pyspark.sql import functions as F


def test_read_rebel_parses_triples_key(spark, tmp_path):
    line = {
        "docid": "d1",
        "title": "t",
        "text": "Alpha founded Beta.",
        "entities": [
            {"surfaceform": "Alpha", "boundaries": [0, 5], "uri": "Q1"},
        ],
        "triples": [
            {
                "subject": {"surfaceform": "Alpha", "boundaries": [0, 5],
                            "uri": "Q1"},
                "predicate": {"uri": "P112", "surfaceform": "founded"},
                "object": {"surfaceform": "Beta", "boundaries": [14, 18],
                           "uri": "Q2"},
            }
        ],
    }
    p = tmp_path / "rebel.jsonl"
    p.write_text(json.dumps(line) + "\n")

    from waka_spark.sources.corpora import gold_docs, gold_triples, read_rebel

    df = read_rebel(spark, str(p))
    assert gold_docs(df).collect()[0].asDict() == {
        "conv_id": "d1", "text": "Alpha founded Beta."}
    got = gold_triples(df, relations_col="triples").collect()
    assert [(r.subj_url, r.pred_url, r.obj_url) for r in got] == [
        ("Q1", "P112", "Q2")]


def test_write_ntriples_roundtrip(spark, tmp_path):
    triples = spark.createDataFrame(
        [
            ("http://s/1", "http://p/1", "http://o/1"),
            ("http://s/2", "http://p/2", '"lit"^^x'),  # literal: verbatim
        ],
        "subj_url string, pred_url string, obj_url string",
    )
    out = tmp_path / "nt"
    from waka_spark.sources.sinks import write_ntriples

    write_ntriples(triples, str(out))
    lines = sorted(
        r.value for r in spark.read.text(str(out)).collect())
    assert lines == [
        '<http://s/1> <http://p/1> <http://o/1> .',
        '<http://s/2> <http://p/2> "lit"^^x .',
    ]


def test_gazetteer_fixture_schema(spark):
    from waka_spark import schemas
    from waka_spark.sources import fixtures as fx

    df = fx.gazetteer_df(spark)
    assert df.schema == schemas.GAZETTEER
    assert df.count() > 0


def test_collapse_whitespace_matches_frontend(spark):
    from waka_spark.functions.text_norm import collapse_whitespace

    df = spark.createDataFrame([("a \n\t b\n\nc",)], "t string")
    assert df.select(
        collapse_whitespace(F.col("t")).alias("o")).collect()[0].o == "a b c"


def test_year_datetime_url_col(spark):
    from waka_spark.config import XSD_DATETIME
    from waka_spark.functions.literals import year_datetime_url_col

    df = spark.createDataFrame([("in 1860",), ("no year",)], "t string")
    got = [r.o for r in df.select(
        year_datetime_url_col(F.col("t")).alias("o")).collect()]
    assert got == [f"1860-01-01T00:00:00Z^^{XSD_DATETIME}", None]
