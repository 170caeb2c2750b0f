"""Round-6: the fused NER+rule-RE corpus scan must be bit-identical, per
stage, to the separate deterministic stages it replaces."""

import pytest
from pyspark.sql import functions as F

from waka_spark.operators.ner import (
    deterministic_ner_and_rules,
    deterministic_ner_fused,
)
from waka_spark.operators.relations import aho_relation_extraction
from waka_spark.plans.pipeline import KGPipeline


GAZ = [("spark", "TERM"), ("join", "TERM"), ("window", "TERM")]
RULES = [("spark", "links", "join"), ("window", "links", "spark")]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            ("c0", "spark join spark 1984 window 27% plain 3.5"),
            ("c1", "no surfaces here at all"),
            ("c2", ""),
            ("c3", None),
            ("c4", "window window join"),
        ],
        "conv_id string, text string",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mention_split_matches_fused_ner(spark, docs):
    combined = deterministic_ner_and_rules(docs, GAZ, RULES)
    mentions = combined.filter(F.col("kind") == "m").select(
        "conv_id", "start_idx", "end_idx", "text", "e_type", "url")
    expected = deterministic_ner_fused(docs, GAZ)
    assert _rows(mentions) == _rows(expected)
    assert mentions.schema == expected.schema


def test_triple_split_matches_aho(spark, docs):
    rules_df = spark.createDataFrame(
        RULES, "subj_surface string, pred_text string, obj_surface string")
    combined = deterministic_ner_and_rules(docs, GAZ, RULES)
    raw = combined.filter(F.col("kind") == "r").select(
        "conv_id",
        "subj_text",
        F.lit(None).cast("string").alias("subj_type"),
        "pred_text",
        "obj_text",
        F.lit(None).cast("string").alias("obj_type"),
    ).dropDuplicates(["conv_id", "subj_text", "pred_text", "obj_text"])
    expected = aho_relation_extraction(docs, rules_df)
    assert _rows(raw) == _rows(expected)
    assert raw.schema == expected.schema


def test_pipeline_scan_products_match_separate_stages(spark, docs):
    rules_df = spark.createDataFrame(
        RULES, "subj_surface string, pred_text string, obj_surface string")
    aliases = spark.createDataFrame(
        [("spark", "http://x/Q1", "spark", "d", 10)],
        "alias_key string, url string, label string, description string, "
        "frequency long",
    )
    props = spark.createDataFrame(
        [("links", "http://x/P1", "links", "d", 10)],
        "alias_key string, url string, label string, description string, "
        "frequency long",
    )
    pipe = KGPipeline(
        aliases=aliases, properties=props, gazetteer=GAZ, rules=rules_df,
        use_scorers=False, use_rerank=False,
    )
    mentions, raw = pipe.scan_products(docs)
    assert _rows(mentions) == _rows(pipe.mentions(docs))
    assert _rows(raw) == _rows(pipe.raw_triples(docs))


def test_custom_mention_backend_keeps_separate_stages(spark, docs):
    rules_df = spark.createDataFrame(
        RULES, "subj_surface string, pred_text string, obj_surface string")
    aliases = spark.createDataFrame(
        [("spark", "http://x/Q1", "spark", "d", 10)],
        "alias_key string, url string, label string, description string, "
        "frequency long",
    )

    class CustomNER(KGPipeline):
        def mentions(self, documents):
            return deterministic_ner_fused(documents, self.gazetteer)

    pipe = CustomNER(
        aliases=aliases, properties=aliases, gazetteer=GAZ, rules=rules_df,
        use_scorers=False, use_rerank=False,
    )
    mentions, raw = pipe.scan_products(docs)
    # falls back to the overridden mentions() and the separate rule pass
    assert _rows(mentions) == _rows(pipe.mentions(docs))
    assert _rows(raw) == _rows(pipe.raw_triples(docs))
