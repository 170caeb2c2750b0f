"""Physical-plan regression tests: the plans we designed for, not just the
results. Each assertion pins a scale-critical plan property:

- dictionary joins broadcast (no shuffle of the big mention side),
- global top-k compiles to TakeOrderedAndProject (per-partition heaps),
  never a single-partition window,
- filters reach the parquet scan (PushedFilters),
- column pruning reaches the scan (ReadSchema carries only what's used).

These run on sf0.001 — plan shape is data-size independent here because the
broadcast side is a literal dictionary and the rest are structural.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def spark():
    from waka_spark.session import get_spark

    return get_spark("plan_shapes", master="local[4]", shuffle_partitions=4)


def test_linker_dictionary_join_broadcasts(spark):
    """P8: mentions join alias dict must be a broadcast hash join — the
    mention side is the corpus-sized one and must not shuffle."""
    from waka_spark import schemas
    from waka_spark.operators.linking import link_entities
    from waka_spark.operators.ner import gazetteer_ner

    docs = entry.q_kg_assembly(spark, SF)
    mentions = gazetteer_ner(docs, entry.GAZ)
    aliases = spark.createDataFrame(entry.ALIASES, schemas.WD_ALIASES)
    plan = plan_of(link_entities(mentions, aliases))
    assert "BroadcastHashJoin" in plan
    # the big side must not be exchanged for this join: no sort-merge join
    assert "SortMergeJoin" not in plan


def test_global_topk_is_take_ordered(spark):
    """tpch_q3: global top-10 must compile to TakeOrderedAndProject, not a
    row_number window over an unpartitioned (single-partition) exchange."""
    plan = plan_of(entry.q_tpch_q3_top10(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_filter_pushdown_reaches_scan(spark):
    """tpch_q1: the shipdate filter must appear in PushedFilters on the
    parquet scan."""
    plan = plan_of(entry.q_tpch_q1(spark, SF))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]


def test_column_pruning_reaches_scan(spark):
    """A projection must prune the parquet ReadSchema: scanning documents
    for NER reads (conv_id-bearing) doc_id and text only."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.select("doc_id").distinct()
    plan = plan_of(q)
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "doc_id" in read_schema
    assert "text" not in read_schema


def test_known_triple_boost_broadcasts(spark):
    """P18: the known-triples reference table join is explicitly broadcast."""
    plan = plan_of(entry.q_kg_known_boost(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_e2e_has_no_cartesian(spark):
    """The full pipeline plan must not contain an unconstrained cartesian
    product; substring-containment fallbacks are per-conv broadcast loops."""
    df = entry.q_kg_e2e_triples(spark, SF)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_minhash_signatures_are_narrow(spark):
    """MinHash signatures must never shuffle exploded rows: the per-band
    min runs inside higher-order functions over the in-row shingle array,
    so at 10^9 docs nothing but the n_bands signature rows per doc ever
    moves. (The former shape exploded doc x shingle x band and shuffled it
    all through a groupBy keyed on (doc_id, band).) The only exchange
    allowed is the pre-explode parallelism floor on the raw doc rows."""
    from waka_spark.operators.dedup import minhash_signatures

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(minhash_signatures(df))
    assert plan.count("+- Exchange") <= 1
    # no aggregation anywhere in the plan — the min is in-row
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_tpch_q4_is_semi_join_with_pushdown(spark):
    """Q4's EXISTS compiles to a LeftSemi join (matched lineitems never
    materialize) and both filters reach the parquet scans."""
    plan = plan_of(entry.q_tpch_q4(spark, SF))
    assert "LeftSemi" in plan
    assert plan.count("PushedFilters: [IsNotNull") >= 1


def test_events_zscore_broadcasts_stats(spark):
    """The per-type stats join must broadcast: the event stream itself
    never shuffles for the z-score."""
    plan = plan_of(entry.q_events_zscore(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_linear_broadcasts_weight_table(spark):
    """hashed_linear_score: the model (bucket, weight) table must be a
    broadcast hash join — the exploded word stream is the corpus-sized
    side and must never shuffle for the model lookup."""
    plan = plan_of(entry.q_curation_quality_linear(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_pairs_topk_is_take_ordered(spark):
    """bpe_pair_counts: the global top-k must compile to
    TakeOrderedAndProject (per-partition heaps), never a global sort or a
    single-partition window."""
    plan = plan_of(entry.q_text_bpe_pairs(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_duplicate_spans_single_window_pass(spark):
    """duplicate_spans: exactly one window-function pass (the interval
    merge) partitioned by doc_id — never an unpartitioned window — and no
    cartesian/nested-loop join anywhere."""
    plan = plan_of(entry.q_dedup_dup_spans(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every Sort feeding the windows is doc_id-partitioned
    assert "partitionspec=[]" not in plan.lower().replace(" ", "")


def test_salted_join_keys_include_salt(spark):
    """skew_salted_join: the physical join condition must include the
    salt column — that's the property that splits a hot key across
    tasks."""
    from waka_spark.operators.joins import skew_salted_join

    big = spark.range(100).select(
        F.lit("hot").alias("k"), F.col("id").alias("row_id"))
    small = spark.createDataFrame([("hot", 1)], "k string, w int")
    plan = plan_of(skew_salted_join(big, small, "k"))
    assert "_salt" in plan
    assert "CartesianProduct" not in plan


def test_mention_salience_equi_join_no_alias_fanout(spark):
    """mention_salience (round-3 rewrite): the alias dictionary must be a
    broadcast EQUI-join against exploded tokens — O(corpus tokens) work —
    never a crossJoin/nested-loop fan-out of turns x aliases (which
    multiplies the corpus scan by dictionary size at real Wikidata
    scale)."""
    from waka_spark import schemas
    from waka_spark.operators.linking import mention_salience

    turns = entry._transcripts_view(entry._t(spark, SF, "documents"))
    aliases = spark.createDataFrame(entry.ALIASES, schemas.WD_ALIASES)
    plan = plan_of(mention_salience(turns, aliases))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_negative_samples_dense_index_is_partitioned(spark):
    """negative_samples (round-3 rewrite): the dense node index must be
    zipWithIndex-style (range partition + per-partition rank + broadcast
    offsets) — the node-dictionary window is partitioned by _pid, never
    an unpartitioned row_number() funneling 10^9 nodes through one
    task."""
    plan = plan_of(entry.q_kg_negative_samples(spark, SF))
    norm = plan.lower().replace(" ", "")
    assert "partitionspec=[]" not in norm  # no unpartitioned window
    assert "window" in norm  # the per-partition rank is still a window


def test_collocations_topk_is_take_ordered(spark):
    """text_collocations (round-3 fix): the global top-k over scored
    bigrams must compile to TakeOrderedAndProject; the only window left
    is the rank assignment over the already-limited k rows."""
    plan = plan_of(entry.q_text_collocations(spark, SF))
    assert "TakeOrderedAndProject" in plan
