"""Deterministic synthetic transcript corpus + knowledge base.

Generates the BASELINE.json input table ``transcripts(conv_id, turn_idx,
role, text, tool, ts)`` *distributedly* (spark.range → sequence-explode →
broadcast-join verbalizations; no driver-side loops), with:

- **Zipf-skewed conversation lengths** — every ``hot_every``-th conversation
  is ~``hot_turns`` long, the tail is short: the skew profile the salted
  repartition / AQE machinery must absorb (SURVEY.md §7.3).
- **Fact-seeded turn texts**: each turn verbalizes one KB fact chosen by
  ``xxhash64(conv_idx, turn_idx) % n_facts`` — so gold triples per
  conversation are *derivable inside Spark or any SQL engine* from the same
  arithmetic, giving closed-loop correctness at any scale with no external
  data.
- A synthetic KB whose facts form a perfect matching over entities (each
  entity participates in exactly one fact) with fixed-width, collision-free
  labels, so document-level rule extraction reproduces exactly the emitted
  facts (P/R = 1 achievable by a correct engine; extraction *quality* is
  measured on the reference fixtures instead).

Every ~5th fact has a numeric-literal object exercising the typed-literal
path end to end (regex NER → passthrough linking → literal clustering →
fusion with a literal endpoint).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waka_spark import schemas

WD = "http://www.wikidata.org/entity/"
WDP = "http://www.wikidata.org/prop/direct/"

_PREDICATES = [
    # (phrase used in text & rules, url suffix, label)
    ("works for", "P9001", "employer"),
    ("located in", "P9002", "located in"),
    ("founded by", "P9003", "founder"),
    ("citizen of", "P9004", "country of citizenship"),
    ("counts staff", "P9005", "staff count"),  # literal-object predicate
]

_STEMS = ["Orvalia", "Bremvik", "Tascor", "Quillan", "Veyruna",
          "Mondral", "Harvex", "Silgard", "Pellune", "Crostin"]


@dataclass(frozen=True)
class SynthKB:
    """Driver-side KB (dictionary scale — broadcast everywhere)."""

    entities: list[tuple[str, str, str]]      # (label, url, e_type)
    facts: list[tuple[int, str, str, str, str, str, str]]
    # (fact_id, subj_label, pred_phrase, obj_label, subj_url, pred_url, obj_url)

    @property
    def n_facts(self) -> int:
        return len(self.facts)


def build_kb(n_entities: int = 200) -> SynthKB:
    """Perfect-matching fact KB with collision-free fixed-width labels."""
    from waka_spark.config import XSD_DECIMAL

    entities = []
    for i in range(n_entities):
        stem = _STEMS[i % len(_STEMS)]
        label = f"{stem} {i:04d}"
        e_type = ["ORG", "GPE", "PERSON", "FAC"][i % 4]
        entities.append((label, f"{WD}Q9{i:05d}", e_type))

    facts = []
    for f_id in range(n_entities // 2):
        subj_label, subj_url, _ = entities[2 * f_id]
        phrase, p_suffix, _ = _PREDICATES[f_id % len(_PREDICATES)]
        pred_url = f"{WDP}{p_suffix}"
        if f_id % len(_PREDICATES) == 4:  # literal-object fact
            number = f"{4000 + f_id}"
            facts.append((f_id, subj_label, phrase, number,
                          subj_url, pred_url, f"+{number}^^{XSD_DECIMAL}"))
        else:
            obj_label, obj_url, _ = entities[2 * f_id + 1]
            facts.append((f_id, subj_label, phrase, obj_label,
                          subj_url, pred_url, obj_url))
    return SynthKB(entities=entities, facts=facts)


# ------------------------------------------------------------- dimensions

def facts_df(spark: SparkSession, kb: SynthKB) -> DataFrame:
    return spark.createDataFrame(
        kb.facts,
        "fact_id int, subj_label string, pred_phrase string, obj_label string, "
        "subj_url string, pred_url string, obj_url string",
    ).withColumn(
        "sentence",
        F.format_string("%s %s %s.", "subj_label", "pred_phrase", "obj_label"),
    )


def aliases_df(spark: SparkSession, kb: SynthKB) -> DataFrame:
    rows = [
        (label.lower(), url, label, f"synthetic {e_type.lower()} entity", 1000 + i)
        for i, (label, url, e_type) in enumerate(kb.entities)
    ]
    return spark.createDataFrame(rows, schemas.WD_ALIASES)


def properties_df(spark: SparkSession) -> DataFrame:
    rows = [
        (phrase, f"{WDP}{suffix}", label, f"synthetic predicate {label}", 5000)
        for phrase, suffix, label in _PREDICATES
    ]
    return spark.createDataFrame(rows, schemas.WD_PROPERTIES)


def gazetteer(kb: SynthKB) -> list[tuple[str, str]]:
    return [(label, e_type) for label, _, e_type in kb.entities]


def rules_df(spark: SparkSession, kb: SynthKB) -> DataFrame:
    rows = [(s, p, o) for _, s, p, o, _, _, _ in kb.facts]
    return spark.createDataFrame(rows, schemas.RELATION_RULES)


# ------------------------------------------------------------- transcripts

def _conv_turns_expr(hot_every: int, hot_turns: int, base_turns: int):
    """Zipf-ish skew: conv_idx % hot_every == 0 → hot_turns, else
    2..base_turns+2 varying by hash."""
    return F.when(
        F.col("conv_idx") % hot_every == 0, F.lit(hot_turns)
    ).otherwise(
        (F.pmod(F.xxhash64("conv_idx"), F.lit(base_turns)) + 2).cast("int")
    )


def conv_fact_assignments(
    spark: SparkSession,
    n_convs: int,
    n_facts: int,
    hot_every: int = 100,
    hot_turns: int = 400,
    base_turns: int = 30,
) -> DataFrame:
    """(conv_idx, conv_id, turn_idx, fact_id) — the shared arithmetic both
    the transcripts and the gold derive from."""
    return (
        spark.range(n_convs).withColumnRenamed("id", "conv_idx")
        .withColumn("n_turns", _conv_turns_expr(hot_every, hot_turns, base_turns))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn(
            "fact_id",
            F.pmod(F.xxhash64("conv_idx", "turn_idx"), F.lit(n_facts)).cast("int"),
        )
        .withColumn("conv_id", F.format_string("conv-%08d", "conv_idx"))
        .select("conv_idx", "conv_id", "turn_idx", "fact_id")
    )


def synth_transcripts(
    spark: SparkSession,
    kb: SynthKB,
    n_convs: int = 1000,
    hot_every: int = 100,
    hot_turns: int = 400,
    base_turns: int = 30,
) -> DataFrame:
    """The input table. Deterministic for a given (kb, n_convs, skew)."""
    assigned = conv_fact_assignments(
        spark, n_convs, kb.n_facts, hot_every, hot_turns, base_turns
    )
    fd = facts_df(spark, kb).select("fact_id", "sentence")
    return (
        assigned
        .join(F.broadcast(fd), "fact_id")
        .select(
            "conv_id",
            "turn_idx",
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int"),
            ).alias("role"),
            F.col("sentence").alias("text"),
            F.when(F.pmod("turn_idx", F.lit(3)) == 2, F.lit("kb_search"))
            .otherwise(F.lit(None).cast("string")).alias("tool"),
            (
                F.timestamp_seconds(
                    F.lit(1700000000)
                    + F.xxhash64("conv_id") % 100000
                    + F.col("turn_idx")
                )
            ).alias("ts"),
        )
    )


def synth_gold_triples(
    spark: SparkSession,
    kb: SynthKB,
    n_convs: int,
    hot_every: int = 100,
    hot_turns: int = 400,
    base_turns: int = 30,
) -> DataFrame:
    """Expected (conv_id, subj_url, pred_url, obj_url): the distinct facts
    verbalized into each conversation — same arithmetic as the generator."""
    assigned = conv_fact_assignments(
        spark, n_convs, kb.n_facts, hot_every, hot_turns, base_turns
    )
    fd = facts_df(spark, kb).select("fact_id", "subj_url", "pred_url", "obj_url")
    return (
        assigned
        .join(F.broadcast(fd), "fact_id")
        .select("conv_id", "subj_url", "pred_url", "obj_url")
        .distinct()
    )


def scale_testdata(
    spark: SparkSession, src_dir: str, dst_dir: str, factor: int = 10
) -> None:
    """Replicate the driver testdata ``factor``x with key-domain shifts, so
    larger scale factors exist locally (sf0.1 x10 ≈ sf1) without external
    data. Each replica i shifts every key column by i * (domain max + 1),
    keeping joins (orders↔customer↔lineitem, part/supplier refs) and
    per-key group cardinalities realistic — the row count grows 10x, the
    number of orders/customers/documents grows 10x, per-group sizes stay
    constant (a true scale-up, not hot-key inflation). nation/region are
    dimensions and copy through unchanged.
    """
    shifted_cols = {
        "documents": {"doc_id": ("documents", "doc_id")},
        "embeddings": {"vec_id": ("embeddings", "vec_id")},
        "orders": {"o_orderkey": ("orders", "o_orderkey"),
                   "o_custkey": ("customer", "c_custkey")},
        "customer": {"c_custkey": ("customer", "c_custkey")},
        "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
        "part": {"p_partkey": ("part", "p_partkey")},
        "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                     "l_partkey": ("part", "p_partkey"),
                     "l_suppkey": ("supplier", "s_suppkey")},
        "events": {"event_id": ("events", "event_id"),
                   "user_id": ("events", "user_id")},
    }
    # one tiny max() scan per key domain
    domain_span: dict[tuple[str, str], int] = {}
    for table, cols in shifted_cols.items():
        for dom in cols.values():
            if dom not in domain_span:
                dom_table, dom_col = dom
                mx = (
                    spark.read.parquet(f"{src_dir}/{dom_table}.parquet")
                    .agg(F.max(dom_col)).first()[0]
                )
                domain_span[dom] = int(mx) + 1

    reps = F.explode(
        F.sequence(F.lit(0), F.lit(factor - 1))
    ).alias("_rep")
    for table in ("region", "nation", *shifted_cols):
        df = spark.read.parquet(f"{src_dir}/{table}.parquet")
        if table in shifted_cols:
            out = df.select("*", reps)
            for col, dom in shifted_cols[table].items():
                out = out.withColumn(
                    col, F.col(col) + F.col("_rep") * F.lit(domain_span[dom])
                )
            out = out.drop("_rep")
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{dst_dir}/{table}.parquet")
