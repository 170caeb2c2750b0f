"""End-to-end KG construction pipeline (the Spark analog of
``KGConstructor.construct``, kg_construction.py:232-282).

The reference runs two OS-process pipelines per document and fuses in-process
(SURVEY.md §3.1). Here the whole thing is one DataFrame DAG with two
independent branches that Spark schedules concurrently:

    transcripts ──P1──► documents ──┬─► NER ─► link ─► rerank ─► cluster ─┐
                                    └─► extract ─► link predicates ───────┤
                                                                          ▼
                                 fusion (P16-P22) ─► conflicts (P23-P24) ─►
                                 nodes / edges (+ optional union-find pass)

Everything below is lazy — one action at the end materializes the graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waka_spark.config import DEFAULT, EngineConfig
from waka_spark.operators.assembly import assemble_documents
from waka_spark.operators.clustering import cluster_entities
from waka_spark.operators.conflicts import apply_conflict_resolution
from waka_spark.operators.fusion import fuse_triples
from waka_spark.operators.linking import link_entities
from waka_spark.operators.ner import gazetteer_ner, regex_literal_ner, union_mentions
from waka_spark.operators.rel_linking import link_predicates
from waka_spark.operators.relations import rule_relation_extraction
from waka_spark.operators.rerank import rerank_candidates, split_sentences


@dataclass
class KGPipeline:
    """Deterministic-backend pipeline. The transformer backends swap in by
    replacing ``ner_backends`` / ``extract`` with their mapInPandas
    counterparts — the dataflow downstream is identical."""

    aliases: DataFrame
    properties: DataFrame
    gazetteer: Sequence[tuple[str, str]]
    rules: DataFrame
    known_triples: DataFrame | None = None
    nationalities: DataFrame | None = None
    extra_scorer: Callable[[DataFrame], DataFrame] | None = None
    use_scorers: bool = True
    use_rerank: bool = True
    cfg: EngineConfig = field(default_factory=lambda: DEFAULT)

    # ---- stages (each returns a DataFrame; all lazy) -----------------------

    def documents(self, transcripts: DataFrame) -> DataFrame:
        return assemble_documents(transcripts)

    def mentions(self, documents: DataFrame) -> DataFrame:
        # ensemble of deterministic backends; priority order = arg order (P6)
        return union_mentions(
            gazetteer_ner(documents, self.gazetteer),
            regex_literal_ner(documents),
        )

    def candidates(self, documents: DataFrame, mentions: DataFrame) -> DataFrame:
        cands = link_entities(
            mentions, self.aliases, self.nationalities, self.cfg.entity_linker
        )
        if not self.use_rerank:
            return cands.filter(
                F.col("score") >= self.cfg.fusion.rerank_threshold
            )
        sentences = split_sentences(documents)
        return rerank_candidates(
            cands, sentences, self.cfg.fusion.rerank_threshold
        )

    def entities(self, candidates: DataFrame) -> DataFrame:
        return cluster_entities(candidates)

    def raw_triples(self, documents: DataFrame) -> DataFrame:
        return rule_relation_extraction(documents, self.rules)

    def linked_triples(self, raw_triples: DataFrame) -> DataFrame:
        return link_predicates(
            raw_triples, self.properties, self.cfg.relation_linker
        )

    def fused(self, linked_triples: DataFrame, entities: DataFrame) -> DataFrame:
        return fuse_triples(
            linked_triples,
            entities,
            known_triples=self.known_triples,
            extra_scorer=self.extra_scorer,
            cfg=self.cfg.fusion,
            use_scorers=self.use_scorers,
        )

    # ---- whole graph -------------------------------------------------------

    def run(
        self, transcripts: DataFrame, resolve: bool = True,
        cut_lineage: bool = True,
    ) -> dict[str, DataFrame]:
        """transcripts → {documents, mentions, candidates, entities,
        raw_triples, triples, final_entities, entity_mentions}.

        ``cut_lineage`` eagerly ``localCheckpoint``s each stage boundary.
        This matters twice over: (a) multi-consumer stages (documents ×3,
        entities ×2, fused ×3) would otherwise recompute their upstream DAG
        per consumer, and (b) Catalyst re-analyzes the *entire* logical plan
        at every action — with ten chained stages the planning time alone
        dwarfs execution, so truncating lineage per stage keeps plans
        shallow (measured 4x end-to-end on sf0.1). The production
        checkpointed runner (plans/checkpoint.py) gets the same cut via its
        per-stage parquet materialization, which additionally survives
        executor loss — use that on a real cluster.
        """
        cut = (lambda df: df.localCheckpoint(eager=True)) if cut_lineage \
            else (lambda df: df)
        docs = cut(self.documents(transcripts))
        mentions = cut(self.mentions(docs))
        cands = cut(self.candidates(docs, mentions))
        ents = cut(self.entities(cands))

        raw = self.raw_triples(docs)
        linked = cut(self.linked_triples(raw))

        fused = cut(self.fused(linked, ents))

        if resolve:
            triples, final_entities = apply_conflict_resolution(fused, ents)
        else:
            triples = fused
            used = (
                fused.select("conv_id", F.col("subj_url").alias("url"))
                .unionByName(fused.select("conv_id", F.col("obj_url").alias("url")))
                .distinct()
            )
            final_entities = ents.join(used, on=["conv_id", "url"], how="left_semi")

        entity_mentions = final_entities.select(
            "conv_id", "url", F.explode("mentions").alias("m")
        ).select(
            "conv_id", "url",
            F.col("m")["start_idx"].alias("start_idx"),
            F.col("m")["end_idx"].alias("end_idx"),
            F.col("m")["text"].alias("text"),
            F.col("m")["score"].alias("score"),
        )

        return {
            "documents": docs,
            "mentions": mentions,
            "candidates": cands,
            "entities": ents,
            "raw_triples": raw,
            "linked_triples": linked,
            "fused": fused,
            "triples": triples,
            "final_entities": final_entities,
            "entity_mentions": entity_mentions,
        }


def bauhaus_pipeline(spark: SparkSession, **overrides) -> KGPipeline:
    """Pipeline wired with the bundled parity-fixture dictionaries."""
    from waka_spark.sources import fixtures as fx

    kwargs = dict(
        aliases=fx.aliases_df(spark),
        properties=fx.properties_df(spark),
        gazetteer=fx.BAUHAUS_GAZETTEER,
        rules=fx.rules_df(spark),
        known_triples=fx.known_triples_df(spark),
        nationalities=fx.nationalities_df(spark),
    )
    kwargs.update(overrides)
    return KGPipeline(**kwargs)
