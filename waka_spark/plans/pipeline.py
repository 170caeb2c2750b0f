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
from waka_spark.operators.ner import (
    deterministic_ner_fused,
    gazetteer_ner,
    regex_literal_ner,
    union_mentions,
)
from waka_spark.operators.rel_linking import link_predicates
from waka_spark.operators.relations import (
    aho_relation_extraction,
    rule_relation_extraction,
)
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
    # rule-RE backend: Aho-Corasick by DEFAULT (round-3) — one O(text)
    # automaton pass per document regardless of rule count, vs the
    # double-`contains` broadcast theta join whose per-document work is
    # O(len(text) * n_rules). Output is identical (equivalence-pinned in
    # tests/test_decoders.py); set False to get the pure-DataFrame theta
    # join, which can win only for a handful of rules where the Arrow
    # hop costs more than the extra scans.
    use_aho_rules: bool = True
    cfg: EngineConfig = field(default_factory=lambda: DEFAULT)

    # ---- stages (each returns a DataFrame; all lazy) -----------------------

    def documents(self, transcripts: DataFrame) -> DataFrame:
        return assemble_documents(transcripts)

    def mentions(self, documents: DataFrame) -> DataFrame:
        # deterministic ensemble as ONE Arrow pass: bit-identical to
        # union_mentions(gazetteer_ner, regex_literal_ner) (pinned by
        # tests/test_ner_linking.py) but ships the corpus text to Python
        # once and skips the exact-span dedup shuffle. Heterogeneous
        # ensembles (transformer backends) override this method with
        # union_mentions(...); priority order = arg order (P6).
        return deterministic_ner_fused(documents, self.gazetteer)

    def mentions_unfused(self, documents: DataFrame) -> DataFrame:
        # the generic composition the fused pass is pinned against
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
        # dedup_pairs: real corpora repeat (sentence, label, description)
        # pairs heavily (hot conversations, common entities), so scoring
        # each distinct pair once and hash-joining back beats re-evaluating
        # the sim per aligned row — measured 37s vs 43s best-of at local[8]
        # on the 20k-conv Zipf corpus, and it is the reference's own CSE
        # (semantics.py:155-167)
        return rerank_candidates(
            cands, sentences, self.cfg.fusion.rerank_threshold,
            dedup_pairs=True,
        )

    def entities(self, candidates: DataFrame) -> DataFrame:
        return cluster_entities(candidates)

    def raw_triples(self, documents: DataFrame) -> DataFrame:
        if self.use_aho_rules:
            return aho_relation_extraction(documents, self.rules)
        return rule_relation_extraction(documents, self.rules)

    def scan_products(
        self, documents: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """(mentions, raw_triples) — via ONE fused corpus Arrow pass when
        both stages are the deterministic defaults (document text crosses
        the JVM→Python boundary once instead of twice; identical per-stage
        output, pinned by tests/test_round6_scan_fusion.py). Subclassed
        backends and the theta-join rule path keep the separate stages.
        """
        uses_default_scans = (
            type(self).mentions is KGPipeline.mentions
            and type(self).raw_triples is KGPipeline.raw_triples
            and self.use_aho_rules
        )
        if not uses_default_scans:
            return self.mentions(documents), self.raw_triples(documents)

        from waka_spark.operators.ner import deterministic_ner_and_rules
        from waka_spark.plans.pins import pin

        rule_list = [
            (r["subj_surface"], r["pred_text"], r["obj_surface"])
            for r in self.rules.collect()
        ]
        combined = pin(deterministic_ner_and_rules(
            documents, self.gazetteer, rule_list))
        mentions = combined.filter(F.col("kind") == "m").select(
            "conv_id", "start_idx", "end_idx", "text", "e_type", "url")
        raw = combined.filter(F.col("kind") == "r").select(
            "conv_id",
            "subj_text",
            F.lit(None).cast("string").alias("subj_type"),
            "pred_text",
            "obj_text",
            F.lit(None).cast("string").alias("obj_type"),
        ).dropDuplicates(["conv_id", "subj_text", "pred_text", "obj_text"])
        return mentions, raw

    def linked_triples(self, raw_triples: DataFrame) -> DataFrame:
        return link_predicates(
            raw_triples, self.properties, self.cfg.relation_linker
        )

    def fused(
        self, linked_triples: DataFrame, entities: DataFrame,
        documents: DataFrame | None = None,
    ) -> DataFrame:
        return fuse_triples(
            linked_triples,
            entities,
            known_triples=self.known_triples,
            extra_scorer=self.extra_scorer,
            cfg=self.cfg.fusion,
            use_scorers=self.use_scorers,
            documents=documents,
        )

    # ---- whole graph -------------------------------------------------------

    def run(
        self, transcripts: DataFrame, resolve: bool = True,
        cut_lineage: bool | str = True,
    ) -> dict[str, DataFrame]:
        """transcripts → {documents, mentions, candidates, entities,
        raw_triples, triples, final_entities, entity_mentions}.

        ``cut_lineage`` controls stage-boundary materialization:

        - ``"checkpoint"`` / ``True`` — eager ``localCheckpoint`` per stage.
          Shallow plans (Catalyst re-analyzes the whole logical plan at every
          action; with ten chained stages planning alone is material) and no
          recompute for multi-consumer stages — but every boundary is a hard
          scheduling barrier, so stage latencies *add* and short stages
          can't overlap. Best for interactive/debug runs.
        - ``"smart"`` — eager ``localCheckpoint`` only at *multi-consumer*
          boundaries (documents ×3, entities ×2, fused ×2+); single-consumer
          stages (mentions, candidates, linked) stay fused into their
          consumer's job. Roughly halves the number of actions/barriers —
          the throughput mode used by bench/submit paths. (A pure
          ``persist()`` mode was measured and rejected: lazy caches fill
          only after the first materialization finishes, so concurrent plan
          branches race and recompute whole stages.)
        - ``"none"`` / ``False`` — raw lineage (recompute per consumer).

        The production checkpointed runner (plans/checkpoint.py) gets the
        same cut via per-stage parquet materialization, which additionally
        survives executor loss — use that on a real cluster.
        """
        if cut_lineage is True:
            mode = "checkpoint"
        elif cut_lineage is False:
            mode = "none"
        else:
            mode = cut_lineage
        if mode not in ("checkpoint", "smart", "none"):
            raise ValueError(
                f"cut_lineage must be one of 'checkpoint'/'smart'/'none' "
                f"(or True/False), got {cut_lineage!r}"
            )
        ident = lambda df: df  # noqa: E731
        lc = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
        if mode == "checkpoint":
            cut = cut_shared = lc
        elif mode == "smart":
            cut, cut_shared = ident, lc
        else:
            cut = cut_shared = ident
        # Fan-out point: every per-document UDF stage (NER, sentence split,
        # extraction) is a narrow map over `docs`, so its partition count
        # caps their parallelism. AQE coalesces the small assembly shuffle
        # to a handful of ~64MB partitions — fine for scans, terrible for
        # CPU-heavy Python stages. Pin to 2x cores (explicit repartition is
        # exempt from AQE coalescing); hash on conv_id keeps per-conv rows
        # (one row each) spread and deterministic.
        sc = transcripts.sparkSession.sparkContext
        n_doc_parts = max(2 * sc.defaultParallelism, 8)
        docs = cut_shared(
            self.documents(transcripts).repartition(n_doc_parts, "conv_id")
        )
        mentions_raw, raw_scan = self.scan_products(docs)
        mentions = cut(mentions_raw)
        cands = cut(self.candidates(docs, mentions))
        ents = cut_shared(self.entities(cands))

        raw = raw_scan
        linked = cut(self.linked_triples(raw))

        fused = cut_shared(self.fused(linked, ents, docs))

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
