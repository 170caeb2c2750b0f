"""P12 — mention clustering: candidates → UniqueEntity rows.

Reference (semantics.py:104-141): group LinkedEntities by ``url``; sort each
cluster by score desc; the head supplies the cluster's label/description/
score; ``e_type = "literal"`` iff *every* member has a literal NER type
(semantics.py:95,118).

Spark shape: one hash aggregation ``groupBy(conv_id, url)`` with
``max_by``-style head extraction and an ``array_sort`` comparator for the
deterministic desc-by-score mention list. Single shuffle, map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waka_spark.config import LITERAL_TYPES


def _desc_by_score(a, b):
    """array_sort comparator: score desc, then span asc, then text asc —
    deterministic tie-breaks for the reference's Python sort stability."""
    return F.when(a["score"] > b["score"], F.lit(-1)).otherwise(
        F.when(a["score"] < b["score"], F.lit(1)).otherwise(
            F.when(a["start_idx"] < b["start_idx"], F.lit(-1)).otherwise(
                F.when(a["start_idx"] > b["start_idx"], F.lit(1)).otherwise(
                    F.when(a["end_idx"] < b["end_idx"], F.lit(-1)).otherwise(
                        F.when(a["end_idx"] > b["end_idx"], F.lit(1)).otherwise(F.lit(0))
                    )
                )
            )
        )
    )


def cluster_entities(candidates: DataFrame) -> DataFrame:
    """candidates → entities(conv_id, url, label, description, score, e_type,
    mentions array<struct>), one row per (conv_id, url) cluster."""
    mention_struct = F.struct(
        "start_idx", "end_idx", "text", "e_type", "label", "description", "score"
    )
    clustered = (
        candidates
        .groupBy("conv_id", "url")
        .agg(
            F.sort_array(F.collect_list(mention_struct)).alias("_mentions_raw"),
            F.min(F.col("e_type").isin(*LITERAL_TYPES)).alias("_all_literal"),
        )
        .withColumn("mentions", F.array_sort("_mentions_raw", _desc_by_score))
        .withColumn("_head", F.element_at("mentions", 1))
        .select(
            "conv_id",
            "url",
            F.col("_head")["label"].alias("label"),
            F.col("_head")["description"].alias("description"),
            F.col("_head")["score"].alias("score"),
            F.when(F.col("_all_literal"), F.lit("literal"))
            .otherwise(F.lit("entity"))
            .alias("e_type"),
            "mentions",
        )
    )
    return clustered
