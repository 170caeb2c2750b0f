"""P26-P28 — evaluation operators (P/R/F1 as join + arithmetic).

Reference metric definitions live on the data model (kg.py:53-88, 151-198,
247-278) and the drivers accumulate macro (per doc, then averaged) and micro
(pooled counts) variants (evaluate_kg_creation.py:21-44).

- triple eval: TP iff (subj_url, pred_url, obj_url) matches a gold triple —
  set semantics via the Triple hash (kg.py:224-225, 249-255);
- mention eval: span-only identity (start_idx, end_idx) (kg.py:34-35, 53-88);
- predicate eval: TP iff the predicate (text:url identity, kg.py:142-143)
  appears in the gold predicate *bag* (kg.py:151-198).

Spark shape: inner joins on the identity columns → distinct → counts. Both
sides deduped first (set semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prf(tp: F.Column, fp: F.Column, fn: F.Column) -> list:
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return [
        tp.alias("tp"), fp.alias("fp"), fn.alias("fn"),
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    ]


def _eval_on_keys(
    computed: DataFrame, gold: DataFrame, keys: list[str], macro: bool,
    per_doc_rows: bool = False,
) -> DataFrame:
    comp = computed.select("conv_id", *keys).distinct()
    gld = gold.select("conv_id", *keys).distinct()
    matched = comp.join(gld, on=["conv_id", *keys], how="inner")

    per_doc = (
        comp.groupBy("conv_id").agg(F.count("*").alias("n_comp"))
        .join(
            gld.groupBy("conv_id").agg(F.count("*").alias("n_gold")),
            on="conv_id", how="full",
        )
        .join(
            matched.groupBy("conv_id").agg(F.count("*").alias("tp")),
            on="conv_id", how="left",
        )
        .na.fill(0, ["n_comp", "n_gold", "tp"])
        .withColumn("fp", F.col("n_comp") - F.col("tp"))
        .withColumn("fn", F.col("n_gold") - F.col("tp"))
    )

    if macro or per_doc_rows:
        per_doc_prf = per_doc.select(
            "conv_id",
            *_prf(F.col("tp").cast("double"), F.col("fp").cast("double"),
                  F.col("fn").cast("double")),
        )
        if per_doc_rows:
            # one row per conversation — the corpus-scale eval surface
            # (macro averages these; this exposes the distribution)
            return per_doc_prf
        return per_doc_prf.agg(
            F.avg("precision").alias("precision"),
            F.avg("recall").alias("recall"),
            F.avg("f1").alias("f1"),
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
            F.sum("fn").alias("fn"),
        )
    pooled = per_doc.agg(
        F.sum("tp").cast("double").alias("tp"),
        F.sum("fp").cast("double").alias("fp"),
        F.sum("fn").cast("double").alias("fn"),
    )
    return pooled.select(*_prf(F.col("tp"), F.col("fp"), F.col("fn")))


def eval_triples(
    computed: DataFrame, gold: DataFrame, macro: bool = False,
    per_doc_rows: bool = False,
) -> DataFrame:
    """P26 — KG eval over triple URL identity (kg.py:247-278).

    ``per_doc_rows=True`` returns the per-conversation P/R/F1 frame (one
    row per conv_id — what macro averages), the right surface when
    evaluating a whole corpus rather than one request."""
    return _eval_on_keys(
        computed, gold, ["subj_url", "pred_url", "obj_url"], macro,
        per_doc_rows,
    )


def eval_mentions(computed: DataFrame, gold: DataFrame, macro: bool = False) -> DataFrame:
    """P27 — mention eval over span identity (kg.py:53-88)."""
    return _eval_on_keys(computed, gold, ["start_idx", "end_idx"], macro)


def eval_predicates(computed: DataFrame, gold: DataFrame, macro: bool = False) -> DataFrame:
    """P28 — predicate eval over (text, url) bag membership (kg.py:151-198).

    Inputs carry (conv_id, pred_text, pred_url) per triple.
    """
    return _eval_on_keys(computed, gold, ["pred_text", "pred_url"], macro)


def prf_dict(eval_df: DataFrame) -> dict:
    row = eval_df.collect()[0].asDict()
    return {k: float(v) for k, v in row.items() if v is not None}
