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


def eval_bootstrap_ci(
    computed: DataFrame,
    gold: DataFrame,
    keys: list[str] | None = None,
    n_boot: int = 200,
    ci: float = 0.95,
    salt: str = "boot",
) -> DataFrame:
    """Bootstrap confidence intervals for the micro P/R/F1 — the error
    bars a corpus-scale KG eval needs before "P/R >= 0.95" can gate a
    release (a point estimate over N conversations says nothing about
    whether 0.951 vs 0.949 is noise). Conversations are the resampling
    unit (the reference's macro unit, evaluate_kg_creation.py:21-44).

    Poisson bootstrap (Chamandy et al., Google 2012): replicate b gives
    conversation c weight w ~ Poisson(1), realized DETERMINISTICALLY by
    mapping the md5("salt:conv:b") 32-bit uniform through the Poisson
    CDF as pre-computed INTEGER thresholds (capped at 6, cumulative
    mass 0.9999) — no RNG state, bit-identical across engines and
    partitionings, and unlike the exact multinomial bootstrap it needs
    no global coordination, which is why it is THE bootstrap at
    map-reduce scale.

    Scale shape: the per-conversation (tp, fp, fn) counts table (the
    already-aggregated eval surface, 3 ints per conv) fans out x
    ``n_boot`` NARROWLY; the per-replicate sums are map-side-combined
    into <= n_boot rows before the single shuffle, so the exchange
    carries O(n_boot) rows regardless of corpus size. Replicate sums
    are pure INTEGER arithmetic — identical across engines; only the
    final P/R/F1 divisions and percentile interpolation are floating,
    on B values.

    Output: one row — (n_boot, f1_mean, f1_lo, f1_hi, precision_lo,
    precision_hi, recall_lo, recall_hi), round-6, lo/hi at the
    (1±ci)/2 percentiles.
    """
    import math

    from waka_spark.plans.parallel import parallel_floor

    keys = keys or ["subj_url", "pred_url", "obj_url"]
    # floor BEFORE the ×n_boot fan-out: the per-conv counts table is tiny
    # in bytes, so AQE coalesces it to ~1 partition — and the fan-out
    # stage FUSES onto that partitioning, putting n_boot × n_convs rows
    # of md5 work on one core (measured: the whole operator's cost).
    per = parallel_floor(
        _eval_on_keys(
            computed, gold, keys, macro=False, per_doc_rows=True
        ).select(
            "conv_id",
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.col("fn").cast("long").alias("fn"),
        ),
        "conv_id",
    )
    reps = computed.sparkSession.range(n_boot).select(
        F.col("id").cast("int").alias("b"))

    thresholds, acc = [], 0.0
    for k in range(6):
        acc += math.exp(-1) / math.factorial(k)
        thresholds.append(int(acc * (1 << 32)))
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                ":", F.lit(salt), F.col("conv_id"), F.col("b"))), 1, 8),
        16, 10,
    ).cast("long")
    w = F.when(u < thresholds[0], 0)
    for k in range(1, 6):
        w = w.when(u < thresholds[k], k)
    w = w.otherwise(6)

    per_b = (
        per.crossJoin(reps)
        .withColumn("_w", w)
        .groupBy("b")
        .agg(
            F.sum(F.col("_w") * F.col("tp")).alias("tp"),
            F.sum(F.col("_w") * F.col("fp")).alias("fp"),
            F.sum(F.col("_w") * F.col("fn")).alias("fn"),
        )
    )
    p = F.when(F.col("tp") + F.col("fp") > 0,
               F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    r = F.when(F.col("tp") + F.col("fn") > 0,
               F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    f1 = F.when(p + r > 0, 2.0 * p * r / (p + r)).otherwise(0.0)
    scored = per_b.select(
        p.alias("_p"), r.alias("_r"), f1.alias("_f1"))
    lo, hi = (1.0 - ci) / 2.0, 1.0 - (1.0 - ci) / 2.0
    return scored.agg(
        F.lit(n_boot).alias("n_boot"),
        F.round(F.avg("_f1"), 6).alias("f1_mean"),
        F.round(F.percentile("_f1", F.lit(lo)), 6).alias("f1_lo"),
        F.round(F.percentile("_f1", F.lit(hi)), 6).alias("f1_hi"),
        F.round(F.percentile("_p", F.lit(lo)), 6).alias("precision_lo"),
        F.round(F.percentile("_p", F.lit(hi)), 6).alias("precision_hi"),
        F.round(F.percentile("_r", F.lit(lo)), 6).alias("recall_lo"),
        F.round(F.percentile("_r", F.lit(hi)), 6).alias("recall_hi"),
    )
