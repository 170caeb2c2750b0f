"""Ops-side diagnostics for partitioning / skew decisions.

The engine's scale levers (salted repartition in assembly.py, skew-join
AQE, ``max_shingle_freq``, LSH bucket caps) all need the same input: the
key-frequency profile of the data actually flowing through. This module
computes it as a first-class operator so pipelines can record it per run
(plans/checkpoint.py counters record per-partition rows; this records
per-KEY mass) and pick salting factors from measurements instead of
guesses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Top-``top_n`` heaviest keys with their share of total rows and a
    skew ratio vs the mean key mass.

    One hash-agg on the key (map-side partials) + a single-row total
    joined back by crossJoin of a 1-row aggregate (broadcast by
    definition) + a global top-k (TakeOrdered — never a full sort).
    Output: (key, n_rows, share, skew_vs_mean, rank); a key with
    ``skew_vs_mean`` ≫ salt factor is the one that needs salting.
    """
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject — never a global
    # sort of all keys); the rank window then runs over <= top_n rows
    top = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("share", F.round(F.col("n_rows") / F.col("_total"), 6))
        .withColumn(
            "skew_vs_mean",
            F.round(F.col("n_rows") / (F.col("_total") / F.col("_n_keys")), 6),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("key", "n_rows", "share", "skew_vs_mean", "rank")
    )
