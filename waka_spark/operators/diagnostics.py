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


def corpus_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rsd: float = 0.02,
) -> DataFrame:
    """One-pass sketch profile of a corpus — the numbers a mix designer
    reads before configuring dedup/curation thresholds, at a cost that
    holds at 100 TB: HyperLogLog++ for distinct counts (``rsd`` relative
    error, fixed ~KB state per partition instead of a distinct shuffle)
    and KLL/GK approximate percentiles for the length distribution
    (``percentile_approx``, mergeable fixed-size sketch).

    Exact ``countDistinct(word)`` on a 10^12-turn corpus is itself a
    full-vocabulary shuffle; the sketches keep this a single scan +
    single-row reduce. Accuracy is pinned by unit test against exact
    values at test scale (no DuckDB oracle on purpose: sketch internals
    are engine-specific, so cross-engine value-hash equality is the wrong
    contract — the error BOUND is the contract).

    Output: one row (n_docs, n_distinct_docs_approx,
    n_distinct_words_approx, n_words_total, p50_words, p95_words,
    p99_words).
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                                           r"\s+", " "), " ")).alias("word"),
    ).filter(F.col("word") != "")
    per_doc = words.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    word_stats = words.agg(
        F.approx_count_distinct("word", rsd).alias("n_distinct_words_approx"),
        F.count("*").cast("long").alias("n_words_total"),
    )
    doc_stats = df.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.approx_count_distinct(
            F.md5(F.col(text_col)), rsd).alias("n_distinct_docs_approx"),
    )
    length_stats = per_doc.agg(
        F.percentile_approx("n_words", 0.5, 10_000).alias("p50_words"),
        F.percentile_approx("n_words", 0.95, 10_000).alias("p95_words"),
        F.percentile_approx("n_words", 0.99, 10_000).alias("p99_words"),
    )
    return doc_stats.crossJoin(word_stats).crossJoin(length_stats)
