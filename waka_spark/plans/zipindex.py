"""Global rank / prefix aggregates under a total order WITHOUT a
single-partition window — the zipWithIndex algebra as a reusable plan.

``Window.orderBy(...)`` with an empty partition spec funnels the whole
input through ONE task: fine for a k-row frame, fatal for a 10^9-row
dictionary. RDD ``zipWithIndex`` solves this with a tiny count job and
per-partition offsets; this module is the DataFrame equivalent:

1. ``repartitionByRange`` on the order columns — partition p's rows all
   sort before partition p+1's (a normal distributed shuffle),
2. rank / running-sum WITHIN each partition (``Window.partitionBy`` on
   the partition id — every task ranks only its own range),
3. per-partition totals collected to the driver (n_partitions rows — the
   same tiny job RDD.zipWithIndex runs) and broadcast back as cumulative
   offsets,
4. global value = partition offset + within-partition value.

The result equals the global-window answer EXACTLY (rank = global rank
under the total order; prefix sums are integer/float adds in the same
order), so oracle SQL written against ``row_number() OVER (ORDER BY
...)`` still matches — determinism does not depend on where the sampled
range boundaries land.

Used by: operators/textstats.zipf_fit (global frequency rank) and
operators/curation.classifier_auc (rank-sum prefix counts).
plans/incremental.negative_samples implements the same algebra inline
because it also needs the total node count, which its offsets job
yields for free.

Reference analog: none — the reference is single-document
(kg_construction.py walks one text at a time); global-order statistics
only exist at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_order_stats(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str | None = "rank",
    prefix_sums: dict[str, str] | None = None,
    n_parts: int | None = None,
    rank_start: int = 1,
) -> DataFrame:
    """Attach global-order statistics to ``df`` under ``order_by``.

    - ``rank_col``: 1-based (or ``rank_start``-based) dense position in
      the total order (``row_number`` semantics — order must be a total
      order, i.e. tie-free, for the result to be deterministic).
    - ``prefix_sums``: {source_col: out_col} — EXCLUSIVE running sum of
      ``source_col`` over the total order (sum of all strictly-earlier
      rows; 0 for the first row).

    One range shuffle + one hash shuffle (both fully parallel) + a
    driver round-trip of n_parts rows. No single-partition exchange.

    NOTE: like RDD.zipWithIndex, this is EAGER — the offsets count job
    runs when the plan is built, not at the caller's action (the global
    offsets cannot exist before the data is partitioned). Callers that
    may abandon the plan should build it lazily behind their own gate.

    SCOPE CONTRACT (round-5, ADVICE): the returned frame is lazy but
    depends on a pinned (``plans/pins.pin``) physical partitioning whose
    range boundaries the collected offsets describe. Inside a
    ``pin_scope`` the pin is released on scope exit — consume (collect /
    write / count) the returned frame BEFORE the enclosing scope exits.
    A post-exit action would recompute ``repartitionByRange``, which may
    resample different boundaries while the frozen offsets describe the
    old ones — silently corrupting global ranks/prefix sums.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    prefix_sums = prefix_sums or {}

    # PERSIST is load-bearing, not an optimization: `parts` is consumed by
    # two jobs (the offsets collect below and the caller's final action),
    # and RangePartitioner seeds its reservoir sampling from the physical
    # RDD id — two separate executions of repartitionByRange can sample
    # DIFFERENT range boundaries once inputs are large enough to be
    # subsampled. Offsets computed against one partitioning and ranks
    # against another would silently duplicate/skip global positions. The
    # persist pins ONE physical partitioning: the collect materializes the
    # cache, the final job reads it. (Same reason RDD.zipWithIndex runs
    # its count job on the one RDD instance it then maps over.) The cache
    # also stops the upstream aggregate from being computed twice. The
    # output plan remains lazy and must keep reading the pinned
    # partitioning, so the cache cannot be dropped here — it is
    # registered via plans/pins.pin() (round-4, ADVICE): inside a
    # pin_scope (the serve endpoint, tests) the frame is unpersisted —
    # DataFrame-level, so the CacheManager entry goes too — when the
    # scope exits; outside any scope it stays for the session, exactly
    # as a batch job wants.
    from waka_spark.plans.pins import pin

    parts = pin(
        df.repartitionByRange(n_parts, *order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*order_by)
    w_excl = w.rowsBetween(Window.unboundedPreceding, -1)

    local = parts
    if rank_col is not None:
        local = local.withColumn("_rn", F.row_number().over(w))
    for src, out in prefix_sums.items():
        local = local.withColumn(
            f"_ps_{out}", F.coalesce(F.sum(src).over(w_excl), F.lit(0)))

    aggs = [F.count("*").alias("_cnt")] + [
        F.sum(src).alias(f"_tot_{out}") for src, out in prefix_sums.items()
    ]
    totals = sorted(
        parts.groupBy("_pid").agg(*aggs).collect(),
        key=lambda r: r["_pid"],
    )
    frac = {out: _is_fractional(df, src) for src, out in prefix_sums.items()}
    offsets = []
    run_cnt = 0
    run_sum = {out: (0.0 if frac[out] else 0) for out in prefix_sums.values()}
    for r in totals:
        offsets.append(
            (r["_pid"], run_cnt,
             *[run_sum[out] for out in prefix_sums.values()]))
        run_cnt += r["_cnt"]
        for _, out in prefix_sums.items():
            run_sum[out] += r[f"_tot_{out}"] or 0
    off_schema = ", ".join(
        ["_pid int", "_off_cnt long"]
        + [f"_off_{out} double" if frac[out] else f"_off_{out} long"
           for _, out in prefix_sums.items()])
    empty_row = tuple(
        [0, 0] + [(0.0 if frac[out] else 0) for out in prefix_sums.values()])
    offs = spark.createDataFrame(offsets or [empty_row], off_schema)

    out_df = local.join(F.broadcast(offs), "_pid")
    if rank_col is not None:
        out_df = out_df.withColumn(
            rank_col,
            (F.col("_off_cnt") + F.col("_rn") - 1 + rank_start)
            .cast("long"))
    for src, out in prefix_sums.items():
        out_df = out_df.withColumn(
            out, F.col(f"_off_{out}") + F.col(f"_ps_{out}"))
    drop = ["_pid", "_off_cnt"] + (
        ["_rn"] if rank_col is not None else [])
    drop += [c for out in prefix_sums.values()
             for c in (f"_ps_{out}", f"_off_{out}")]
    return out_df.drop(*drop)


def _is_fractional(df: DataFrame, col: str) -> bool:
    from pyspark.sql.types import DoubleType, FloatType

    try:
        t = df.schema[col].dataType
        return isinstance(t, (DoubleType, FloatType))
    except Exception:
        return False
