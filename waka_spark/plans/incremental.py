"""Incremental KG maintenance: merge a delta batch of fused triples into
the materialized edges table.

The reference rebuilds an isolated KG per request (kg_construction.py:
267-282); a 10^12-turn corpus pipeline instead materializes nodes/edges
tables once and folds each new transcript batch in. On Iceberg this is
``MERGE INTO edges USING delta ON identity`` — row-level upsert with
copy-on-write/merge-on-read handled by the table format. The operator
below is the engine-side semantics of that merge, expressed as one
full-outer-shaped aggregation so it also runs against plain parquet
(read base → merge → overwrite-partition), which is how the tests and
the DuckDB oracle exercise it.

Merge semantics per edge identity (subj_url, pred_url, obj_url):
- ``score``:   max(base, delta) — the best evidence wins (same rule as
  the in-batch P22 dedup, fusion.py).
- ``support``: base + delta occurrence counts — evidence accumulates.
- ``n_convs``: count of distinct contributing conversations.

Scale shape: ONE hash shuffle on the edge identity (union → groupBy).
The base table side arrives pre-aggregated (one row per identity), so
the agg's map-side partial combine collapses the delta's duplicates
before the shuffle; with the base stored bucketed by identity hash (or
as Iceberg MERGE with its identity join), the base side never reshuffles
at all. No windows, no joins, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_KEY = ["subj_url", "pred_url", "obj_url"]


def edges_from_triples(triples: DataFrame) -> DataFrame:
    """Per-batch edges table from fused per-conversation triples
    (the P22 output shape): one row per edge identity with max score,
    occurrence support, and distinct contributing conversations."""
    return (
        triples
        .groupBy(*EDGE_KEY)
        .agg(
            F.max("score").alias("score"),
            F.count("*").cast("long").alias("support"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
        )
    )


def merge_edges(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold ``delta`` (same schema as ``edges_from_triples`` output) into
    ``base``: full-outer merge by edge identity.

    Equivalent Iceberg statement::

        MERGE INTO edges b USING delta d
        ON  b.subj_url = d.subj_url AND b.pred_url = d.pred_url
            AND b.obj_url = d.obj_url
        WHEN MATCHED THEN UPDATE SET
            score = greatest(b.score, d.score),
            support = b.support + d.support,
            n_convs = b.n_convs + d.n_convs
        WHEN NOT MATCHED THEN INSERT *

    (``n_convs`` becomes an upper bound under repeated merges of the
    same conversation — exact distinctness across batches would need a
    sketch (HLL) or the conv-level edge log; batches are disjoint by
    construction in the checkpointed pipeline, where each conv_id is
    processed exactly once — plans/checkpoint.py manifests.)
    """
    return (
        base.unionByName(delta)
        .groupBy(*EDGE_KEY)
        .agg(
            F.max("score").alias("score"),
            F.sum("support").cast("long").alias("support"),
            F.sum("n_convs").cast("long").alias("n_convs"),
        )
    )


def nodes_from_triples(triples: DataFrame) -> DataFrame:
    """Per-batch NODES table from fused per-conversation triples — the
    other half of the north star's "materialize nodes/edges tables"
    (edges_from_triples above). One row per entity url:

    - ``n_as_subj`` / ``n_as_obj``: directed participation counts.
    - ``support``: total triple occurrences touching the node.
    - ``n_convs``: distinct conversations mentioning the node.
    - ``score``: best evidence score across occurrences (max).

    Scale shape: endpoint union (narrow) → ONE hash shuffle on url with
    map-side partial combine. No windows, no joins.
    """
    ends = (
        triples.select(
            F.col("subj_url").alias("url"), "conv_id", "score",
            F.lit(1).alias("is_subj"))
        .unionByName(triples.select(
            F.col("obj_url").alias("url"), "conv_id", "score",
            F.lit(0).alias("is_subj")))
    )
    return (
        ends.groupBy("url")
        .agg(
            F.sum("is_subj").cast("long").alias("n_as_subj"),
            F.sum(1 - F.col("is_subj")).cast("long").alias("n_as_obj"),
            F.count("*").cast("long").alias("support"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.max("score").alias("score"),
        )
    )


def merge_nodes(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta batch's node stats into the materialized nodes table:
    same MERGE INTO shape as merge_edges (counts add, score maxes,
    ``n_convs`` exact under the checkpointed pipeline's disjoint batches
    — see merge_edges for the caveat)."""
    return (
        base.unionByName(delta)
        .groupBy("url")
        .agg(
            F.sum("n_as_subj").cast("long").alias("n_as_subj"),
            F.sum("n_as_obj").cast("long").alias("n_as_obj"),
            F.sum("support").cast("long").alias("support"),
            F.sum("n_convs").cast("long").alias("n_convs"),
            F.max("score").alias("score"),
        )
    )


def negative_samples(
    triples: DataFrame,
    k: int = 2,
) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training
    (TransE-style corruption): for each positive edge, ``k`` corrupted
    copies with the object replaced by a pseudo-randomly chosen other
    node.

    Determinism + scale: nodes get a dense index by sort order (one
    shuffle, computed once); corruption picks index
    ``md5(edge_identity : i) mod N`` — an equi-join on the index, never
    a cross join and no RNG state to ship, so the sample is reproducible
    across runs/engines (the DuckDB oracle recomputes it exactly).
    Corruptions that collide with the true object are kept but flagged
    degenerate (``is_degenerate``) rather than resampled — resampling
    loops are nondeterministic under retries; training loaders drop or
    reweight flagged rows.

    Output: (subj_url, pred_url, obj_url, neg_idx, neg_obj_url,
    is_degenerate).

    SCOPE CONTRACT (round-5, ADVICE): the returned frame depends on a
    pinned range partitioning whose boundaries the collected offsets
    describe (same algebra as ``plans/zipindex``). Inside a
    ``pin_scope``, consume the result BEFORE the scope exits — a
    post-exit action recomputes ``repartitionByRange`` and may resample
    different boundaries than the frozen offsets, corrupting
    ``node_idx``.
    """
    from pyspark.sql import Window

    spark = triples.sparkSession
    nodes = (
        triples.select(F.col("subj_url").alias("node"))
        .unionByName(triples.select(F.col("obj_url").alias("node")))
        .distinct()
    )
    # Dense 0..N-1 index by global sort order WITHOUT a global sort
    # (round-3 fix: the old unpartitioned row_number() funneled the whole
    # node dictionary — 10^9-10^10 rows at KG scale — through one task).
    # zipWithIndex algebra: range-partition on node (partition p's nodes
    # all sort before partition p+1's), rank within each partition, then
    # add per-partition cumulative offsets. The offsets come from a
    # driver-collected count per partition (n_parts rows — the same tiny
    # count job RDD.zipWithIndex runs) broadcast back as a literal dim.
    # Deterministic: the final index equals the global rank regardless of
    # where the sampled range boundaries land, so it matches the oracle's
    # row_number() OVER (ORDER BY node) exactly.
    # persist is load-bearing (see plans/zipindex.py): the counts collect
    # and the final join are separate jobs, and an unpersisted
    # repartitionByRange can resample different range boundaries per job
    # (RangePartitioner seeds by RDD id) — offsets would then describe a
    # partitioning the rank job never had, silently corrupting node_idx.
    # registered via pins.pin() (round-4, ADVICE) so pin_scope callers
    # release the cache block AND its CacheManager entry on scope exit
    from waka_spark.plans.pins import pin

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = pin(
        nodes.repartitionByRange(n_parts, "node")
        .withColumn("_pid", F.spark_partition_id())
    )
    ranked = parts.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("_pid").orderBy("node"))
    )
    cnt_rows = sorted(
        parts.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect(),
        key=lambda r: r["_pid"],
    )
    run = 0
    offsets = []
    for r in cnt_rows:
        offsets.append((r["_pid"], run))
        run += r["_cnt"]
    n_nodes = run
    offs = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    idx = ranked.join(F.broadcast(offs), "_pid").select(
        "node",
        (F.col("_off") + F.col("_rn") - 1).cast("long").alias("node_idx"),
    )

    fanned = triples.select(*EDGE_KEY).distinct().select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_idx"),
    ).withColumn(
        "_pick",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    ":", "subj_url", "pred_url", "obj_url", "neg_idx")),
                1, 8,
            ),
            16, 10,
        ).cast("long") % n_nodes,
    )
    return (
        fanned.join(idx, fanned["_pick"] == idx["node_idx"])
        .select(
            *EDGE_KEY,
            "neg_idx",
            F.col("node").alias("neg_obj_url"),
            (F.col("node") == F.col("obj_url")).cast("int")
            .alias("is_degenerate"),
        )
    )


def predicate_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate schema profile over the materialized KG — the
    cardinality/functionality statistics an ontology curator (or a
    downstream embedding trainer choosing 1-N/N-1 corruption sides, cf.
    TransH/TransR's bernoulli sampling) reads off the edges table. The
    reference carries predicate metadata only as per-triple URLs
    (kg_construction.py:253-257, relation_linking.py:18); at corpus scale
    the aggregate view is what reveals schema drift (a supposedly
    functional predicate like date-of-birth acquiring multi-valued
    subjects is an extraction-bug alarm).

    Per ``pred_url`` over the DISTINCT edge identities:

    - ``n_edges``:    distinct (subj, obj) pairs using the predicate.
    - ``n_subjects`` / ``n_objects``: distinct endpoint entities.
    - ``max_out_fanout``: max distinct objects for one subject (1 ⇒
      functional), ``max_in_fanout``: max distinct subjects for one
      object (1 ⇒ inverse-functional).
    - ``functionality`` = n_subjects / n_edges, ``inv_functionality`` =
      n_objects / n_edges (Suchanek et al., PARIS, VLDB'12) — both 1.0
      exactly when the predicate is (inverse-)functional.

    Scale shape: one distinct on the edge identity (the same shuffle the
    P22 dedup already paid — feed this the edges table and it is
    pre-deduped), then two partial-agg reductions keyed by (pred, subj) /
    (pred, obj) and a final |preds|-row join. No windows, no skew hazard:
    the heaviest key a reducer sees is one predicate's edge list, split
    map-side by the two-level agg.
    """
    e = triples.select(*EDGE_KEY).distinct()
    by_subj = (
        e.groupBy("pred_url", "subj_url")
        .agg(F.count("*").alias("_fan"))
        .groupBy("pred_url")
        .agg(
            F.sum("_fan").cast("long").alias("n_edges"),
            F.count("*").cast("long").alias("n_subjects"),
            F.max("_fan").cast("long").alias("max_out_fanout"),
        )
    )
    by_obj = (
        e.groupBy("pred_url", "obj_url")
        .agg(F.count("*").alias("_fan"))
        .groupBy("pred_url")
        .agg(
            F.count("*").cast("long").alias("n_objects"),
            F.max("_fan").cast("long").alias("max_in_fanout"),
        )
    )
    return by_subj.join(by_obj, "pred_url").select(
        "pred_url", "n_edges", "n_subjects", "n_objects",
        "max_out_fanout", "max_in_fanout",
        F.round(F.col("n_subjects") / F.col("n_edges"), 6)
        .alias("functionality"),
        F.round(F.col("n_objects") / F.col("n_edges"), 6)
        .alias("inv_functionality"),
    )


def functional_violations(
    triples: DataFrame, min_functionality: float = 0.9
) -> DataFrame:
    """Ontology-consistency screen: for predicates that are
    STATISTICALLY functional (PARIS functionality ≥ threshold — date of
    birth, capital-of, born-in), list the subjects asserting MORE THAN
    ONE object — each such key is an extraction bug, a failed entity
    resolution, or a genuinely contested fact, and is exactly what a KG
    curator triages first. The row-level drill-down of
    :func:`predicate_profile` (which only says "this predicate drifted").

    Scale shape: the profile (|preds| rows) broadcasts back onto one
    (pred, subj) distinct-count agg over the deduped edge identities —
    the same two-level aggregation the profile itself runs, no windows.

    Output: (pred_url, subj_url, n_objects, functionality), subjects
    violating a ≥-threshold predicate, n_objects > 1.
    """
    prof = predicate_profile(triples).filter(
        F.col("functionality") >= min_functionality
    ).select("pred_url", "functionality")
    e = triples.select(*EDGE_KEY).distinct()
    fans = e.groupBy("pred_url", "subj_url").agg(
        F.countDistinct("obj_url").cast("long").alias("n_objects"))
    return (
        fans.join(F.broadcast(prof), "pred_url")
        .filter(F.col("n_objects") > 1)
        .select("pred_url", "subj_url", "n_objects", "functionality")
    )


def apply_edge_changes(base: DataFrame, changes: DataFrame) -> DataFrame:
    """MERGE with retractions — the KG-correction flow the plain
    :func:`merge_edges` upsert cannot express (an extraction bug fixed
    upstream must DELETE its asserted edges, not merely down-weight
    them). ``changes`` rows carry ``op`` ∈ {'upsert', 'retract'}:

        MERGE INTO edges b USING changes d ON <edge identity>
        WHEN MATCHED AND d.op = 'retract' THEN DELETE
        WHEN MATCHED THEN UPDATE SET <merge_edges algebra>
        WHEN NOT MATCHED AND d.op = 'upsert' THEN INSERT *

    Matched-clause order = delete-then-insert: an identity both
    retracted and upserted in one batch re-asserts from the upsert's
    values ALONE (the base row is gone). Retracting an absent identity
    is a no-op.

    Scale shape: one left_anti on the edge identity (the retract set is
    typically tiny — broadcast) + the merge hash agg; everything keyed
    by the same (subj, pred, obj) identity, so AQE reuses one
    partitioning.
    """
    retracts = (
        changes.filter(F.col("op") == "retract").select(*EDGE_KEY).distinct()
    )
    upserts = changes.filter(F.col("op") == "upsert").drop("op")
    kept = base.join(retracts, EDGE_KEY, "left_anti")
    return merge_edges(kept, upserts)
