"""P23-P24 — entity-mention conflict resolution (exact reference semantics).

Reference (kg_construction.py:111-192): after best-triple selection, the
entities appearing in triples get their mention lists arbitrated:

- P23 intra-entity (kg_construction.py:119-140): within each entity, for
  every overlapping span pair (over a *snapshot* of the mention list, while
  removals hit the live list), drop the mention with the larger
  Levenshtein(label, text); overlap is inclusive on both ends (kg.py:90-91).
- P24 cross-entity loop (kg_construction.py:142-157): repeatedly find all
  (entity, mention) pairs whose spans overlap across different entities,
  score each ``(1 - lev/maxlen) * (1/|mentions|) * len(text) * score``
  (kg_construction.py:159-170), remove the lowest-scoring pair's mention,
  until conflict-free. Then triples whose subject/object lost every mention
  die, and mention-less entities are pruned (kg_construction.py:151-155).

This is inherently iterative with data-dependent order — per *conversation*
the data is tiny, so it runs as an ``applyInPandas`` grouped map (exact
Python semantics, Arrow-batched, one task per conv partition). The
reference's two nondeterminisms — ``set``-ordered conflict lists and
``list(set())`` entity order — are replaced by explicit tie-breaks
(documented in SURVEY.md §4): entities ordered by url; conflicts ordered by
(score, url, start_idx, end_idx).

Cross-conversation entity resolution at whole-graph scale is the separate
union-find pass (plans/unionfind.py).
"""

from __future__ import annotations

import heapq
import json
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESOLVED_SCHEMA = "conv_id string, url string, label string, mentions_json string"


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _overlaps(m1: dict, m2: dict) -> bool:
    # inclusive overlap predicate, kg.py:90-91
    return m1["end_idx"] >= m2["start_idx"] and m2["end_idx"] >= m1["start_idx"]


def _label_distance(label: str | None, text: str) -> int:
    return _levenshtein(label if label is not None else "", text)


def _conflict_score(entity: dict, mention: dict) -> float:
    # kg_construction.py:159-170
    label = entity["label"]
    text = mention["text"] or ""
    dist = _label_distance(label, text)
    denom = max(len(label) if label is not None else 0, len(text))
    dist_score = 1 - (dist / denom) if denom else 0.0
    num_mentions = 1 / len(entity["mentions"])
    return dist_score * num_mentions * len(text) * (mention["score"] or 0.0)


def _overlapping_pairs(
    items: list[tuple[int, int, int, object]]
) -> list[tuple[object, object]]:
    """All pairs of inclusively-overlapping intervals via a sweep line:
    O(m log m + k) instead of the reference's all-pairs scan — the pair
    *set* is identical, so downstream semantics are unchanged.

    items: (start, end, seq, payload); seq preserves insertion order so
    callers can re-order pairs to match reference iteration order.
    """
    pairs: list[tuple[object, object]] = []
    active: list[tuple[int, int, int, object]] = []
    for it in sorted(items, key=lambda x: (x[0], x[1], x[2])):
        start = it[0]
        active = [a for a in active if a[1] >= start]  # inclusive overlap
        pairs.extend((a[3], it[3]) for a in active)
        active.append(it)
    return pairs


def _find_conflicts(entities: list[dict]) -> list[tuple[dict, dict]]:
    """kg_construction.py:173-192 — cross-entity overlapping (entity,
    mention) pairs, found by interval sweep over all live mentions."""
    items = []
    seq = 0
    for k, ent in enumerate(entities):
        for m in ent["mentions"]:
            if m["start_idx"] is None or m["end_idx"] is None:
                continue
            items.append((m["start_idx"], m["end_idx"], seq, (k, ent, m)))
            seq += 1
    conflicts: list[tuple[dict, dict]] = []
    seen: set[tuple[int, int]] = set()
    for (k1, e1, m1), (k2, e2, m2) in _overlapping_pairs(items):
        if k1 == k2:
            continue  # cross-entity only
        for ent, men in ((e1, m1), (e2, m2)):
            key = (id(ent), id(men))
            if key not in seen:
                seen.add(key)
                conflicts.append((ent, men))
    return conflicts


def _static_score(entity: dict, mention: dict) -> float:
    """The mention-count-independent factor of _conflict_score:
    _conflict_score(e, m) == _static_score(e, m) / len(e["mentions"])."""
    label = entity["label"]
    text = mention["text"] or ""
    dist = _label_distance(label, text)
    denom = max(len(label) if label is not None else 0, len(text))
    dist_score = 1 - (dist / denom) if denom else 0.0
    return dist_score * len(text) * (mention["score"] or 0.0)


def _resolve_p24_rescan(live: list[dict]) -> None:
    """Reference-shaped loop (full conflict re-scan per removal) — fallback
    for the never-observed case of a negative mention score, where the
    monotone-score argument behind the lazy heap does not hold."""
    conflicts = _find_conflicts(live)
    while conflicts:
        conflicts.sort(key=lambda pair: (
            _conflict_score(pair[0], pair[1]),
            pair[0]["url"] or "",
            pair[1]["start_idx"] if pair[1]["start_idx"] is not None else -1,
            pair[1]["end_idx"] if pair[1]["end_idx"] is not None else -1,
        ))
        entity, mention = conflicts[0]
        entity["mentions"] = [m for m in entity["mentions"] if m is not mention]
        live = [e for e in live if e["mentions"]]
        conflicts = _find_conflicts(live)


def _resolve_p24(live: list[dict]) -> None:
    """Incremental cross-entity fixpoint: identical removal sequence to
    _resolve_p24_rescan (see _resolve_group comment for the monotonicity
    proof), O((m + pairs) log m) instead of O(removals * m log m)."""
    items = []
    nodes: list[tuple[int, dict, dict, float]] = []  # (ent_idx, ent, mention, static)
    for k, ent in enumerate(live):
        for m in ent["mentions"]:
            if m["start_idx"] is None or m["end_idx"] is None:
                continue
            nid = len(nodes)
            static = _static_score(ent, m)
            if static < 0:
                _resolve_p24_rescan(live)
                return
            nodes.append((k, ent, m, static))
            items.append((m["start_idx"], m["end_idx"], nid, nid))

    adj: dict[int, set[int]] = defaultdict(set)
    for n1, n2 in _overlapping_pairs(items):
        if nodes[n1][0] == nodes[n2][0]:
            continue  # cross-entity only
        adj[n1].add(n2)
        adj[n2].add(n1)

    ent_version = [0] * len(live)

    def entry(nid: int) -> tuple:
        k, ent, m, static = nodes[nid]
        return (
            static / len(ent["mentions"]),
            ent["url"] or "",
            m["start_idx"],
            m["end_idx"],
            nid,
            ent_version[k],
        )

    heap = [entry(nid) for nid in adj]
    heapq.heapify(heap)
    removed: set[int] = set()
    while heap:
        _, _, _, _, nid, ver = heapq.heappop(heap)
        if nid in removed or not adj.get(nid):
            continue  # already pruned, or no longer in any conflict
        k, ent, m, _static = nodes[nid]
        if ver != ent_version[k]:
            # stale (the entity lost a mention since push -> score grew);
            # old key was a lower bound, so recompute and re-push
            heapq.heappush(heap, entry(nid))
            continue
        ent["mentions"] = [mm for mm in ent["mentions"] if mm is not m]
        ent_version[k] += 1
        removed.add(nid)
        for nb in adj.pop(nid):
            adj[nb].discard(nid)


def _resolve_group(pdf: pd.DataFrame) -> pd.DataFrame:
    entities = []
    for _, row in pdf.sort_values("url").iterrows():
        entities.append({
            "conv_id": row["conv_id"],
            "url": row["url"],
            "label": row["label"] if pd.notna(row["label"]) else None,
            "mentions": json.loads(row["mentions_json"]),
        })

    # ---- P23: intra-entity overlap pruning over a snapshot ----------------
    # the sweep finds the overlapping-pair set; processing the pairs in
    # (i, j) snapshot order reproduces the reference's nested-loop order
    # exactly (kg_construction.py:119-140)
    for entity in entities:
        snapshot = entity["mentions"][:]
        items = [
            (m["start_idx"], m["end_idx"], i, i)
            for i, m in enumerate(snapshot)
            if m["start_idx"] is not None and m["end_idx"] is not None
        ]
        overlap_idx = sorted(
            (min(i, j), max(i, j)) for i, j in _overlapping_pairs(items)
        )
        for i, j in overlap_idx:
            mi, mj = snapshot[i], snapshot[j]
            di = _label_distance(entity["label"], mi["text"] or "")
            dj = _label_distance(entity["label"], mj["text"] or "")
            loser = mi if di > dj else mj
            entity["mentions"] = [
                m for m in entity["mentions"] if m is not loser
            ]

    # ---- P24: cross-entity fixpoint loop ----------------------------------
    # Incremental formulation of kg_construction.py:142-157. The reference
    # re-scans for conflicts after every removal; here the cross-entity
    # overlap graph is built once and maintained under deletions. The
    # selected pair each iteration is identical because
    #   score = static_part / len(entity.mentions)
    # with static_part >= 0, and len() only ever shrinks — so scores only
    # increase over time and a lazy min-heap (entity-version stamps,
    # recompute-and-repush on stale pop) always surfaces the true global
    # minimum. Turns O(removals * m log m) per conversation into
    # O((m + pairs) log m) — the Zipf-hot conversations stop being the
    # longest task of the whole stage.
    live = [e for e in entities if e["mentions"]]
    _resolve_p24(live)

    out = [
        {
            "conv_id": e["conv_id"],
            "url": e["url"],
            "label": e["label"],
            "mentions_json": json.dumps(e["mentions"], sort_keys=True),
        }
        for e in entities
        if e["mentions"]
    ]
    return pd.DataFrame(
        out, columns=["conv_id", "url", "label", "mentions_json"]
    )


def resolve_conflicts(entities_with_mentions: DataFrame) -> DataFrame:
    """entities(conv_id, url, label, mentions array<struct>) → surviving
    entities with pruned mention lists (as JSON, exploded by the caller)."""
    prepared = entities_with_mentions.select(
        "conv_id", "url", "label", F.to_json("mentions").alias("mentions_json")
    )
    return prepared.groupBy("conv_id").applyInPandas(
        _resolve_group, RESOLVED_SCHEMA
    )


def conflicted_conversations(participating: DataFrame) -> DataFrame:
    """conv_ids containing at least one overlapping mention pair, found with
    a single window pass: in per-conv start-order, an overlap exists iff
    some mention's start_idx <= the running max end_idx of its predecessors
    (inclusive overlap, kg.py:90-91). One shuffle, no pair materialization."""
    from pyspark.sql import Window

    spans = participating.select(
        "conv_id", F.explode("mentions").alias("m")
    ).select(
        "conv_id",
        F.col("m")["start_idx"].alias("start_idx"),
        F.col("m")["end_idx"].alias("end_idx"),
    ).filter(F.col("start_idx").isNotNull() & F.col("end_idx").isNotNull())
    w = (
        Window.partitionBy("conv_id")
        .orderBy("start_idx", "end_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        spans.withColumn("_prev_max_end", F.max("end_idx").over(w))
        .filter(F.col("start_idx") <= F.col("_prev_max_end"))
        .select("conv_id")
        .distinct()
    )


def apply_conflict_resolution(
    fused_triples: DataFrame, entities: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Run conflict resolution over the entities referenced by the fused
    triples; return (surviving triples, surviving entities-with-mentions).

    Scale design: the exact per-conv Python algorithm only runs for
    conversations that actually contain an overlapping mention pair
    (window-detected); conflict-free conversations — the overwhelming
    majority at corpus scale — pass through untouched (the algorithm is the
    identity on them, so the output is bit-identical).

    Triples survive iff both endpoints kept at least one mention
    (kg_construction.py:151-155) — realized as two semi joins.
    """
    used_urls = (
        fused_triples.select("conv_id", F.col("subj_url").alias("url"))
        .unionByName(fused_triples.select("conv_id", F.col("obj_url").alias("url")))
        .distinct()
    )
    from waka_spark.plans.pins import pin

    participating = pin(entities.join(
        used_urls, on=["conv_id", "url"], how="left_semi"
    ))

    conflicted = conflicted_conversations(participating)
    clean = participating.join(conflicted, "conv_id", "left_anti")
    dirty = participating.join(conflicted, "conv_id", "left_semi")

    # multiple consumers (semi joins + entities_out): persist, or the
    # per-conv Python grouped map runs repeatedly
    resolved_dirty = pin(resolve_conflicts(dirty))

    mention_schema = (
        "array<struct<start_idx:int,end_idx:int,text:string,e_type:string,"
        "label:string,description:string,score:double>>"
    )
    dirty_entities = (
        resolved_dirty
        .join(
            entities.select("conv_id", "url", "description", "score", "e_type"),
            on=["conv_id", "url"], how="left",
        )
        .withColumn("mentions", F.from_json("mentions_json", mention_schema))
        .drop("mentions_json")
    )
    entities_out = clean.unionByName(dirty_entities)

    surviving_urls = (
        clean.select("conv_id", "url")
        .unionByName(resolved_dirty.select("conv_id", "url"))
    )
    triples_out = (
        fused_triples
        .join(
            surviving_urls.withColumnRenamed("url", "subj_url"),
            on=["conv_id", "subj_url"], how="left_semi",
        )
        .join(
            surviving_urls.withColumnRenamed("url", "obj_url"),
            on=["conv_id", "obj_url"], how="left_semi",
        )
    )
    return triples_out, entities_out
