"""P29 — entity-linker hyperparameter search.

Reference (optimization/optimize_el.py:12-97): random-restart hill climbing
over the ES linker's (alpha, beta, min_score, max_results), objective =
macro recall of linked mentions against RED-FM dev gold.

Spark shape: the *evaluation* of one configuration is a full distributed
job (link → eval join); the hill-climbing loop is driver-side control flow
over those jobs — the correct split, since each step depends on the
previous score. A seeded ``random.Random`` keeps runs reproducible.
"""

from __future__ import annotations

import random
from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from waka_spark.config import LinkerConfig

# neighborhood steps per tunable (optimize_el.py perturbs one param at a time)
_STEPS = {
    "alpha": (0.5, [0.5, 8.0]),
    "beta": (0.2, [0.2, 4.0]),
    "min_score": (2.0, [0.0, 40.0]),
    "max_results": (5, [1, 100]),
}


def macro_recall(
    candidates: DataFrame, gold_mentions: DataFrame
) -> float:
    """Macro (per-doc averaged) recall of linked (span, url) vs gold —
    the reference's objective (optimize_el.py:34-60; kg.py:53-88)."""
    comp = candidates.select(
        "conv_id", "start_idx", "end_idx", "url").distinct()
    gld = gold_mentions.select(
        "conv_id", "start_idx", "end_idx", "url").distinct()
    hit = comp.join(gld, ["conv_id", "start_idx", "end_idx", "url"])
    per_doc = (
        gld.groupBy("conv_id").agg(F.count("*").alias("n_gold"))
        .join(hit.groupBy("conv_id").agg(F.count("*").alias("tp")),
              "conv_id", "left")
        .na.fill(0, ["tp"])
        .select((F.col("tp") / F.col("n_gold")).alias("recall"))
    )
    row = per_doc.agg(F.avg("recall")).collect()[0][0]
    return float(row or 0.0)


def optimize_linker(
    mentions: DataFrame,
    aliases: DataFrame,
    gold_mentions: DataFrame,
    base: LinkerConfig = LinkerConfig(),
    restarts: int = 3,
    steps_per_restart: int = 8,
    seed: int = 42,
) -> tuple[LinkerConfig, float]:
    """Random-restart hill climbing; returns (best config, best recall)."""
    from waka_spark.operators.linking import link_entities

    rng = random.Random(seed)

    def evaluate(cfg: LinkerConfig) -> float:
        return macro_recall(
            link_entities(mentions, aliases, cfg=cfg), gold_mentions)

    def random_config() -> LinkerConfig:
        return replace(
            base,
            alpha=round(rng.uniform(*_STEPS["alpha"][1]), 2),
            beta=round(rng.uniform(*_STEPS["beta"][1]), 2),
            min_score=round(rng.uniform(*_STEPS["min_score"][1]), 1),
            max_results=rng.randint(*_STEPS["max_results"][1]),
        )

    best_cfg, best_score = base, evaluate(base)
    for restart in range(restarts):
        cfg = base if restart == 0 else random_config()
        score = evaluate(cfg) if restart else best_score
        for _ in range(steps_per_restart):
            param = rng.choice(list(_STEPS))
            step, (lo, hi) = _STEPS[param]
            direction = rng.choice((-1, 1))
            value = getattr(cfg, param) + direction * step
            value = type(getattr(cfg, param))(min(max(value, lo), hi))
            neighbor = replace(cfg, **{param: value})
            neighbor_score = evaluate(neighbor)
            if neighbor_score > score:
                cfg, score = neighbor, neighbor_score
        if score > best_score:
            best_cfg, best_score = cfg, score
    return best_cfg, best_score
