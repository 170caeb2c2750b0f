"""P29 hill-climbing linker optimization recovers a workable config."""

from waka_spark import schemas
from waka_spark.config import LinkerConfig
from waka_spark.operators.optimize import macro_recall, optimize_linker


def test_optimize_linker_raises_recall(spark):
    mentions = spark.createDataFrame(
        [("c1", 0, 6, "Weimar", "GPE", None),
         ("c1", 10, 17, "Germany", "GPE", None),
         ("c2", 0, 6, "Weimar", "GPE", None)],
        schemas.MENTIONS,
    )
    # rare-alias gold: a high min_score floor filters the correct low-
    # frequency candidates out, so optimization must lower it
    aliases = spark.createDataFrame(
        [("weimar", "Q3955", "Weimar", "city", 2),
         ("germany", "Q183", "Germany", "country", 2)],
        schemas.WD_ALIASES,
    )
    gold = spark.createDataFrame(
        [("c1", 0, 6, "Weimar", "Q3955"),
         ("c1", 10, 17, "Germany", "Q183"),
         ("c2", 0, 6, "Weimar", "Q3955")],
        schemas.GOLD_MENTIONS,
    )
    bad = LinkerConfig(min_score=40.0)  # raw ~= 2*10*1.6*ln(3) = 35 < 40
    from waka_spark.operators.linking import link_entities

    assert macro_recall(link_entities(mentions, aliases, cfg=bad), gold) == 0.0

    best_cfg, best_score = optimize_linker(
        mentions, aliases, gold, base=bad, restarts=2, steps_per_restart=6)
    assert best_score == 1.0
    assert best_cfg.min_score < 36.0
