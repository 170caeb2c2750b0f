"""P20 — triple coherence scorer (the reference's alternate SentenceBert
TripleScorer, semantics.py:23-52, unused in the default pipeline but part
of the operator surface).

Semantics: for each candidate triple, embed the three texts
``f"{x.label} is {x.description}"`` for subject/predicate/object, and
multiply the triple score by the mean of the three pairwise cosine
similarities (subj-pred, pred-obj, subj-obj).

Backends: lexical token-overlap (deterministic, CPU — same calibration
family as the rerank surrogate) and SBERT (via
transformer_backends.sbert_similarity_scorer on a real cluster). Plugs into
``fuse_triples(extra_scorer=coherence_scorer())``.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tokens(s: str) -> set[str]:
    return set(re.findall(r"[a-z0-9]+", (s or "").lower()))


def _jaccard(a: set[str], b: set[str]) -> float:
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def lexical_coherence(subj: str, pred: str, obj: str) -> float:
    """Mean pairwise similarity of the three verbalized endpoint texts,
    affinely calibrated to the SBERT cos-sim range (cf. rerank backend)."""
    ts, tp, to = _tokens(subj), _tokens(pred), _tokens(obj)
    mean_j = (_jaccard(ts, tp) + _jaccard(tp, to) + _jaccard(ts, to)) / 3.0
    return 0.3 + 0.7 * mean_j


@F.pandas_udf(T.DoubleType())
def _coherence_udf(subj: pd.Series, pred: pd.Series, obj: pd.Series) -> pd.Series:
    return pd.Series([
        lexical_coherence(s, p, o) for s, p, o in zip(subj, pred, obj)
    ])


def coherence_scorer() -> Callable[[DataFrame], DataFrame]:
    """extra_scorer for fuse_triples: score *= coherence (semantics.py:49-50).
    Scores each distinct verbalization triple once, then joins back (the
    same dedup-before-model pattern as P11/P19)."""

    def score(candidates: DataFrame) -> DataFrame:
        verbal = candidates.withColumn(
            "_v_s", F.format_string("%s is %s", "subj_label", "subj_description")
        ).withColumn(
            "_v_p", F.format_string("%s is %s", "pred_label", "pred_description")
        ).withColumn(
            "_v_o", F.format_string("%s is %s", "obj_label", "obj_description")
        )
        distinct = (
            verbal.select("_v_s", "_v_p", "_v_o").distinct()
            .withColumn("_coh", _coherence_udf("_v_s", "_v_p", "_v_o"))
        )
        return (
            verbal.join(distinct, ["_v_s", "_v_p", "_v_o"], "left")
            .withColumn("score", F.col("score") * F.coalesce("_coh", F.lit(1.0)))
            .drop("_v_s", "_v_p", "_v_o", "_coh")
        )

    return score
