"""Conversation-transcript operators over the input_hint schema
(conv_id, turn_idx, role, text, tool, ts) — the training-prep passes a
transcript corpus runs between assembly and tokenization.

Reference anchor: waka consumes whole documents (document.py:24-55); a
transcript pipeline must first decide WHICH turns form the document.
These operators make that decision auditable: token-budgeted context
tails (what fits the window) and role-mask accounting (what the loss
actually trains on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _n_tokens(text_col: str):
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    return F.size(F.filter(words, lambda w: w != ""))


def context_tail(
    transcripts: DataFrame,
    token_budget: int = 64,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Token-budgeted context-window selection: for every conversation,
    keep the longest SUFFIX of turns whose cumulative whitespace-token
    count fits ``token_budget`` — the newest-first truncation every
    chat-model training/serving pipeline applies before tokenization
    (drop oldest turns first, never split a turn).

    One window per conversation: a reverse-chronological running token
    sum (``rows unbounded preceding`` over turn_idx DESC), then
    ``kept = cum_tokens <= budget``. Single shuffle keyed by conv_id,
    no self-join, no UDF; skew equals conversation-length skew, which the
    upstream salted assembly already bounds.

    Output: (conv_id, turn_idx, n_tokens, cum_tokens_from_end, kept) for
    every turn — callers filter ``kept`` for the window, or audit exactly
    what a budget drops.
    """
    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        transcripts.select(
            F.col(conv_col).alias("conv_id"),
            F.col(turn_col).alias("turn_idx"),
            _n_tokens(text_col).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens_from_end", F.sum("n_tokens").over(w))
        .withColumn("kept", F.col("cum_tokens_from_end") <= token_budget)
    )


def loss_mask_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    trained_role: str = "assistant",
) -> DataFrame:
    """Per-conversation loss-mask accounting: how many tokens the loss
    actually trains on when only ``trained_role`` turns are unmasked (the
    standard SFT convention — user/tool turns are context, assistant
    turns are targets). A corpus where mask_ratio collapses toward 0
    trains slowly per FLOP; this is the number a data pipeline monitors
    when mixing transcript sources.

    ONE hash agg keyed by conv_id (map-side partials): (n_turns,
    total_tokens, trained_tokens, mask_ratio).
    """
    n_tok = _n_tokens(text_col)
    trained = F.when(
        F.col(role_col) == trained_role, n_tok).otherwise(F.lit(0))
    return (
        transcripts.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(n_tok).cast("long").alias("total_tokens"),
            F.sum(trained).cast("long").alias("trained_tokens"),
        )
        .withColumn(
            "mask_ratio",
            F.round(
                F.col("trained_tokens")
                / F.greatest(F.col("total_tokens"), F.lit(1)),
                6,
            ),
        )
    )
