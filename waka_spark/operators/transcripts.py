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


def task_outcome_pairs(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Instruction-response pair mining: per conversation, the FIRST user
    turn (the task) and the LAST assistant turn (the outcome) — the
    cheapest SFT-pair extraction over raw transcripts, and the unit most
    preference/distillation pipelines start from.

    ONE hash agg per conversation using ``min_by``/``max_by`` on the turn
    index (no windows, no self-joins; map-side partial combine applies).
    Conversations missing either role emit NULL on that side — callers
    filter or route to repair.

    Output: (conv_id, task_text, task_turn, outcome_text, outcome_turn,
    n_turns).
    """
    is_user = F.col(role_col) == "user"
    is_asst = F.col(role_col) == "assistant"
    turn = F.col(turn_col)
    return transcripts.groupBy(F.col(conv_col).alias("conv_id")).agg(
        F.min_by(
            F.when(is_user, F.col(text_col)), F.when(is_user, turn)
        ).alias("task_text"),
        F.min(F.when(is_user, turn)).alias("task_turn"),
        F.max_by(
            F.when(is_asst, F.col(text_col)), F.when(is_asst, turn)
        ).alias("outcome_text"),
        F.max(F.when(is_asst, turn)).alias("outcome_turn"),
        F.count("*").cast("long").alias("n_turns"),
    )


def boilerplate_turns(
    transcripts: DataFrame,
    min_convs: int = 3,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Templated-turn detection: normalized turn texts appearing in at
    least ``min_convs`` DISTINCT conversations — system prompts, canned
    greetings, tool banners. These are the transcript analog of web
    boilerplate: left in, they dominate n-gram statistics and produce
    cross-conversation near-dup false positives; pipelines scrub or
    down-weight them before dedup/training.

    One distinct projection + one hash-agg keyed by the text hash (the
    text itself travels via ``any_value``, not as the grouping key, so
    the shuffle carries a fixed-width hash). Output: (text_hash, text,
    n_convs, n_occurrences) for flagged turns.
    """
    norm = F.regexp_replace(
        F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = transcripts.select(
        F.col(conv_col).alias("conv_id"),
        F.md5(norm).alias("text_hash"),
        norm.alias("_text"),
    )
    return (
        base.groupBy("text_hash")
        .agg(
            F.first("_text").alias("text"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )
