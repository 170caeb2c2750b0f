"""Structured Streaming ingestion of conversation turns.

The reference is request/response (serve.py:46-64) — no streams exist in it
(SURVEY.md §2.3). At 10^12-turn scale, new turns arrive continuously; this
module gives the engine a streaming front end with the same table contract:

- ``stream_transcripts``: readStream over the transcripts table directory
  (file source here; Kafka/Iceberg CDC on a real deployment — same API).
- ``streaming_turn_counts``: watermarked tumbling-window per-conv turn
  counts — the canonical late-data-tolerant aggregation.
- ``incremental_mentions``: the NER stage applied to a stream (stateless
  mapInPandas works unchanged on streaming DataFrames) → append sink.
- ``conversation_sessions``: ``applyInPandasWithState`` custom stateful
  operator assembling per-conv running documents with a session timeout —
  the streaming analog of P1 assembly.

The downstream batch pipeline consumes the checkpointed micro-batch output
(foreachBatch → the checkpoint runner), so batch and streaming share every
operator implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from waka_spark import schemas


def stream_transcripts(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_turn_counts(turns: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Late-data-tolerant tumbling-window turn counts per conversation."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "conv_id", "n_turns")
    )


def incremental_mentions(turns: DataFrame, gazetteer) -> DataFrame:
    """Stateless NER over the stream: per-turn mention extraction using the
    identical batch operator (mapInPandas is streaming-safe)."""
    from waka_spark.operators.ner import gazetteer_ner

    per_turn_docs = turns.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
        .alias("conv_id"),
        "text",
    )
    return gazetteer_ner(per_turn_docs, gazetteer)


SESSION_STATE_SCHEMA = "turn_count INT, text STRING"
SESSION_OUT_SCHEMA = (
    "conv_id STRING, n_turns INT, text STRING, closed BOOLEAN"
)


def conversation_sessions(turns: DataFrame, timeout_ms: int = 60_000) -> DataFrame:
    """Custom stateful operator: per-conv running document assembly with a
    processing-time session timeout (applyInPandasWithState). Emits the
    running document on every update and a final ``closed=true`` row when
    the conversation times out."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assemble(key, pdfs, state: GroupState):
        import pandas as pd

        conv_id = key[0]
        if state.hasTimedOut:
            count, text = state.get if state.exists else (0, "")
            state.remove()
            yield pd.DataFrame([{
                "conv_id": conv_id, "n_turns": count,
                "text": text, "closed": True,
            }])
            return
        count, text = state.get if state.exists else (0, "")
        rows = pd.concat(list(pdfs)).sort_values("turn_idx")
        for t in rows["text"]:
            text = f"{text} {t}".strip()
        count += len(rows)
        state.update((count, text))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame([{
            "conv_id": conv_id, "n_turns": count, "text": text, "closed": False,
        }])

    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_stream_to_graph(
    spark: SparkSession,
    input_path: str,
    pipeline,
    output_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """foreachBatch bridge: each micro-batch of turns runs through the batch
    KG pipeline and appends to the edges table — batch/stream operator
    parity by construction."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = pipeline.run(batch_df, resolve=True)
        (
            out["triples"]
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(f"{output_path}/edges")
        )

    stream = stream_transcripts(spark, input_path)
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
