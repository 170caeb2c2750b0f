"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery here is real and tested — schemas, batch shapes,
partition behavior, UDF signatures. The *decode* step is a clearly marked
stub: the image/audio libraries are not in this container, so
``decode_image_features`` computes a deterministic fake (a byte histogram)
when ``backend="fake"`` and raises ``NotImplementedError`` for the real
backends (Pillow / torchaudio / pyav), which drop into the same UDF body.

Layout convention (one row per asset):

    assets(asset_id long, modality string, payload binary,
           meta struct<mime:string, n_bytes:long, width:int?, height:int?>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, modality string, payload binary, "
    "meta struct<mime:string, n_bytes:long>"
)

FEATURE_COLS = (
    "asset_id long, n_bytes long, feature array<double>"
)


def attach_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    modality: str = "image", mime: str = "image/fake",
) -> DataFrame:
    """Testing adapter: treat utf-8 text bytes as an opaque payload so the
    binary-column plumbing runs against any text corpus."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_features(
    assets: DataFrame, backend: str = "fake", n_bins: int = 16
) -> DataFrame:
    """payload → fixed-width feature vector, one Arrow batch at a time.

    ``backend="fake"``: deterministic byte histogram (n_bins buckets,
    L1-normalized) — exercises the exact batch shape the real decoder uses.
    ``backend="pillow"``: real image decode + downsample; requires PIL,
    raises NotImplementedError here.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if backend != "fake":
            raise NotImplementedError(
                f"decode backend {backend!r} needs image/audio libraries not "
                "present in this environment; the 'fake' backend exercises "
                "the identical Spark plumbing"
            )
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist, _ = np.histogram(buf, bins=n_bins, range=(0, 256))
                total = hist.sum() or 1
                rows.append({
                    "asset_id": asset_id,
                    "n_bytes": int(buf.size),
                    "feature": (hist / total).tolist(),
                })
            yield pd.DataFrame(rows, columns=["asset_id", "n_bytes", "feature"])

    return assets.select("asset_id", "payload").mapInPandas(decode, FEATURE_COLS)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing (video analog): slice the payload into
    fixed-stride 'frames', exploding to one row per frame — pure column
    ops, demonstrating the fan-out shape real frame extraction has.

    Zero-byte payloads emit ZERO frame rows: ``sequence(0, -1)`` is a
    *descending* sequence in Spark ([0, -1], two garbage frames), so the
    empty case is guarded with an explicit empty array."""
    idxs = F.when(
        F.col("meta.n_bytes") > 0,
        F.sequence(
            F.lit(0),
            F.least(
                F.floor(
                    (F.col("meta.n_bytes") - 1) / F.lit(every_n_bytes)
                ).cast("int"),
                F.lit(max_frames - 1),
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return assets.select(
        "asset_id",
        F.posexplode(
            F.transform(
                idxs,
                lambda i: F.substring(
                    F.col("payload"), i * every_n_bytes + 1, every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    ).withColumn("frame_len", F.octet_length("frame_bytes"))


def binary_chunk_dedup(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    chunk_bytes: int = 64,
) -> DataFrame:
    """Binary-payload dedup at two granularities: whole-file identity
    (md5 of the payload) and fixed-width chunk overlap — the
    image/audio/video counterpart of text ``chunk_dedup`` (re-encoded
    copies differ at the file level but share byte runs; a training-data
    pass dedups both). Chunking runs on the HEX encoding of the payload
    (2 chars/byte), which keeps every operation engine-portable — BLOB
    slicing/hashing is engine-specific, hex strings are not — at a 2x
    width cost that only touches this operator's intermediate column.

    Scale shape: narrow hex + in-row chunk fan-out (explode is the only
    row multiplier, bounded by payload_size/chunk_bytes), one hash-agg
    on chunk md5 for cross-asset frequency, one agg back per asset, and
    a broadcast-joined file-hash frequency — no pairwise comparisons at
    any level (same count-then-join shape as text chunk dedup).

    Output: (asset_id, file_hash, n_file_copies, n_chunks,
    n_dup_chunks, dup_chunk_frac).
    """
    cc = chunk_bytes * 2
    hx = F.hex(F.col(payload_col))
    n_chunks = F.ceil(F.length(hx) / F.lit(cc)).cast("int")
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.substring(hx, i * cc + 1, cc),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = assets.select(
        F.col(id_col).alias("asset_id"),
        F.md5(hx).alias("file_hash"),
        chunks.alias("_chunks"),
    )
    doc_chunks = base.select(
        "asset_id", F.explode(F.array_distinct("_chunks")).alias("_c")
    ).select("asset_id", F.md5("_c").alias("chunk_hash"))
    freq = doc_chunks.groupBy("chunk_hash").agg(
        F.count("*").alias("_n_assets"))
    per_asset = (
        doc_chunks.join(freq, "chunk_hash")
        .groupBy("asset_id")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("_n_assets") > 1, 1).otherwise(0))
            .cast("long").alias("n_dup_chunks"),
        )
    )
    file_freq = base.groupBy("file_hash").agg(
        F.count("*").cast("long").alias("n_file_copies"))
    return (
        base.select("asset_id", "file_hash")
        .join(file_freq, "file_hash")
        .join(per_asset, "asset_id", "left")
        .select(
            "asset_id", "file_hash", "n_file_copies",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long")
            .alias("n_dup_chunks"),
            F.round(
                F.coalesce(
                    F.col("n_dup_chunks") / F.col("n_chunks"), F.lit(0.0)),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


def modality_mix(
    assets: DataFrame,
    modality_col: str = "modality",
    meta_col: str = "meta",
) -> DataFrame:
    """Corpus modality inventory: per modality, asset counts, byte
    totals, and share of corpus bytes — the first table a multimodal
    training-mix discussion puts on screen (and the capacity-planning
    input: bytes, not asset counts, drive decode cost). One hash-agg on
    the modality key + a single-row total broadcast back.

    Output: (modality, n_assets, total_bytes, mean_bytes, byte_share).
    """
    per = assets.groupBy(F.col(modality_col).alias("modality")).agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum(F.col(meta_col)["n_bytes"]).cast("long").alias("total_bytes"),
    )
    tot = per.agg(F.sum("total_bytes").cast("double").alias("_t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "modality", "n_assets", "total_bytes",
        F.round(F.col("total_bytes") / F.col("n_assets"), 6)
        .alias("mean_bytes"),
        F.round(F.col("total_bytes") / F.col("_t"), 6).alias("byte_share"),
    )
