"""Multimodal-column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode/feature-extract runs as Arrow-batched `mapInPandas`
(one Python invocation per batch, never per row). The actual codecs (PIL,
ffmpeg, torchaudio) are NOT in this container, so `decode_media` is a
clearly-marked stub raising NotImplementedError — but the Spark-side
contract that matters at 100 TB is real and tested here: schema, batch
iterator shape, deterministic fake featurization, and frame sampling.

At scale: binary payloads dominate bytes, so these stages run FIRST after
the scan with column pruning (never carry `media` past featurization), and
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds worker memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_HEX_CHARS = 64  # 32-byte frames, expressed over the hex string


def as_media(df: DataFrame, id_col: str = "doc_id", text: str = "text",
             kind: str = "blob") -> DataFrame:
    """Wrap a text column as an opaque media row:
    (doc_id, media: binary, meta: struct<kind, n_bytes>)."""
    media = F.encode(F.col(text), "UTF-8")
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.struct(
            F.lit(kind).alias("kind"), F.length(media).alias("n_bytes")
        ).alias("meta"),
    )


def decode_media(kind: str) -> None:
    """Real codec decode — deliberately unimplemented in this container."""
    raise NotImplementedError(
        f"no codec for {kind!r} in this environment; plug PIL/ffmpeg here — "
        "the mapInPandas plumbing below is the production shape"
    )


def media_features(media_df: DataFrame) -> DataFrame:
    """Deterministic fake featurization via mapInPandas: byte length + sha256
    (stands in for an embedding/codec call). Arrow-batched; the `media`
    column is dropped on output (column pruning at scale)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "media_sha": blobs.map(lambda b: hashlib.sha256(b).hexdigest()),
                }
            )

    return media_df.mapInPandas(
        extract, schema="doc_id long, n_bytes long, media_sha string"
    )


def frame_samples(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling stub: split the media payload (as hex) into fixed
    windows and fingerprint the first `n_frames` — the video-keyframe access
    pattern (seek + per-frame feature) without a codec. Output one row per
    sampled frame: (doc_id, frame_idx, frame_sha)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                hx = bytes(blob).hex()
                for f in range(n_frames):
                    chunk = hx[f * FRAME_HEX_CHARS:(f + 1) * FRAME_HEX_CHARS]
                    if not chunk:
                        break
                    ids.append(doc_id)
                    idxs.append(f)
                    shas.append(hashlib.md5(chunk.encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_sha": pd.Series(shas, dtype="object")}
            )

    return media_df.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_sha string"
    )
