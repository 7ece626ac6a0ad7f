"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata. The Spark-side machinery — schemas, Arrow batch shapes,
partitioning, UDF signatures — is real and tested; the actual media decoding
is STUBBED (the container has no image/audio libraries) behind
``NotImplementedError`` with an injectable decoder for tests.

At scale: binary payloads stay in executor memory one Arrow batch at a time
(mapInPandas streams batches); metadata extraction never collects payloads
to the driver; downstream joins use only the slim metadata columns.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, width int, height int, format string"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize a deterministic binary payload column from text (the test
    stand-in for real image bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image_stub(payload: bytes) -> tuple:
    """Real decoders (PIL/libjpeg) are unavailable in this container."""
    raise NotImplementedError(
        "image decoding requires an image library; inject fake_decoder= for tests"
    )


def fake_decoder(payload: bytes) -> tuple:
    """Deterministic fake decode: (width, height, format) from the bytes."""
    n = len(payload)
    return (n % 640 + 1, (n * 7) % 480 + 1, "fake")


def extract_media_meta(
    media: DataFrame,
    decoder: Optional[Callable[[bytes], tuple]] = None,
) -> DataFrame:
    """mapInPandas metadata extraction over (doc_id, payload) — the general
    shape for decode / feature-extract / resize / frame-sample stages."""
    dec = decoder or decode_image_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"].tolist()
            rows = []
            for doc_id, p in zip(pdf["doc_id"], payloads):
                b = bytes(p)
                w, h, fmt = dec(b)
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        int(w),
                        int(h),
                        fmt,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "sha256", "width", "height", "format"],
            )

    return media.mapInPandas(run, schema=MEDIA_META_SCHEMA).orderBy("doc_id")


def media_meta_sql_expressible(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Oracle-checkable metadata variant (pure column expressions):
    byte length + sha256 + fake dimensions — validates the plumbing columns
    against DuckDB without a Python decoder in the loop."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(payload).cast("long")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n.alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
        (n % 640 + 1).cast("int").alias("width"),
        ((n * 7) % 480 + 1).cast("int").alias("height"),
    ).orderBy("doc_id")


def frame_sample(
    df: DataFrame, id_col: str, text_col: str, frame_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: slice the binary payload into fixed-size
    chunks ("frames") and fingerprint each — the video analog of decode.
    Pure column expressions (substring on binary), oracle-checkable."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n_frames = F.least(
        F.floor(F.octet_length(payload) / frame_bytes).cast("int"), F.lit(max_frames)
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        n_frames.alias("n_frames"),
    ).filter(F.col("n_frames") > 0)
    frames = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        "payload",
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int"),
        F.md5(
            F.substring(F.col("payload"), F.col("frame_idx") * frame_bytes + 1, frame_bytes)
        ).alias("frame_md5"),
    ).orderBy("doc_id", "frame_idx")
