"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Engine extension (SURVEY §2.4). Image/audio/video cells are carried as
``binary`` columns with a metadata struct; decode / feature-extraction
run as Arrow-batched pandas iterators (``mapInPandas``) so the Spark
side — schema, partitioning, batch shape — is real even though the
actual codecs are STUBBED in this container (no image/audio libs):
:func:`decode_image` raises ``NotImplementedError`` unless
``fake=True``, which produces a deterministic fake decode for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def text_to_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Demo source: wrap a text column as a binary payload with metadata
    (stands in for real image bytes; byte-exact in any engine)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        t.cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.octet_length(t) % 640).cast("int").alias("width"),
        (F.octet_length(t) % 480).cast("int").alias("height"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only scan: payload sizes + digest, no decode.

    Expression-level (codegen); the common 100 TB pre-filter before any
    expensive decode."""
    return df.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        "mime",
        "width",
        "height",
    )


FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real decode needs an image codec — not available in this
    container. Cited plumbing is tested via the deterministic fake."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: byte-histogram moments."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    out = []
    for i in range(FEATURE_DIM):
        sl = payload[i::FEATURE_DIM]
        out.append(round(sum(sl) / max(len(sl), 1) / 255.0, 9))
    return out


def resize(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize stage: metadata is updated for real; pixel resampling is
    STUBBED (no imaging library here) behind a deterministic fake that
    keeps the Spark plumbing — batch shape, schema, partitioning —
    identical to a real PIL/torchvision stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resample needs an imaging library")
            # fake: proportionally truncate the payload to the new pixel count
            out = pdf.copy()
            out["payload"] = [
                p[: max(1, int(len(p) * min(1.0, (width * height) / max(len(p), 1))))]
                if p is not None
                else None
                for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(run, df.schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, frame_len: int = 16) -> DataFrame:
    """Frame sampling for video-like payloads: emit one row per sampled
    byte-window. Pure expression-level (codegen) — the common pattern of
    exploding a large binary into bounded chunks before a decode UDF."""
    n_frames = (F.octet_length("payload") / every_n_bytes).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
    return (
        df.select("media_id", "payload", idx.alias("frame_no"))
        .select(
            "media_id",
            "frame_no",
            F.substring(
                F.col("payload"), F.col("frame_no") * every_n_bytes + 1, frame_len
            ).alias("frame_bytes"),
        )
    )


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` keeps the batch shape (columnar Arrow record batches)
    identical to what a real torch/PIL decode stage would see; swap
    `_fake_features` for the real codec when the library exists.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _fake_features if fake else decode_image
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [fn(p) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, _FEATURES_SCHEMA)
