"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star extension — SURVEY §2B).

The Spark-side machinery — schema, binary packing, Arrow-batched
mapInPandas decode, partition-preserving feature extraction — is real
and tested; the codec itself is STUBBED (image/audio libraries are not
in this container): `decode_stub` raises NotImplementedError unless
`fake=True`, in which case it produces a deterministic fake feature
vector so the batch shape / schema path is exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("meta", MapType(StringType(), StringType())),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def pack_assets(df: DataFrame, id_col: str, payload_text_col: str, media_type_col) -> DataFrame:
    """Pack rows into the multimodal asset convention: opaque binary
    `content` + string metadata map (schemas.MULTIMODAL_ASSET)."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        media_type_col.alias("media_type"),
        F.encode(F.col(payload_text_col), "UTF-8").alias("content"),
        F.create_map(
            F.lit("orig_len"), F.length(payload_text_col).cast("string"),
            F.lit("codec"), F.lit("identity"),
        ).alias("meta"),
    )


def decode_stub(content: bytes, n_features: int = 4, fake: bool = False) -> list[float]:
    """STUB for the real media decoder (PIL/librosa/ffmpeg are not in
    this container). fake=True produces a deterministic byte-statistic
    vector so the distributed plumbing is testable; fake=False is the
    integration point for a real codec."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio codec library; "
            "wire one in here and keep the (bytes) -> list[float] contract"
        )
    if not content:
        return [0.0] * n_features
    n = len(content)
    return [
        float(n),
        float(content[0]),
        float(content[-1]),
        float(sum(content) % 997),
    ][:n_features]


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("n_frames", LongType()),
    ]
)


def frame_sample(
    assets: DataFrame, frame_size: int = 16, every: int = 4
) -> DataFrame:
    """Frame sampling over opaque binary content: treat the payload as
    fixed-stride frames (video/audio convention), keep every k-th full
    frame, fingerprint each sampled frame. The real decode is the
    stubbed codec's job; the byte-slicing batch shape here IS the real
    distributed plumbing — Arrow batches in, one output row per
    sampled frame, partitioning preserved (narrow op, no shuffle).
    Fully deterministic, so it carries an exact SQL oracle (unlike
    decode_stub's rows-only entry)."""

    def _sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, digests, totals = [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                n_frames = len(blob) // frame_size
                for fi in range(0, n_frames, every):
                    ids.append(asset_id)
                    idxs.append(fi)
                    digests.append(
                        hashlib.md5(
                            blob[fi * frame_size : (fi + 1) * frame_size]
                        ).hexdigest()
                    )
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame_md5": digests,
                    "n_frames": totals,
                }
            )

    return assets.mapInPandas(_sample, FRAME_SCHEMA)


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode over mapInPandas: one python worker per
    input partition, whole Arrow batches in/out — never row-at-a-time.
    Partitioning of the input is preserved (narrow transformation)."""

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "meta": pdf["meta"],
                    "features": pdf["content"].map(lambda b: decode_stub(b, fake=fake)),
                }
            )
            yield out

    return assets.mapInPandas(_decode, DECODED_SCHEMA)
