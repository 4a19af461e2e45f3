"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; decode
and feature-extraction run as vectorized Arrow `mapInPandas` stages. The
actual codec calls are STUBBED (PIL/librosa/av are not in this
environment): `decode_stub` raises NotImplementedError unless
`fake=True`, in which case it derives deterministic pseudo-features from
the bytes — the Spark-side plumbing (schema, batching, partitioning) is
real and tested either way.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id LONG, payload BINARY, media_type STRING, n_bytes LONG"
FEATURE_SCHEMA = "doc_id LONG, n_bytes LONG, digest STRING, width INT, height INT"


def to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             media_type: str = "blob") -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata
    (stand-in for reading real image/audio bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract over Arrow batches.

    With fake=True the "decoder" emits deterministic pseudo-dimensions from
    the md5 of the payload (so tests exercise batching and schema without
    codec libraries). With fake=False it requires a real codec and raises.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/av — not available in "
            "this environment; pass fake=True for deterministic pseudo-features")

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            digests = payloads.apply(lambda b: hashlib.md5(bytes(b)).hexdigest())
            width = digests.apply(lambda d: int(d[:2], 16) + 1)
            height = digests.apply(lambda d: int(d[2:4], 16) + 1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.apply(len).astype("int64"),
                "digest": digests,
                "width": width.astype("int32"),
                "height": height.astype("int32"),
            })

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = ("doc_id LONG, width INT, height INT, "
                  "payload BINARY, n_bytes LONG")


def resize(media: DataFrame, width: int, height: int,
           fake: bool = True) -> DataFrame:
    """Resize stage (image thumbnailing for a vision pipeline). fake=True
    'resizes' by deterministic byte truncation/padding to width*height
    bytes — exercising the real Spark concerns (binary column through an
    Arrow batch, new metadata, per-batch vectorization) without a codec.
    fake=False is the PIL/opencv integration point."""
    if not fake:
        raise NotImplementedError(
            "real resize requires PIL/opencv — not available in this "
            "environment; pass fake=True for deterministic byte resizing")
    target = width * height

    def do_resize(batches):
        for pdf in batches:
            resized = pdf["payload"].apply(
                lambda b: bytes(b)[:target].ljust(target, b"\0"))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "payload": resized,
                "n_bytes": resized.apply(len).astype("int64"),
            })

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id LONG, frame_idx INT, frame_digest STRING"


def frame_sample(media: DataFrame, every_n: int = 2,
                 fake: bool = True) -> DataFrame:
    """Frame sampling (video -> every_n-th frame): the one-to-many decode
    shape. fake=True derives a deterministic frame count from the payload
    digest (1..8) and a per-frame digest — the row-explosion, schema, and
    Arrow batch handling are the real thing; fake=False is the pyav
    integration point. Emitted rows per doc: ceil(n_frames / every_n)."""
    if not fake:
        raise NotImplementedError(
            "real frame extraction requires pyav/ffmpeg — not available in "
            "this environment; pass fake=True for deterministic frames")

    def sample(batches):
        for pdf in batches:
            out_ids, out_idx, out_dig = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                n_frames = (int(digest[:2], 16) % 8) + 1
                for i in range(0, n_frames, every_n):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_dig.append(hashlib.md5(
                        f"{digest}:{i}".encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(out_ids, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "frame_digest": pd.Series(out_dig, dtype="object"),
            })

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)
