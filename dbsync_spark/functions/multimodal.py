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
