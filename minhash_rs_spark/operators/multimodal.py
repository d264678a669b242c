"""Multimodal column plumbing (task brief): image/audio/video as opaque
`binary` payloads with typed metadata, processed by Arrow-batched
mapInPandas operators.

The decode step itself is STUBBED — no image/audio libraries exist in
this container — but the Spark-side contract is real and tested:
schema, batch shapes, partitioning, and a deterministic fake feature
extractor so downstream operators (dedup on media fingerprints, ANN on
media features) can be exercised end-to-end.

`decode_media(..., real=True)` raises NotImplementedError by design;
swap `_fake_decode` for a PIL/librosa call on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("mime", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("mime", T.StringType(), False),
    T.StructField("payload_sha", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
])


def attach_fake_payload(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Build a typed media table from text rows (deterministic fake
    payload = UTF-8 bytes; mime rotates by id). Stands in for a real
    binary-column source at test time."""
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.pmod(F.col(id_col).cast("long"), F.lit(3)) + 1).cast("int"))
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        mime.alias("mime"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("payload"),
        F.octet_length(F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8"))
        .cast("int").alias("n_bytes"))


def _fake_decode(payload: bytes, mime: str, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: blake2b-seeded
    pseudo-features. Replaces (PIL.Image.open / librosa.load / frame
    sampling) which are unavailable here."""
    seed = hashlib.blake2b(payload + mime.encode(), digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(seed, "little"))
    return rng.standard_normal(dim).astype(np.float32)


def decode_media(media: DataFrame, dim: int = 8, real: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    real=True is the production path — NotImplementedError until media
    libraries are provisioned (clearly-marked stub per the brief)."""
    if real:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this container; use real=False for the deterministic stub")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p, m, dim)
                     for p, m in zip(pdf["payload"], pdf["mime"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "mime": pdf["mime"].values,
                "payload_sha": [hashlib.sha256(p).hexdigest()[:16]
                                for p in pdf["payload"]],
                "feature": feats,
            })

    return media.select("media_id", "mime", "payload").mapInPandas(
        fn, FEATURE_SCHEMA)
