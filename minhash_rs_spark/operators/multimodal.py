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


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("payload", T.BinaryType(), False),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_sha", T.StringType(), False),
])


def resize_media(media: DataFrame, width: int = 64, height: int = 64,
                 real: bool = False) -> DataFrame:
    """Resize stub: deterministic fake 'resize' = blake2b-stretched bytes
    of the payload to width*height (stands in for PIL Image.resize; the
    Spark-side contract — binary in, fixed-size binary + dims out,
    Arrow-batched — is the real thing)."""
    if real:
        raise NotImplementedError(
            "real image resize requires PIL/opencv, absent here")

    n_out = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                buf = bytearray()
                counter = 0
                while len(buf) < n_out:
                    buf += hashlib.blake2b(
                        p + counter.to_bytes(4, "little"),
                        digest_size=64).digest()
                    counter += 1
                payloads.append(bytes(buf[:n_out]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "width": np.full(len(pdf), width, dtype=np.int32),
                "height": np.full(len(pdf), height, dtype=np.int32),
                "payload": payloads,
            })

    return media.select("media_id", "payload").mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256,
                  max_frames: int = 8, real: bool = False) -> DataFrame:
    """Frame-sampling stub for video payloads: emits up to max_frames
    'frames' per media item (one per every_n_bytes window), each
    fingerprinted — the row-explosion shape (1 media -> N frames) a real
    ffmpeg-based sampler produces."""
    if real:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg/av, absent here")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, idxs, shas = [], [], []
        for pdf in batches:
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n = max(1, min(max_frames, len(p) // every_n_bytes + 1))
                for i in range(n):
                    chunk = p[i * every_n_bytes:(i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    shas.append(hashlib.sha256(chunk).hexdigest()[:16])
        yield pd.DataFrame({"media_id": ids,
                            "frame_idx": np.array(idxs, dtype=np.int32),
                            "frame_sha": shas})

    return media.select("media_id", "payload").mapInPandas(fn, FRAME_SCHEMA)
