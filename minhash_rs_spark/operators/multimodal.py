"""Multimodal column plumbing (task brief): image/audio/video as opaque
`binary` payloads with typed metadata, processed by Arrow-batched
mapInPandas operators.

Two tiers:

  real=True  — REAL compute for the dependency-free uncompressed
               family, all pure numpy: binary PPM (P6) / PGM (P5)
               decode + encode, vectorized bilinear resize, and frame
               sampling over PPM streams (concatenated P6 frames — the
               format `ffmpeg -f image2pipe -vcodec ppm` emits).
               Compressed formats (JPEG/PNG/WAV/MP4) raise
               NotImplementedError per payload family: PIL/librosa/
               ffmpeg are absent from this container (evidence:
               REFERENCE_BINARY.md — no network to install them).
  real=False — deterministic fakes with the same schemas/batch shapes,
               for exercising downstream dedup/ANN plumbing on
               arbitrary payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------------
# real numpy codecs: binary PPM/PGM (netpbm), bilinear resize


def _parse_netpbm(payload: bytes, pos: int = 0) -> tuple:
    """Parse one binary PPM (P6) / PGM (P5) image starting at pos.
    Returns ((h, w, 3) uint8 array — grayscale replicated, end_offset).
    Full header handling (whitespace + '#' comments), maxval <= 255."""
    magic = payload[pos:pos + 2]
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(
            f"only binary PPM/PGM decode is dependency-free here; got "
            f"magic {magic!r} (JPEG/PNG need PIL, absent)")
    tokens: list[bytes] = []
    i = pos + 2
    while len(tokens) < 3:
        c = payload[i:i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        elif c == b"":
            raise ValueError("truncated netpbm header")
        else:
            j = i
            while j < len(payload) and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    i += 1  # exactly one whitespace byte after maxval (netpbm spec)
    ch = 3 if magic == b"P6" else 1
    img = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                        offset=i).reshape(h, w, ch)
    if ch == 1:
        img = np.repeat(img, 3, axis=2)
    return img, i + w * h * ch


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode one binary PPM/PGM payload to (h, w, 3) uint8."""
    return _parse_netpbm(payload)[0]


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def bilinear_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resample of (h, w, c) uint8 -> (height, width,
    c) uint8 (align_corners=False / pixel-center convention)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    im = img.astype(np.float32)
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    return np.clip(top * (1 - wy) + bot * wy + 0.5, 0, 255).astype(np.uint8)


def split_ppm_stream(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream (ffmpeg image2pipe ppm output)
    into per-frame byte strings."""
    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 2] != b"P6":
            raise NotImplementedError(
                "frame sampling is dependency-free only for PPM streams; "
                "compressed video needs ffmpeg (absent)")
        _, end = _parse_netpbm(payload, pos)
        frames.append(payload[pos:end])
        pos = end
    return frames

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


def _real_feature(payload: bytes, dim: int) -> np.ndarray:
    """Real image feature: decode netpbm, grayscale, bilinear-pool to a
    sqrt(dim)-ish grid, normalize to [0, 1]. Raises NotImplementedError
    for payload families that need absent libraries (JPEG/PNG/audio)."""
    img = decode_netpbm(payload)
    gray = img.mean(axis=2, keepdims=True).astype(np.uint8)
    side = max(1, int(round(dim ** 0.5)))
    pooled = bilinear_resize(gray, side, side)[:, :, 0]
    feat = (pooled.reshape(-1).astype(np.float32) / 255.0)[:dim]
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return feat


def decode_media(media: DataFrame, dim: int = 8, real: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    real=True decodes for real where no external library is needed
    (binary PPM/PGM payloads -> bilinear-pooled grayscale grid feature);
    compressed payloads raise NotImplementedError per item family
    (PIL/librosa absent from this container — REFERENCE_BINARY.md)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                feats = [_real_feature(p, dim) for p in pdf["payload"]]
            else:
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
    """Image resize. real=True: REAL numpy bilinear resize of binary
    PPM/PGM payloads, re-encoded as P6 (compressed formats raise —
    PIL/opencv absent). real=False: deterministic blake2b-stretched
    fake with the same contract (binary in, fixed-size binary + dims
    out, Arrow-batched)."""
    n_out = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                if real:
                    payloads.append(encode_ppm(
                        bilinear_resize(decode_netpbm(p), width, height)))
                    continue
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
    """Frame sampling for video payloads — the 1 media -> N frames row
    explosion. real=True: REAL parsing of PPM streams (concatenated P6
    frames, what `ffmpeg -f image2pipe -vcodec ppm` emits), sampling
    every k-th frame so at most max_frames are kept, fingerprinting
    actual frame bytes; compressed containers raise (ffmpeg absent).
    real=False: fixed-size byte windows as fake frames."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, idxs, shas = [], [], []
        for pdf in batches:
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if real:
                    frames = split_ppm_stream(p)
                    stride = max(1, -(-len(frames) // max_frames))
                    for i in range(0, len(frames), stride):
                        ids.append(mid)
                        idxs.append(i)
                        shas.append(hashlib.sha256(
                            frames[i]).hexdigest()[:16])
                    continue
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
