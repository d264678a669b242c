"""Arrow-batched Spark UDFs wrapping the numpy kernel.

Exactly the UDF surface SURVEY.md §2.7 calls for — vectorized
mapInPandas / pandas_udf only, no per-row Python:

  shingle_sets(...)        text -> sorted-unique u64 shingle ids (P1-P3)
  band_signature_rows(...) shingles -> exploded (band_id, sig_hi, sig_lo)
                           rows (H1-H5), explosion done batch-side in
                           numpy (np.repeat/tile), not via Spark explode
  with_jaccard(df, a, b)   exact Jaccard of two shingle-array columns
                           (J6) — batch lexsort + adjacent-dup count
  with_simhash(df, col)    64-bit SimHash of a shingle-array column
                           (north rule) — batch unpackbits + reduceat

u64 <-> int64: Spark LongType is signed; we reinterpret bits with
ndarray.view / .astype copies — values round-trip exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from minhash_rs_spark.config import MinHashConfig
from minhash_rs_spark.functions.kernel import SignatureKernel

SHINGLES_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("shingles", T.ArrayType(T.LongType(), False), False),
    T.StructField("n_shingles", T.IntegerType(), False),
])

SIG_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("band_id", T.IntegerType(), False),
    T.StructField("sig_hi", T.LongType(), False),
    T.StructField("sig_lo", T.LongType(), False),
])


def _kernel(cfg: MinHashConfig) -> SignatureKernel:
    return SignatureKernel(
        num_bands=cfg.num_bands, band_size=cfg.band_size,
        ngram_size=cfg.ngram_size, tokenizer=cfg.tokenizer,
        hash_seed=cfg.hash_seed, exact_override=cfg.exact_override)


def shingle_sets(docs: DataFrame, cfg: MinHashConfig,
                 text_col: str = "doc_text") -> DataFrame:
    """(conv_id, doc_text) -> (conv_id, shingles array<long>, n_shingles).

    Computed ONCE per document and reused by both the signature stage and
    the exact-Jaccard verification stage (the reference re-tokenizes in
    its true-jacc pass, src/main.rs:563-576 — we don't).

    mapInArrow: the output list column is assembled from one flat numpy
    buffer + offsets (pa.ListArray.from_arrays) — no per-doc Python
    objects cross the Arrow boundary (only tokenization itself touches
    Python strings, unavoidably).
    """
    import pyarrow as pa

    kernel_cfg = cfg

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        kernel = _kernel(kernel_cfg)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            conv = rb.column(0)
            arrs = kernel.shingles_batch(rb.column(1).to_pylist())
            # P7 tokenization-failure guard (ref catch_unwind,
            # src/main.rs:522-526): a doc whose tokenization raised is
            # dropped here -> no signatures -> it survives as a singleton,
            # matching the reference's skip-and-continue
            failed = [i for i, a in enumerate(arrs) if a is None]
            if failed:
                keep = np.ones(len(arrs), dtype=bool)
                keep[failed] = False
                conv = conv.filter(pa.array(keep))
                arrs = [a for a in arrs if a is not None]
                if not arrs:
                    continue
            # NOTE: max_shingles_per_doc is NOT applied here — MinHash
            # signatures are cap-invariant on every tokenizer path; the
            # cap bounds only the exact-verification sets and is applied
            # once, in pipeline.run_minhash (a capped-set minimum would
            # bias the MinHash estimator and make the clustering depend
            # on which tokenizer path produced the signature)
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int32,
                               count=len(arrs))
            offsets = np.zeros(len(arrs) + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            flat = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
            shingle_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat.view(np.int64)))
            yield pa.RecordBatch.from_arrays(
                [conv, shingle_col, pa.array(lens)],
                names=["conv_id", "shingles", "n_shingles"])

    return docs.select("conv_id", text_col).mapInArrow(fn, SHINGLES_SCHEMA)


def band_signature_rows(shingles_df: DataFrame, cfg: MinHashConfig) -> DataFrame:
    """(conv_id, shingles) -> one row per (doc, band): the LSH keys.

    mapInArrow both ways: the shingle list column's flat value buffer +
    offsets feed the blocked minhash kernel directly (zero copy, zero
    per-doc Python), and the num_bands-per-doc explosion happens with
    np.repeat/take inside the batch — Spark never materializes an
    intermediate array column. (ref phase 2 layout: src/main.rs:411-429)
    """
    import pyarrow as pa

    kernel_cfg = cfg
    nb = cfg.num_bands

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        kernel = _kernel(kernel_cfg)
        band_ids = np.arange(nb, dtype=np.int32)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            conv = rb.column(0)
            lst = rb.column(1)
            if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
                lst = lst.combine_chunks()
            offsets = lst.offsets.to_numpy(zero_copy_only=False)
            flat = lst.values.to_numpy(zero_copy_only=False).view(np.uint64)
            # account for a possible non-zero list-view offset
            starts = offsets[:-1].astype(np.int64)
            base = starts[0]
            hi, lo = kernel.band_sigs_from_flat(flat[base:offsets[-1]],
                                                starts - base)
            rep_idx = pa.array(np.repeat(np.arange(n), nb))
            yield pa.RecordBatch.from_arrays(
                [conv.take(rep_idx),
                 pa.array(np.tile(band_ids, n)),
                 pa.array(hi.reshape(-1).view(np.int64)),
                 pa.array(lo.reshape(-1).view(np.int64))],
                names=["conv_id", "band_id", "sig_hi", "sig_lo"])

    return shingles_df.select("conv_id", "shingles").mapInArrow(fn, SIG_SCHEMA)


def _list_flat(lst, pa):
    """(values u64 view, starts int64) from an Arrow ListArray column."""
    if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
        lst = lst.combine_chunks()
    offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lst.values.to_numpy(zero_copy_only=False).view(np.uint64)
    base = offsets[0]
    return flat[base:offsets[-1]], offsets[:-1] - base


def band_signature_rows_from_tokens(token_docs: DataFrame,
                                    cfg: MinHashConfig) -> DataFrame:
    """(conv_id, token_hashes) -> (conv_id, band_id, sig_hi, sig_lo).

    The fast path: tokenization already happened JVM-side
    (doc_assembly.assemble_token_docs), so this UDF is pure numpy —
    batch-vectorized rolling shingles (hashing.rolling_poly_from_flat)
    + blocked minhash. No uniqueness pass: MinHash is multiset-invariant.
    """
    import pyarrow as pa

    kernel_cfg = cfg
    nb = cfg.num_bands
    ngram = cfg.ngram_size

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from minhash_rs_spark.functions import hashing as H

        kernel = _kernel(kernel_cfg)
        band_ids = np.arange(nb, dtype=np.int32)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            conv = rb.column(0)
            flat, starts = _list_flat(rb.column(1), pa)
            sh_flat, sh_starts = H.rolling_poly_from_flat(flat, starts, ngram)
            hi, lo = kernel.band_sigs_from_flat(sh_flat, sh_starts)
            rep_idx = pa.array(np.repeat(np.arange(n), nb))
            yield pa.RecordBatch.from_arrays(
                [conv.take(rep_idx),
                 pa.array(np.tile(band_ids, n)),
                 pa.array(hi.reshape(-1).view(np.int64)),
                 pa.array(lo.reshape(-1).view(np.int64))],
                names=["conv_id", "band_id", "sig_hi", "sig_lo"])

    return (token_docs.select("conv_id", "token_hashes")
            .mapInArrow(fn, SIG_SCHEMA))


def shingle_sets_from_tokens(token_docs: DataFrame,
                             cfg: MinHashConfig) -> DataFrame:
    """(conv_id, token_hashes) -> (conv_id, shingles, n_shingles) with
    sorted-unique shingle sets (for exact-Jaccard verification) —
    batch-vectorized (lexsort dedup), no per-doc Python.

    max_shingles_per_doc is applied downstream (pipeline.run_minhash) on
    the verification consumer only, never here — see shingle_sets."""
    import pyarrow as pa

    ngram = cfg.ngram_size

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from minhash_rs_spark.functions import hashing as H

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            conv = rb.column(0)
            flat, starts = _list_flat(rb.column(1), pa)
            sh_flat, sh_starts = H.rolling_poly_from_flat(flat, starts, ngram)
            u_flat, u_starts = H.unique_per_doc(sh_flat, sh_starts)
            lens = np.empty(n, dtype=np.int64)
            lens[:-1] = u_starts[1:] - u_starts[:-1]
            lens[-1] = len(u_flat) - u_starts[-1]
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            shingle_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(u_flat.view(np.int64)))
            yield pa.RecordBatch.from_arrays(
                [conv, shingle_col, pa.array(lens.astype(np.int32))],
                names=["conv_id", "shingles", "n_shingles"])

    return (token_docs.select("conv_id", "token_hashes")
            .mapInArrow(fn, SHINGLES_SCHEMA))


def band_signature_rows_exact(docs: DataFrame, cfg: MinHashConfig,
                              text_col: str = "doc_text") -> DataFrame:
    """exact_override mode: signatures straight from text
    (ref: src/main.rs:522-533) — skips shingling entirely."""
    kernel_cfg = cfg
    nb = cfg.num_bands

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _kernel(kernel_cfg)
        band_ids = np.arange(nb, dtype=np.int32)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            hi, lo = kernel.signatures_for_texts(pdf[text_col].tolist())
            yield pd.DataFrame({
                "conv_id": np.repeat(pdf["conv_id"].values, nb),
                "band_id": np.tile(band_ids, n),
                "sig_hi": hi.reshape(-1).view(np.int64),
                "sig_lo": lo.reshape(-1).view(np.int64),
            })

    return docs.select("conv_id", text_col).mapInPandas(fn, SIG_SCHEMA)


def _batch_jaccard(a_flat, a_starts, b_flat, b_starts, n):
    """Vectorized per-row exact Jaccard of n (sorted-unique) set pairs
    given as flat value buffers + row starts. No per-row Python: tag
    every value with its row id, sort (row, value) records across BOTH
    sides at once, and count adjacent duplicates per row — a value
    appears twice within a row iff it is in the intersection (each
    side's set has no internal duplicates)."""
    a_lens = np.empty(n, dtype=np.int64)
    a_lens[:-1] = a_starts[1:] - a_starts[:-1]
    a_lens[-1] = len(a_flat) - a_starts[-1]
    b_lens = np.empty(n, dtype=np.int64)
    b_lens[:-1] = b_starts[1:] - b_starts[:-1]
    b_lens[-1] = len(b_flat) - b_starts[-1]

    rows = np.concatenate([np.repeat(np.arange(n), a_lens),
                           np.repeat(np.arange(n), b_lens)])
    vals = np.concatenate([a_flat, b_flat])
    order = np.lexsort((vals, rows))
    rows_s, vals_s = rows[order], vals[order]
    dup = (rows_s[1:] == rows_s[:-1]) & (vals_s[1:] == vals_s[:-1])
    inter = np.zeros(n, dtype=np.int64)
    np.add.at(inter, rows_s[1:][dup], 1)
    union = a_lens + b_lens - inter
    out = np.zeros(n, dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    # both sets empty -> Jaccard 1.0 (identical empties), matching the
    # scalar kernel jaccard_u64
    out[~nz] = 1.0
    return out, inter, union


def with_jaccard(df: DataFrame, a_col: str, b_col: str,
                 out_col: str = "jaccard", sizes: bool = False) -> DataFrame:
    """Append exact Jaccard of two array<long> shingle columns, dropping
    them (ref: jaccard_similarity src/main.rs:1673-1677). mapInArrow on
    flat buffers — replaces the per-row pandas_udf loop the round-1
    review flagged; all other columns pass through untouched.

    sizes=True additionally emits the exact integer intersection/union
    cardinalities (n_inter, n_union) from the same kernel pass — these
    are engine-portable (no float division), so an external SQL oracle
    can check the verify kernel value-for-value."""
    import pyarrow as pa

    keep = [f for f in df.schema.fields if f.name not in (a_col, b_col)]
    extra = [T.StructField(out_col, T.DoubleType(), False)]
    if sizes:
        extra += [T.StructField("n_inter", T.LongType(), False),
                  T.StructField("n_union", T.LongType(), False)]
    out_schema = T.StructType(keep + extra)
    keep_names = [f.name for f in keep]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            cols = {name: rb.column(i)
                    for i, name in enumerate(rb.schema.names)}
            a_flat, a_starts = _list_flat(cols[a_col], pa)
            b_flat, b_starts = _list_flat(cols[b_col], pa)
            jac, inter, union = _batch_jaccard(a_flat, a_starts,
                                               b_flat, b_starts, n)
            arrays = [cols[k] for k in keep_names] + [pa.array(jac)]
            if sizes:
                arrays += [pa.array(inter), pa.array(union)]
            yield pa.RecordBatch.from_arrays(
                arrays, names=keep_names + [f.name for f in extra])

    return df.mapInArrow(fn, out_schema)


def with_simhash(df: DataFrame, shingles_col: str = "shingles",
                 out_col: str = "simhash") -> DataFrame:
    """Append the 64-bit SimHash (per-bit majority vote over the
    already-uniform shingle hashes; ties set the bit) and drop the
    shingle column. Batch-vectorized: one unpackbits over the flat
    value buffer + segmented sums via add.reduceat — no per-row Python.
    North-rule addition, no reference counterpart."""
    import pyarrow as pa

    keep = [f for f in df.schema.fields if f.name != shingles_col]
    out_schema = T.StructType(keep + [T.StructField(out_col,
                                                    T.LongType(), False)])
    keep_names = [f.name for f in keep]

    def fn(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            cols = {name: rb.column(i)
                    for i, name in enumerate(rb.schema.names)}
            flat, starts = _list_flat(cols[shingles_col], pa)
            lens = np.empty(n, dtype=np.int64)
            lens[:-1] = starts[1:] - starts[:-1]
            lens[-1] = len(flat) - starts[-1]
            sig = np.zeros(n, dtype=np.uint64)
            nz = lens > 0
            if nz.any():
                # bits: (total_values, 64) 0/1; little-endian byte order
                # within each u64 — consistent across rows, so the vote
                # per bit position is well-defined
                bits = np.unpackbits(flat.view(np.uint8)).reshape(-1, 64)
                # segment only over non-empty rows: their starts are
                # strictly increasing, in-bounds, and contiguous (empty
                # rows contribute no values), which is exactly what
                # reduceat requires
                sums_nz = np.add.reduceat(bits, starts[nz], axis=0)
                sums = np.zeros((n, 64), dtype=sums_nz.dtype)
                sums[nz] = sums_nz
                votes = (sums * 2 >= lens[:, None]) & nz[:, None]
                sig = np.packbits(votes.astype(np.uint8),
                                  axis=1).view(np.uint64).reshape(-1)
            yield pa.RecordBatch.from_arrays(
                [cols[k] for k in keep_names]
                + [pa.array(sig.view(np.int64))],
                names=keep_names + [out_col])

    return df.mapInArrow(fn, out_schema)


def cosine_expr(a, b):
    """JVM-side cosine similarity between two array<float/double> columns —
    F.zip_with dot product + F.aggregate norms; no Python."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)
