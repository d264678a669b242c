"""The MinHash signature kernel: clean -> tokenize -> shingle -> minhash
-> band signatures, numpy-vectorized over batches of documents.

This is the single compute-dense component of the engine. It runs inside
Arrow-batched pandas UDFs (see functions/udfs.py) — no per-row Python in
the hot path beyond tokenization itself, and all hashing/permutation
math is vectorized across the concatenated shingles of a whole batch
(np.minimum.reduceat over document boundaries).

Semantics mirror the reference phase-2 `process_path`
(/root/reference/src/main.rs:489-679); divergences are deliberate and
documented in functions/hashing.py and SURVEY.md §7.4.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from minhash_rs_spark.functions import hashing as H

U64 = np.uint64

# SlimPajama cleaning (ref: clean_text /root/reference/src/main.rs:598-614)
_PUNCT = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
# Non-whitespace C0 controls + DEL are STRIPPED in both the Python and
# JVM cleaners (deliberate divergence: the reference keeps them and its
# uniseg segmenter emits each as its own segment — immaterial at corpus
# frequencies). Rationale: (a) Python's \s matches \x1c-\x1f but Java's
# (?U)\s does not, so any surviving control byte breaks the JVM/Python
# token-parity contract; (b) it guarantees no payload byte can ever
# collide with an engine-internal sentinel. \t\n\v\f\r are left to the
# whitespace collapse (both regex engines agree on those).
_C0_STRIP = ("".join(chr(c) for c in range(0x20) if chr(c) not in "\t\n\v\f\r")
             + "\x7f")
_PUNCT_TABLE = str.maketrans("", "", _PUNCT + _C0_STRIP)
_WS_RE = re.compile(r"\s+")

# UAX#29 (the reference's uniseg tokenizer, src/main.rs:352-358) treats
# each CJK ideograph / kana / hangul syllable as its own word; plain
# whitespace splitting would keep runs glued. Shared by the Python and
# JVM tokenizers so both split identically (parity-tested).
CJK_RANGES = ("一-鿿"    # CJK Unified Ideographs
              "㐀-䶿"    # CJK Extension A
              "぀-ヿ"    # Hiragana + Katakana
              "가-힯")   # Hangul syllables
_CJK_SPLIT_RE = re.compile(f"([{CJK_RANGES}])")


def clean_text(text: str) -> str:
    """Lowercase -> strip ASCII punctuation + non-ws C0 controls/DEL ->
    collapse whitespace -> trim."""
    t = text.lower().translate(_PUNCT_TABLE)
    return _WS_RE.sub(" ", t).strip()


def tokenize(cleaned: str, mode: str, cache: dict | None = None) -> np.ndarray:
    """Token-hash sequence (u64) for cleaned text.

    Modes (ref: OmniTokenizer /root/reference/src/main.rs:327-366):
      words  — whitespace-delimited words with CJK ideographs split per
               character (UAX#29 behavior), each stably hashed
               (analog of uniseg word-bounds + SipHash; divergence: does
               not emit whitespace segments as tokens)
      uniseg — words PLUS a single-space token between adjacent word
               segments, exactly `split_word_bounds` on cleaned text
               (ref src/main.rs:352-358; executable spec
               ref_oracle.py:tokenize): on cleaned text (single spaces)
               UAX#29 emits alternating words and " " segments; CJK
               characters are their own segments with NO space between.
               This makes the shingle stream structurally identical to
               the reference binary's at matched config.
      bytes  — raw UTF-8 byte values as token ids (reference default arm)
      p50k / cl100k — tiktoken BPE, gated on availability
    """
    if mode in ("words", "uniseg"):
        if not cleaned:
            return np.empty(0, dtype=U64)
        if mode == "uniseg":
            toks: list[str] = []
            for i, w in enumerate(cleaned.split(" ")):
                if i:
                    toks.append(" ")
                if not w:
                    continue
                if _CJK_SPLIT_RE.search(w):
                    toks.extend(s for s in _CJK_SPLIT_RE.split(w) if s)
                else:
                    toks.append(w)
        else:
            if _CJK_SPLIT_RE.search(cleaned):
                cleaned = _CJK_SPLIT_RE.sub(r" \1 ", cleaned)
            toks = [t for t in cleaned.split(" ") if t]
        if not toks:
            return np.empty(0, dtype=U64)
        # token hash = xxHash64(utf8, seed 42) — EXACTLY Spark's
        # xxhash64(), so the JVM tokenization path (doc_assembly.
        # assemble_token_docs, codegen) and this Python path produce
        # identical token ids (parity tested in tests/test_kernel.py)
        from minhash_rs_spark.functions.xxhash import xxhash64
        if cache is None:
            return np.fromiter((xxhash64(w) for w in toks), dtype=U64,
                               count=len(toks))
        out = np.empty(len(toks), dtype=U64)
        for i, w in enumerate(toks):
            h = cache.get(w)
            if h is None:
                h = xxhash64(w)
                cache[w] = h
            out[i] = h
        return out
    if mode == "bytes":
        return np.frombuffer(cleaned.encode("utf-8"), dtype=np.uint8).astype(U64)
    if mode in ("p50k", "cl100k"):
        try:
            import tiktoken  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in this container
            raise NotImplementedError(
                f"tokenizer {mode!r} requires the public `tiktoken` package, "
                "which is not installed in this environment"
            ) from e
        enc = tiktoken.get_encoding("p50k_base" if mode == "p50k" else "cl100k_base")
        return np.asarray(enc.encode(cleaned, disallowed_special=()), dtype=U64)
    raise ValueError(f"unknown tokenizer mode {mode!r}")


def doc_shingles(text: str, ngram_size: int, mode: str = "words",
                 cache: dict | None = None) -> np.ndarray:
    """Unique, sorted u64 shingle ids for one document.

    Uniqueness does not change MinHash (min over a set) and is exactly
    what exact-Jaccard verification needs (ref set-variant:
    /root/reference/src/main.rs:563-576).
    """
    toks = tokenize(clean_text(text), mode, cache)
    return np.unique(H.rolling_poly_hashes(toks, ngram_size))


@dataclass
class SignatureKernel:
    """Precomputed permutation state + batch signature computation."""

    num_bands: int = 14
    band_size: int = 8
    ngram_size: int = 5
    tokenizer: str = "words"
    hash_seed: int = 0
    exact_override: bool = False

    def __post_init__(self):
        band_seeds = H.expand_band_seeds(self.hash_seed, self.num_bands)
        perm_seeds = H.expand_perm_seeds(band_seeds, self.band_size)
        self.a_hi, self.a_lo = H.init_permutations(perm_seeds)
        self.num_perms = self.num_bands * self.band_size

    # ---- shingling ----

    def shingles_batch(self, texts) -> list[np.ndarray | None]:
        """Per-doc shingle sets; a doc whose tokenization raises yields
        None (P7 failure guard, ref catch_unwind src/main.rs:522-526) —
        callers drop it and it survives downstream as a singleton."""
        cache: dict = {}
        out: list[np.ndarray | None] = []
        for t in texts:
            try:
                out.append(doc_shingles(t if t is not None else "",
                                        self.ngram_size, self.tokenizer, cache))
            except (ValueError, NotImplementedError):
                raise  # config errors must fail the job, not skip docs
            except Exception:
                out.append(None)
        return out

    # ---- minhash ----

    def minhash_from_shingles(self, shingle_arrays: list[np.ndarray]) -> np.ndarray:
        """(num_docs, num_perms) u64 minhash matrix.

        Flattens docs' shingles and runs each permutation's multiply-shift
        + per-doc min (np.minimum.reduceat) — the vectorized analog of ref
        src/main.rs:664-677. Work is blocked into cache-resident chunks of
        docs (~64k shingles) with the permutation loop INSIDE the block:
        the limb arrays stay hot in L2/L3 across all 112 permutations
        instead of streaming ~10 u64 temporaries per perm through DRAM —
        executors run ~32 such kernels concurrently, so the unblocked
        version saturates memory bandwidth (measured ~10x slowdown).
        """
        ndocs = len(shingle_arrays)
        if ndocs == 0:
            return np.full((0, self.num_perms), H.MAX_HASH, dtype=U64)
        lens = np.array([len(a) for a in shingle_arrays], dtype=np.int64)
        # every doc has >=1 shingle (short-doc fallback in rolling_poly_hashes)
        assert (lens > 0).all(), "doc with zero shingles — fallback violated"
        flat = np.concatenate(shingle_arrays) if ndocs > 1 else shingle_arrays[0]
        starts = np.zeros(ndocs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        return self.minhash_from_flat(flat, starts)

    def minhash_from_flat(self, flat: np.ndarray, starts: np.ndarray) -> np.ndarray:
        """Same, over pre-flattened shingles + doc start offsets (the
        zero-copy Arrow ListArray layout; see udfs.band_signature_rows)."""
        ndocs = len(starts)
        hv = np.full((ndocs, self.num_perms), H.MAX_HASH, dtype=U64)
        if ndocs == 0:
            return hv
        flat = flat.astype(U64, copy=False)
        ends = np.concatenate([starts[1:], [len(flat)]])
        # np.minimum.reduceat misbehaves on empty segments; shingle_sets
        # guarantees >=1 shingle/doc (short-doc fallback)
        assert (ends > starts).all(), "empty shingle segment"

        # shingles per block: ~8 u64 temporaries x 128KB stay L2-resident
        # per worker even with 32 concurrent workers sharing L3 (measured
        # best aggregate throughput across {4k,8k,16k,64k})
        block_target = 16384
        d0 = 0
        while d0 < ndocs:
            d1 = d0 + 1
            while d1 < ndocs and ends[d1 - 1] - starts[d0] < block_target:
                d1 += 1
            seg = flat[starts[d0]:ends[d1 - 1]]
            seg_starts = starts[d0:d1] - starts[d0]
            h_hi, h_lo = H.shingle_u128(seg)
            H.minhash_block(self.a_hi, self.a_lo, h_hi, h_lo,
                            seg_starts, hv[d0:d1])
            d0 = d1
        return hv

    def signatures_from_shingles(self, shingle_arrays: list[np.ndarray]
                                 ) -> tuple[np.ndarray, np.ndarray]:
        """Per-doc per-band 128-bit LSH keys: (hi, lo) each (num_docs, num_bands)."""
        hv = self.minhash_from_shingles(shingle_arrays)
        return H.band_signatures(hv, self.num_bands, self.band_size)

    def band_sigs_from_flat(self, flat: np.ndarray, starts: np.ndarray
                            ) -> tuple[np.ndarray, np.ndarray]:
        """Band signatures straight from the Arrow ListArray layout."""
        hv = self.minhash_from_flat(flat, starts)
        return H.band_signatures(hv, self.num_bands, self.band_size)

    def signatures_for_texts(self, texts) -> tuple[np.ndarray, np.ndarray]:
        if self.exact_override:
            # one whole-doc hash replicated to all perms -> all bands carry
            # the same exact-text identity (ref: src/main.rs:522-533)
            doc_h = np.fromiter(
                (H.stable_str_hash(clean_text(t if t is not None else ""))
                 for t in texts), dtype=U64, count=len(texts))
            hv = np.repeat(doc_h[:, None], self.num_perms, axis=1)
            return H.band_signatures(hv, self.num_bands, self.band_size)
        return self.signatures_from_shingles(self.shingles_batch(texts))


def jaccard_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique u64 shingle arrays
    (ref: jaccard_similarity /root/reference/src/main.rs:1673-1677)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0
