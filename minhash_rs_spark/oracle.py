"""Slow pure-Python oracle of the MinHash kernel (tests only).

Same mathematical definitions as functions/hashing.py + functions/
kernel.py but implemented with Python big-int arithmetic (explicit
mod 2^64 / 2^128) instead of numpy limb tricks — an independent code
path used by pytest to validate the vectorized kernel, in the role the
reference's python/data_reader.py plays for its binary formats
(/root/reference/python/data_reader.py:1-4).
"""

from __future__ import annotations

from minhash_rs_spark.functions.kernel import clean_text, tokenize

_M = (1 << 64) - 1
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB
_GOLDEN = 0x9E3779B97F4A7C15
_C_LO = 0x243F6A8885A308D3
_C_HI = 0x13198A2E03707344
_POLY_B = 0x100000001B3


def mix64(x: int) -> int:
    x &= _M
    x ^= x >> 30
    x = (x * _M1) & _M
    x ^= x >> 27
    x = (x * _M2) & _M
    x ^= x >> 31
    return x


def splitmix_stream(seed: int, n: int) -> list[int]:
    return [mix64((seed + _GOLDEN * i) & _M) for i in range(1, n + 1)]


def perm_multipliers(hash_seed: int, num_bands: int, band_size: int) -> list[int]:
    perms = []
    for bs in splitmix_stream(hash_seed, num_bands):
        for ps in splitmix_stream(bs, band_size):
            a_hi = mix64(ps ^ _C_HI)
            a_lo = mix64(ps ^ _C_LO) | 1
            perms.append((a_hi << 64) | a_lo)
    return perms


def doc_shingles(text: str, ngram_size: int, mode: str = "words") -> set[int]:
    toks = [int(t) for t in tokenize(clean_text(text), mode)]
    if len(toks) < ngram_size:
        acc = 0
        for t in toks:
            acc = (acc * _POLY_B + t) & _M
        return {mix64(acc)}
    out = set()
    for i in range(len(toks) - ngram_size + 1):
        acc = 0
        for t in toks[i:i + ngram_size]:
            acc = (acc * _POLY_B + t) & _M
        out.add(mix64(acc))
    return out


def minhash_vector(shingles: set[int], perms: list[int]) -> list[int]:
    hs = [(mix64(s ^ _C_HI) << 64) | mix64(s ^ _C_LO) for s in shingles]
    return [min(((a * h) % (1 << 128)) >> 64 for h in hs) for a in perms]


def band_sigs(hv: list[int], num_bands: int, band_size: int) -> list[tuple[int, int]]:
    sigs = []
    for b in range(num_bands):
        acc = 0
        for v in hv[b * band_size:(b + 1) * band_size]:
            acc = (acc * _POLY_B + v) & _M
        acc = (acc + mix64(b)) & _M
        sigs.append((mix64(acc ^ _C_HI), mix64(acc ^ _C_LO)))
    return sigs


def signatures_for_text(text: str, num_bands: int, band_size: int,
                        ngram_size: int, hash_seed: int = 0,
                        mode: str = "words") -> list[tuple[int, int]]:
    perms = perm_multipliers(hash_seed, num_bands, band_size)
    hv = minhash_vector(doc_shingles(text, ngram_size, mode), perms)
    return band_sigs(hv, num_bands, band_size)


def cluster_oracle(docs: dict[str, str], num_bands: int, band_size: int,
                   ngram_size: int, hash_seed: int = 0,
                   mode: str = "words") -> dict[str, str]:
    """Reference-algorithm clustering on a small corpus: LSH buckets ->
    union-find -> cc_id = min(conv_id). The ground truth for the
    recall>=0.99 gate (BASELINE.md)."""
    parent: dict[str, str] = {k: k for k in docs}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    buckets: dict[tuple, list[str]] = {}
    for cid, text in docs.items():
        for band_id, sig in enumerate(
                signatures_for_text(text, num_bands, band_size, ngram_size,
                                    hash_seed, mode)):
            buckets.setdefault((band_id, sig), []).append(cid)
    for members in buckets.values():
        for other in members[1:]:
            union(members[0], other)
    return {k: find(k) for k in docs}
