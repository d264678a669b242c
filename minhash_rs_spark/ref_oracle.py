"""Independent reference-faithful MinHash oracle.

A pure-Python re-implementation of the reference pipeline
(/root/reference/src/main.rs:484-692) used to DE-CIRCULARIZE the
dup-pair-recall gate: the engine's production kernel
(functions/hashing.py) uses a splitmix64 / rolling-poly hash family,
while this oracle follows the Rust source's math — so matched clusters
across the two implementations is evidence of algorithm-level parity,
not shared-bug consistency. (The Rust binary itself cannot be built in
this sandbox: no network for crates — see REFERENCE_BINARY.md.)

Shares NO code with the engine: no imports from minhash_rs_spark
modules, no numpy. Everything below is derived from public sources
only: the reference Rust file, RFC 8439 (ChaCha20), and the published
rand / rand_chacha / rand_core crate semantics.

Bit-faithful pieces (same bits as the Rust reference produces):
  * seed_from_u64        rand_core 0.6 SeedableRng::seed_from_u64 —
                         PCG32 fill of the 32-byte ChaCha seed
  * ChaCha20 / ChaCha12  RFC 8439 block function (verified against the
                         RFC test vector in tests/test_ref_oracle.py);
                         ChaCha20Rng.gen::<u128>() = first 16 keystream
                         bytes little-endian, StdRng (rand 0.8 =
                         ChaCha12) next_u64 stream likewise
  * _expand_band_seeds   ref src/main.rs:681-693
  * _init_permutations   ref src/main.rs:642-651
  * multiply-shift min   (a_i * h mod 2^128) >> 64, ref src/main.rs:664-678
  * sliding ngram window + short-doc fallback, ref src/main.rs:616-637
  * SlimPajama clean_text, ref src/main.rs:598-613
  * band signature       SHA256 over the band row's little-endian u64
                         bytes, ref src/main.rs:538-543
  * bucket union         all docs sharing (band, signature) join one
                         component, ref src/main.rs:814-887

Documented divergences (each uniform + deterministic, so cluster
ASSIGNMENTS — the thing the recall gate compares — are unaffected in
distribution):
  * ngram -> u128 hash: the reference uses ahash::RandomState (no
    public specification or test vectors; output depends on compile
    target). Substituted with MD5 of the ngram's token-id bytes.
  * token ids: the reference's "uniseg" mode hashes each unicode word
    segment with DefaultHasher (SipHash-1-3). Substituted with MD5
    low-64. Segmentation itself is faithful for cleaned ASCII text
    (after clean_text strips punctuation and collapses whitespace,
    UAX#29 word bounds = words and single-space segments, both of
    which are emitted as tokens exactly like split_word_bounds()).
  * non-whitespace C0 controls + DEL: the ENGINE strips them in
    clean_text (kernel._C0_STRIP — required for JVM/Python tokenizer
    parity; Java's (?U)\\s and Python's \\s disagree on \\x1c-\\x1f),
    while the reference keeps them (its uniseg emits each as its own
    segment). This oracle models the reference and keeps them; the
    recall-gate corpora contain no control bytes, so the comparison is
    unaffected.
"""

from __future__ import annotations

import hashlib
import struct

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF
M128 = (1 << 128) - 1


# ---------------------------------------------------------------- ChaCha


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & M32


def _quarter(st: list, a: int, b: int, c: int, d: int) -> None:
    st[a] = (st[a] + st[b]) & M32
    st[d] = _rotl32(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & M32
    st[b] = _rotl32(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b]) & M32
    st[d] = _rotl32(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & M32
    st[b] = _rotl32(st[b] ^ st[c], 7)


def chacha_block(key: bytes, block_words: tuple, rounds: int = 20) -> bytes:
    """One ChaCha block (RFC 8439 §2.3). block_words = state words 12..15
    (counter/nonce layout differs between the RFC and rand_chacha, so the
    caller supplies them directly)."""
    init = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574,
            *struct.unpack("<8I", key), *block_words]
    st = list(init)
    for _ in range(rounds // 2):
        _quarter(st, 0, 4, 8, 12)
        _quarter(st, 1, 5, 9, 13)
        _quarter(st, 2, 6, 10, 14)
        _quarter(st, 3, 7, 11, 15)
        _quarter(st, 0, 5, 10, 15)
        _quarter(st, 1, 6, 11, 12)
        _quarter(st, 2, 7, 8, 13)
        _quarter(st, 3, 4, 9, 14)
    return struct.pack("<16I", *((s + i) & M32 for s, i in zip(st, init)))


def chacha_keystream(key: bytes, nbytes: int, rounds: int = 20) -> bytes:
    """rand_chacha keystream: 64-bit block counter in words 12-13
    starting at 0, stream id (words 14-15) = 0; blocks are sequential."""
    out = bytearray()
    ctr = 0
    while len(out) < nbytes:
        out += chacha_block(
            key, (ctr & M32, (ctr >> 32) & M32, 0, 0), rounds)
        ctr += 1
    return bytes(out[:nbytes])


def seed_from_u64(state: int, nbytes: int = 32) -> bytes:
    """rand_core 0.6 SeedableRng::seed_from_u64: PCG32 output fills the
    seed 4 bytes at a time (advance state first)."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    out = bytearray()
    for _ in range(nbytes // 4):
        state = (state * MUL + INC) & M64
        xorshifted = (((state >> 18) ^ state) >> 27) & M32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & M32
        out += x.to_bytes(4, "little")
    return bytes(out)


# ------------------------------------------------- reference hash graph


def expand_band_seeds(band_seeds: list, n: int) -> list:
    """ref _expand_band_seeds (src/main.rs:681-693): per input seed,
    n next_u64 draws from StdRng (rand 0.8 = ChaCha12), flattened."""
    out = []
    for bs in band_seeds:
        ks = chacha_keystream(seed_from_u64(bs & M64), 8 * n, rounds=12)
        out.extend(int.from_bytes(ks[8 * i:8 * i + 8], "little")
                   for i in range(n))
    return out


def init_permutations(perm_seeds: list) -> list:
    """ref _init_permutations (src/main.rs:642-651):
    a_i = ChaCha20Rng::seed_from_u64(seed).gen::<u128>() — the first 16
    keystream bytes little-endian ((hi << 64) | lo with lo drawn first)."""
    return [int.from_bytes(chacha_keystream(seed_from_u64(s), 16), "little")
            for s in perm_seeds]


_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def clean_text(text: str) -> str:
    """ref clean_text (src/main.rs:598-613): SlimPajama cleaning."""
    text = text.lower()
    text = "".join(c for c in text if c not in _PUNCT)
    text = " ".join(text.split())
    return text


def tokenize(text: str) -> list:
    """ref "uniseg" mode (src/main.rs:352-358): split_word_bounds emits
    word AND whitespace segments; each segment is hashed to a token id.
    On cleaned text (single spaces, punctuation stripped) UAX#29 word
    bounds = alternating words and single spaces. Token id uses MD5
    low-64 in place of DefaultHasher (documented divergence)."""
    segs = []
    for i, w in enumerate(text.split(" ")):
        if i:
            segs.append(" ")
        if w:
            segs.append(w)
    return [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in segs]


def _ngram_hash(ngram: list) -> int:
    """128-bit ngram hash. The reference combines two seeded
    ahash::RandomState draws (src/main.rs:664-672); ahash has no public
    spec, so MD5 over the token-id bytes stands in (divergence noted in
    the module docstring)."""
    buf = b"".join(t.to_bytes(8, "little") for t in ngram)
    return int.from_bytes(hashlib.md5(buf).digest(), "little")


def min_hash_vals(tokens: list, perms: list, ngram_size: int) -> list:
    """ref get_hash_vals_from_tokens (src/main.rs:616-637): sliding
    window of ngram_size over tokens; short docs hash the partial
    window once."""
    n = len(perms)
    vals = [M64] * n
    window = []
    ngram_count = 0
    for tok in tokens:
        window.append(tok)
        if len(window) >= ngram_size:
            ngram_count += 1
            h = _ngram_hash(window)
            for i in range(n):
                v = ((perms[i] * h) & M128) >> 64
                if v < vals[i]:
                    vals[i] = v
            window.pop(0)
    if ngram_count == 0:
        h = _ngram_hash(window)
        for i in range(n):
            vals[i] = ((perms[i] * h) & M128) >> 64
    return vals


def band_digests(hash_vals: list, num_bands: int, band_size: int) -> list:
    """ref band signature (src/main.rs:538-543): SHA256 over the band
    row's u64s as little-endian bytes (bytemuck::cast_slice is native
    LE). The reference truncates to sig_size bytes; the full digest is
    an equivalent (strictly collision-freer) group key."""
    out = []
    for b in range(num_bands):
        row = hash_vals[b * band_size:(b + 1) * band_size]
        buf = b"".join(v.to_bytes(8, "little") for v in row)
        out.append(hashlib.sha256(buf).digest())
    return out


# ----------------------------------------------------------- clustering


class _UF:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins (matches the engine's
            # min-rooted components; irrelevant to pair membership)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def cluster(docs: dict, num_bands: int = 14, band_size: int = 8,
            ngram_size: int = 5, hash_seed: int = 0) -> dict:
    """Full reference pipeline over {doc_id: raw_text}: returns
    {doc_id: component_root}. Mirrors hash_only + gather-edges +
    build_uf (src/main.rs:430-560, 814-887)."""
    band_seeds = [s & M32 for s in
                  expand_band_seeds([hash_seed & M32], num_bands)]
    perm_seeds = expand_band_seeds(band_seeds, band_size)
    perms = init_permutations(perm_seeds)

    buckets = {}
    for doc_id, text in docs.items():
        tokens = tokenize(clean_text(text))
        vals = min_hash_vals(tokens, perms, ngram_size)
        for b, dig in enumerate(band_digests(vals, num_bands, band_size)):
            buckets.setdefault((b, dig), []).append(doc_id)

    uf = _UF()
    for members in buckets.values():
        for m in members[1:]:
            uf.union(members[0], m)
    return {d: uf.find(d) for d in docs}


def dup_pairs(assignment: dict) -> set:
    """All unordered within-component pairs of a {doc: root} map."""
    comps = {}
    for d, r in assignment.items():
        comps.setdefault(r, []).append(d)
    pairs = set()
    for members in comps.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs
