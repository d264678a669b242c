"""Math-level kernel tests: vectorized numpy kernel vs the independent
pure-Python oracle (SURVEY.md §5 item 1)."""

import numpy as np
import pytest

from minhash_rs_spark import oracle
from minhash_rs_spark.functions import hashing as H
from minhash_rs_spark.functions.kernel import (
    SignatureKernel,
    clean_text,
    doc_shingles,
    jaccard_u64,
    tokenize,
)

TEXTS = [
    "Hello, World! This is a test document with several words in it.",
    "hello world this is a test document with several words in it",
    "Completely different content about sparks and anvils forging ahead.",
    "short",
    "",
    "a b c d",
    "  Multiple   spaces\tand\nnewlines  here  ",
    "UPPER lower MiXeD case; with (punctuation) [brackets] {braces}!",
]


def test_clean_text_slimpajama_semantics():
    # ref: clean_text /root/reference/src/main.rs:598-614
    assert clean_text("Hello, World!") == "hello world"
    assert clean_text("  a   b\t c \n d ") == "a b c d"
    assert clean_text("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") == ""
    assert clean_text("") == ""
    assert clean_text("don't stop-me now...") == "dont stopme now"


def test_tokenize_modes():
    assert len(tokenize("a b c", "words")) == 3
    assert len(tokenize("", "words")) == 0
    assert list(tokenize("ab", "bytes")) == [97, 98]
    with pytest.raises(ValueError):
        tokenize("x", "nope")


def test_short_doc_fallback_single_shingle():
    # ref: src/main.rs:631-635 — fewer tokens than ngram_size -> 1 shingle
    for t in ["", "one", "one two", "one two three four"]:
        assert len(doc_shingles(t, 5)) == 1
    assert len(doc_shingles("a b c d e", 5)) == 1  # exactly one full ngram
    assert len(doc_shingles("a b c d e f", 5)) == 2


def test_vectorized_matches_python_oracle():
    k = SignatureKernel(num_bands=14, band_size=8, ngram_size=5, hash_seed=0)
    hi, lo = k.signatures_for_texts(TEXTS)
    for i, t in enumerate(TEXTS):
        expect = oracle.signatures_for_text(t, 14, 8, 5, 0)
        got = [(int(hi[i, b]), int(lo[i, b])) for b in range(14)]
        assert got == expect, f"doc {i}: vectorized != oracle"


def test_other_configs_match_oracle():
    k = SignatureKernel(num_bands=4, band_size=3, ngram_size=2, hash_seed=99)
    hi, lo = k.signatures_for_texts(TEXTS[:4])
    for i, t in enumerate(TEXTS[:4]):
        expect = oracle.signatures_for_text(t, 4, 3, 2, 99)
        got = [(int(hi[i, b]), int(lo[i, b])) for b in range(4)]
        assert got == expect


def test_identical_after_cleaning_identical_sigs():
    k = SignatureKernel()
    hi, lo = k.signatures_for_texts(TEXTS)
    assert (hi[0] == hi[1]).all() and (lo[0] == lo[1]).all()
    assert not (hi[0] == hi[2]).all()


def test_seed_changes_signatures():
    k0 = SignatureKernel(hash_seed=0)
    k1 = SignatureKernel(hash_seed=1)
    h0, _ = k0.signatures_for_texts(TEXTS[:1])
    h1, _ = k1.signatures_for_texts(TEXTS[:1])
    assert not (h0 == h1).all()


def test_exact_override_whole_doc_identity():
    # ref: src/main.rs:522-533
    k = SignatureKernel(exact_override=True)
    hi, _ = k.signatures_for_texts(["Same text.", "same text", "other"])
    assert (hi[0] == hi[1]).all()
    assert not (hi[0] == hi[2]).all()


def test_mulhi64_against_bigint():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2 ** 64, 1000, dtype=np.uint64)
    y = rng.integers(0, 2 ** 64, 1000, dtype=np.uint64)
    got = H.mulhi64(x, y)
    for i in range(0, 1000, 97):
        assert int(got[i]) == (int(x[i]) * int(y[i])) >> 64


def test_jaccard():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert jaccard_u64(a, b) == pytest.approx(2 / 6)
    assert jaccard_u64(a, a) == 1.0
    assert jaccard_u64(np.array([], dtype=np.uint64),
                       np.array([], dtype=np.uint64)) == 1.0


def test_minhash_estimates_jaccard():
    """MinHash collision probability ~ true Jaccard (sanity of the
    permutation math as an LSH family)."""
    k = SignatureKernel(num_bands=64, band_size=1, ngram_size=3, hash_seed=5)
    base = " ".join(f"w{i}" for i in range(200))
    variant = " ".join((f"w{i}" if i % 5 else f"v{i}") for i in range(200))
    sa, sb = k.shingles_batch([base, variant])
    true_j = jaccard_u64(sa, sb)
    hv = k.minhash_from_shingles([sa, sb])
    est = (hv[0] == hv[1]).mean()
    assert abs(est - true_j) < 0.15


def test_xxhash64_matches_known_vectors():
    """Pure-Python xxHash64 vs fixed test vectors computed via Spark's
    xxhash64() (seed 42) — anchors the JVM/Python token-hash parity."""
    from minhash_rs_spark.functions.xxhash import xxhash64_signed

    # vectors captured from pyspark 4.1.2 F.xxhash64 (seed 42)
    assert xxhash64_signed("") == -7444071767201028348
    assert xxhash64_signed("hello") == -4367754540140381902


def test_flat_rolling_and_unique_match_per_doc():
    rng = np.random.default_rng(3)
    docs = [rng.integers(0, 2 ** 63, rng.integers(0, 25)).astype(np.uint64)
            for _ in range(100)]
    starts = np.zeros(len(docs), dtype=np.int64)
    lens = np.array([len(d) for d in docs])
    np.cumsum(lens[:-1], out=starts[1:])
    flat = np.concatenate(docs)
    sh_flat, sh_starts = H.rolling_poly_from_flat(flat, starts, 5)
    ends = np.concatenate([sh_starts[1:], [len(sh_flat)]])
    u_flat, u_starts = H.unique_per_doc(sh_flat, sh_starts)
    uends = np.concatenate([u_starts[1:], [len(u_flat)]])
    for i, d in enumerate(docs):
        assert np.array_equal(sh_flat[sh_starts[i]:ends[i]],
                              H.rolling_poly_hashes(d, 5))
        assert np.array_equal(u_flat[u_starts[i]:uends[i]],
                              np.unique(H.rolling_poly_hashes(d, 5)))


def test_with_jaccard_matches_scalar_kernel(spark):
    """Vectorized batch Jaccard (lexsort + adjacent-dup count) must be
    bit-identical to the scalar jaccard_u64 on random sets incl. empties."""
    import numpy as np

    from minhash_rs_spark.functions.kernel import jaccard_u64
    from minhash_rs_spark.functions.udfs import with_jaccard

    rng = np.random.RandomState(7)
    rows = []
    for i in range(200):
        na, nb = rng.randint(0, 12, size=2)
        a = np.unique(rng.randint(0, 30, size=na).astype(np.int64))
        # overlap with a sometimes
        b = np.unique(np.concatenate(
            [rng.randint(0, 30, size=nb), a[:rng.randint(0, len(a) + 1)]]
        ).astype(np.int64)) if na or nb else np.array([], dtype=np.int64)
        rows.append((i, [int(x) for x in a], [int(x) for x in b]))
    df = spark.createDataFrame(rows, "id long, a array<long>, b array<long>")
    got = {r["id"]: r["j"] for r in with_jaccard(df, "a", "b", "j").collect()}
    for i, a, b in rows:
        want = jaccard_u64(np.array(a, dtype=np.int64).view(np.uint64),
                           np.array(b, dtype=np.int64).view(np.uint64))
        assert got[i] == want, (i, got[i], want)


def test_with_simhash_matches_rowwise(spark):
    """Vectorized simhash (reduceat) == per-row unpackbits majority vote."""
    import numpy as np

    from minhash_rs_spark.functions.udfs import with_simhash

    def rowwise(vals):
        s = np.array(vals, dtype=np.int64).view(np.uint64)
        if len(s) == 0:
            return 0
        bits = np.unpackbits(s.view(np.uint8)).reshape(len(s), 64)
        votes = bits.sum(axis=0) * 2 >= len(s)
        return int(np.packbits(votes.astype(np.uint8)).view(np.int64)[0])

    rng = np.random.RandomState(9)
    rows = [(i, [int(x) for x in
                 rng.randint(-2**62, 2**62, size=rng.randint(0, 20))])
            for i in range(100)]
    rows.append((100, []))          # leading/trailing empties
    rows.insert(0, (-1, []))
    df = spark.createDataFrame(rows, "id long, shingles array<long>")
    got = {r["id"]: r["simhash"]
           for r in with_simhash(df, "shingles").collect()}
    for i, vals in rows:
        assert got[i] == rowwise(vals), i


def test_reference_config_exact_override_sense():
    """The reference's exact_override boolean is inverted relative to
    its name (src/main.rs:522-533: false -> doc-level hash_object,
    true -> ngram MinHash; examples/simple_exact/config.yaml performs
    exact dedup WITHOUT setting the flag). Translation must negate."""
    from minhash_rs_spark.config import MinHashConfig

    # reference default (simple_exact example) = exact doc-hash mode
    assert MinHashConfig.from_reference_dict({}).exact_override is True
    # reference exact_override: true = fuzzy ngram MinHash
    assert MinHashConfig.from_reference_dict(
        {"exact_override": True}).exact_override is False
