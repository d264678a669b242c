"""Property-based tests (hypothesis) over the pure-numpy kernel —
SURVEY.md §5 item 4. Spark-free, so they run in milliseconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from minhash_rs_spark.functions import hashing as H
from minhash_rs_spark.functions.kernel import (
    SignatureKernel,
    clean_text,
    doc_shingles,
    jaccard_u64,
)

text_st = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
    max_size=300)


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_clean_text_idempotent_and_stable(t):
    c = clean_text(t)
    assert clean_text(c) == c
    assert c == c.strip()
    assert "  " not in c


@settings(max_examples=50, deadline=None)
@given(text_st, text_st)
def test_signatures_depend_only_on_cleaned_text(a, b):
    k = SignatureKernel(num_bands=4, band_size=2, ngram_size=3)
    hi, lo = k.signatures_for_texts([a, b])
    if clean_text(a) == clean_text(b):
        assert (hi[0] == hi[1]).all() and (lo[0] == lo[1]).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2 ** 63 - 1), max_size=60),
       st.integers(1, 8))
def test_flat_rolling_matches_per_doc(tokens, n):
    t = np.array(tokens, dtype=np.uint64)
    sh_flat, sh_starts = H.rolling_poly_from_flat(
        t, np.zeros(1, dtype=np.int64), n)
    assert np.array_equal(sh_flat, H.rolling_poly_hashes(t, n))
    assert len(sh_flat) >= 1  # short-doc fallback


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(0, 2 ** 63 - 1), min_size=1, max_size=80),
       st.sets(st.integers(0, 2 ** 63 - 1), min_size=1, max_size=80))
def test_jaccard_bounds_and_symmetry(sa, sb):
    a = np.array(sorted(sa), dtype=np.uint64)
    b = np.array(sorted(sb), dtype=np.uint64)
    j = jaccard_u64(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard_u64(b, a)
    assert jaccard_u64(a, a) == 1.0
    if not set(sa) & set(sb):
        assert j == 0.0


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="ab ", max_size=120), st.integers(1, 6))
def test_doc_shingles_permutation_of_duplicates_invariant(t, n):
    """Shingle SETS are insensitive to repeating the doc (multiset
    invariance of the set representation)."""
    s1 = doc_shingles(t, n)
    s2 = doc_shingles(t, n)
    assert np.array_equal(s1, s2)
    assert len(np.unique(s1)) == len(s1)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=6, max_size=60),
                min_size=1, max_size=20))
def test_batch_order_invariance(texts):
    """Signatures must not depend on batch composition or order."""
    k = SignatureKernel(num_bands=4, band_size=2, ngram_size=3)
    hi1, lo1 = k.signatures_for_texts(texts)
    order = list(reversed(range(len(texts))))
    hi2, lo2 = k.signatures_for_texts([texts[i] for i in order])
    for out_pos, src in enumerate(order):
        assert (hi2[out_pos] == hi1[src]).all()
        assert (lo2[out_pos] == lo1[src]).all()
