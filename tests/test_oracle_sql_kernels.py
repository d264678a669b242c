"""oracle_sql.py — the DuckDB SQL twins of the integer kernels — must
reproduce the engine's values bit-for-bit, because the driver's
correctness gate compares value hashes. These tests need no Spark: the
engine side is the numpy kernel (functions/kernel.py) and the pure
xxhash spec (functions/xxhash.py); the oracle side is DuckDB.
"""

import sys
from pathlib import Path

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from minhash_rs_spark import oracle_sql as O  # noqa: E402
from minhash_rs_spark.functions.kernel import (  # noqa: E402
    SignatureKernel,
    doc_shingles,
)
from minhash_rs_spark.functions.xxhash import xxhash64  # noqa: E402


def _sgn(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _con_with_docs(texts):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") AS t(doc_id, text)", list(texts))
    return con


def _chain_sql(tail: str) -> str:
    """docs(doc_id, text) -> shingle rows `shd(did, sv)` + `mins`,
    mirroring __spark_entry__._sig_chain_ctes for plain tables."""
    hhi, hlo = O.shingle_u128_exprs("sv")
    mins = ", ".join(O.perm_min_exprs(0, 14, 8))
    return f"""
WITH docs_o AS (SELECT doc_id AS did, coalesce(text, '') AS dt FROM docs),
toks AS (SELECT did, {O.tokens_expr('dt')} AS t FROM docs_o),
tw AS (SELECT did, CAST(u.i AS BIGINT) AS tpos, t[CAST(u.i AS INTEGER)] AS w
       FROM toks, UNNEST(range(1, len(t)+1)) AS u(i)),
{O.xxh64_ctes('tw', 'did, tpos', 'w').lstrip()},
thl0 AS (SELECT did, list(h ORDER BY tpos) AS th FROM xh GROUP BY did),
thl AS (SELECT d.did, coalesce(t.th, []) AS th
        FROM docs_o d LEFT JOIN thl0 t USING (did)),
shl AS (SELECT did, {O.shingle_list('th', 5)} AS s FROM thl),
shd AS MATERIALIZED (SELECT DISTINCT did, CAST(u.sv AS UBIGINT) AS sv
        FROM shl, UNNEST(s) AS u(sv)),
hu AS (SELECT did, {hhi} AS hhi, {hlo} AS hlo FROM shd),
mins AS MATERIALIZED (SELECT did, {mins} FROM hu GROUP BY did)
{tail}
"""


# every XXH64 control-flow arm: empty, sub-stripe lengths around the
# 8/4/1-byte tail boundaries, exact/off-by-one stripe sizes, multi-byte
# UTF-8 (the hash runs over UTF-8 bytes, not code points)
_EDGE_WORDS = ["", "a", "abc", "abcd", "abcde", "sevenby", "eightbyt",
               "ninebytes", "0123456789ab", "0123456789abcde",
               "0123456789abcdef", "x" * 23, "y" * 31, "z" * 32,
               "w" * 33, "v" * 63, "u" * 64, "t" * 65, "s" * 100,
               "naïve", "日本語のテスト", "🙂emoji🙃"]


def test_xxh64_sql_matches_spec_on_edges():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE toks AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(_EDGE_WORDS)))
        + ") AS t(tid, w)", _EDGE_WORDS)
    q = ("WITH " + O.xxh64_ctes("toks", "tid", "w")
         + " SELECT tid, h FROM xh ORDER BY tid")
    got = dict(con.sql(q).fetchall())
    for i, w in enumerate(_EDGE_WORDS):
        assert got[i] == xxhash64(w), (i, w)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=90), min_size=1, max_size=8))
def test_xxh64_sql_matches_spec_fuzz(words):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE toks AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(words)))
        + ") AS t(tid, w)", words)
    q = ("WITH " + O.xxh64_ctes("toks", "tid", "w")
         + " SELECT tid, h FROM xh ORDER BY tid")
    got = dict(con.sql(q).fetchall())
    for i, w in enumerate(words):
        assert got[i] == xxhash64(w), repr(w)


_TEXTS = [
    "", "   ", "hello", "Hello, World! This is a TEST of the kernel.",
    "one two three four",            # < ngram -> fallback shingle
    "one two three four five",       # exactly ngram
    "repeat repeat repeat repeat repeat repeat repeat",  # dup shingles
    "punct!!! only??? ###", "tabs\tand\nnewlines\vand\fmore\rws",
    "日本語のテストと English mixed 文章です",  # CJK per-char split
    ("lorem ipsum dolor sit amet consectetur " * 15).strip(),
    "Ünïcodé wörds naïve café résumé",
]


def test_shingle_chain_sql_matches_kernel():
    """Full normalize -> tokenize -> xxhash64 -> rolling-poly -> mix64
    -> distinct chain: SQL twin == kernel.doc_shingles on every doc,
    including empty/fallback/CJK/control-char cases."""
    con = _con_with_docs(_TEXTS)
    q = _chain_sql(
        "SELECT did, list_sort(list_distinct(s)) AS s FROM shl ORDER BY did")
    got = {r[0]: [int(x) for x in r[1]] for r in con.sql(q).fetchall()}
    for i, t in enumerate(_TEXTS):
        want = np.sort(doc_shingles(t, 5, "words")).tolist()
        assert got[i] == want, (i, t[:40])


def test_band_signatures_sql_matches_kernel():
    """112-permutation multiply-shift minima + 14 band signatures
    (H1-H5) recomputed in DuckDB == SignatureKernel bit-for-bit."""
    kern = SignatureKernel()  # 14 x 8, seed 0 — the engine default
    hi, lo = kern.signatures_for_texts(_TEXTS)
    con = _con_with_docs(_TEXTS)
    q = _chain_sql(O.band_sig_select(14, 8, key="did"))
    got = {(r[0], r[1]): (r[2], r[3]) for r in con.sql(q).fetchall()}
    for i in range(len(_TEXTS)):
        for b in range(14):
            assert got[(i, b)] == (_sgn(int(hi[i, b])), _sgn(int(lo[i, b])))


def test_simhash_sql_matches_kernel():
    """Per-bit majority vote (ties set the bit) == udfs.with_simhash
    math, replayed here in numpy over the same shingle sets."""
    con = _con_with_docs(_TEXTS)
    q = _chain_sql(O.simhash_select("shd", key="did"))
    got = {r[0]: (r[1], r[2]) for r in con.sql(q).fetchall()}
    for i, t in enumerate(_TEXTS):
        sh = np.sort(doc_shingles(t, 5, "words"))
        bits = np.unpackbits(sh.view(np.uint8)).reshape(-1, 64)
        votes = bits.sum(axis=0) * 2 >= len(sh)
        sig = np.packbits(votes.astype(np.uint8)).view(np.uint64)[0]
        assert got[i] == (len(sh), _sgn(int(sig))), (i, t[:40])


@pytest.mark.parametrize("vals", [
    [0, 1, 42, 2**63, 2**64 - 1, 123456789123456789, 0xDEADBEEF],
])
def test_mix64_sql_matches_numpy(vals):
    from minhash_rs_spark.functions.hashing import mix64
    con = duckdb.connect()
    for v in vals:
        got = con.sql(
            f"SELECT {O.mix64(f'CAST({v} AS UBIGINT)')}").fetchone()[0]
        assert got == int(mix64(np.uint64(v)))
