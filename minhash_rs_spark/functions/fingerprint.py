"""128-bit text fingerprints for shuffle keys (JVM-side, codegen).

At 10^12 documents a single 64-bit hash key has a >2% birthday
probability of one false merge; two 64-bit halves push that to ~1e-14
— the same stance the reference takes by keying its ledger on the full
SipHash'd text (/root/reference/src/exact_dedup.rs:105-115).

Independence note: Spark's `xxhash64(a, b)` chains column b's hash
WITH a's digest as the seed, i.e. xxhash64(txt, lit) is a pure
function of xxhash64(txt) — a collision in the first half would imply
a collision in the second, making the pair no stronger than 64 bits.
Putting the constant FIRST (`xxhash64(lit, txt)`) hashes txt under a
different effective seed (XXH64(lit_bytes, 42)), so the two halves are
distinct-seed xxHash64 digests of the text — the standard
two-independent-hashes approximation, not a derived value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# arbitrary public constant (64-bit golden ratio) acting as the seed
# material for the second half; wrapped to signed for F.lit(LongType)
_SEED2 = 0x9E3779B97F4A7C15 - (1 << 64)


def fingerprint128(col: Column | str) -> tuple[Column, Column]:
    """Two longs forming a 128-bit fingerprint of a string column.

    Nulls hash like '' — pair with a separate is-null flag when null
    vs empty must stay distinct (see exact_dedup.exact_cc).
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.xxhash64(c), F.xxhash64(F.lit(_SEED2), c)
