"""SimHash near-dup path (north-rule addition; no reference counterpart).

sig = 64-bit per-bit majority vote over the doc's (uniformly mixed)
shingle hashes (functions/udfs.simhash_udf). Near-duplicates = pairs with
Hamming distance <= hamming_threshold.

Candidate generation is pigeonhole block-LSH: split the 64-bit signature
into `num_blocks` contiguous blocks; any pair within Hamming distance
num_blocks-1 shares at least one exact block. Blocks are emitted with a
single explode over one scan of sigs (not a num_blocks-way union), and
candidate edges come from operators/lsh.pair-edge logic:

  * block groups with cnt <= pair_cap get ALL within-group pairs, so the
    pigeonhole recall guarantee (every pair at Hamming <= num_blocks-1
    is verified directly) holds exactly for them;
  * giant groups (cnt > pair_cap — e.g. a crowd of identical docs whose
    block value is shared) fall back to star + salted sub-star edges:
    linear edge count, heuristic recall (a giant MIXED group can still
    lose a pair whose two rep edges both fail verification; bounded to
    cnt > pair_cap and documented here, NOT claimed as recall 1.0).

Verification is JVM-side: bit_count(sig_a ^ sig_b) — no Python.

Same output contract as the minhash path: edges -> connected components
-> cluster_assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minhash_rs_spark.functions.udfs import with_simhash
from minhash_rs_spark.operators.connected_components import connected_components
from minhash_rs_spark.operators.lsh import chain_edges

BLOCK_KEY = ["block_id", "block_val"]


def simhash_signatures(shingles: DataFrame) -> DataFrame:
    """(conv_id, shingles) -> (conv_id, simhash: long) — batch-vectorized
    mapInArrow (udfs.with_simhash), no per-row Python."""
    return with_simhash(shingles.select("conv_id", "shingles"),
                        "shingles", "simhash")


def _block_rows(sigs: DataFrame, num_blocks: int) -> DataFrame:
    """One row per (doc, block): a single scan of sigs + explode."""
    assert 64 % num_blocks == 0
    width = 64 // num_blocks
    mask = (1 << width) - 1
    parts = F.array(*[
        F.struct(F.lit(b).alias("block_id"),
                 (F.shiftrightunsigned(F.col("simhash"), b * width)
                  .bitwiseAND(F.lit(mask))).alias("block_val"))
        for b in range(num_blocks)
    ])
    return (sigs.select("conv_id", F.explode(parts).alias("blk"))
            .select("conv_id", F.col("blk.block_id").alias("block_id"),
                    F.col("blk.block_val").alias("block_val")))


def simhash_candidate_edges(sigs: DataFrame, num_blocks: int = 4,
                            pair_cap: int = 32,
                            sub_salt: int = 16,
                            chain: bool = True,
                            probe_giants: bool = True) -> DataFrame:
    """Candidate edges over pigeonhole blocks: all pairs for small block
    groups, star + salted sub-star for giant ones (see module doc).

    probe_giants: same round-7 build-time probe as lsh.pair_edges —
    when no block group exceeds pair_cap (one cheap isEmpty over the
    algebraic group aggregate), the giant-group branches are provably
    empty and the returned plan is the all-pairs branch alone
    (identical edge set, ~8 fewer fixed-latency stage-jobs)."""
    blocks = _block_rows(sigs, num_blocks)
    groups = (blocks.groupBy(*BLOCK_KEY)
              .agg(F.min("conv_id").alias("rep"),
                   F.count(F.lit(1)).alias("cnt"))
              .where(F.col("cnt") > 1))

    if probe_giants and groups.where(F.col("cnt") > pair_cap).isEmpty():
        # cnt <= pair_cap stays in the plan (see lsh.pair_edges): a
        # no-op when the probe held, the quadratic bound if the lineage
        # recomputes a group past the cap
        small_now = groups.where(F.col("cnt") <= pair_cap).select(*BLOCK_KEY)
        sm = blocks.join(small_now, BLOCK_KEY)
        return (sm.join(sm.select(*BLOCK_KEY, F.col("conv_id").alias("dst")),
                        BLOCK_KEY)
                .where(F.col("conv_id") > F.col("dst"))
                .select(F.col("conv_id").alias("src"), "dst")
                .distinct())

    small = groups.where(F.col("cnt") <= pair_cap).select(*BLOCK_KEY)
    big = groups.where(F.col("cnt") > pair_cap).select(*BLOCK_KEY, "rep")

    sm = blocks.join(small, BLOCK_KEY)
    pairs = (sm.join(sm.select(*BLOCK_KEY, F.col("conv_id").alias("dst")),
                     BLOCK_KEY)
             .where(F.col("conv_id") > F.col("dst"))
             .select(F.col("conv_id").alias("src"), "dst"))

    bm = (blocks.join(big, BLOCK_KEY)
          .select(*BLOCK_KEY, "conv_id", "rep",
                  F.pmod(F.xxhash64("conv_id"),
                         F.lit(sub_salt)).alias("_salt")))
    star = (bm.where(F.col("conv_id") != F.col("rep"))
            .select(F.col("conv_id").alias("src"), F.col("rep").alias("dst")))
    sub_reps = (bm.groupBy(*BLOCK_KEY, "_salt")
                .agg(F.min("conv_id").alias("srep")))
    sub_star = (bm.join(sub_reps, [*BLOCK_KEY, "_salt"])
                .where(F.col("conv_id") != F.col("srep"))
                .select(F.col("conv_id").alias("src"),
                        F.col("srep").alias("dst")))
    out = pairs.union(star).union(sub_star)
    if chain:
        # salt-local consecutive-member chain (lsh.chain_edges, rep
        # excluded): closes the giant-block salt-straddle recall hole
        # under Hamming verification without any whole-block window task
        out = out.union(chain_edges(
            bm.where(F.col("conv_id") != F.col("rep"))
              .select(*BLOCK_KEY, "conv_id"),
            BLOCK_KEY))
    return out.distinct()


def simhash_verified_edges(edges: DataFrame, sigs: DataFrame,
                           hamming_threshold: int = 3) -> DataFrame:
    """Keep edges whose endpoints' signatures differ in <= threshold bits.
    bit_count(xor) runs in whole-stage codegen."""
    s = sigs.select("conv_id", "simhash")
    return (edges
            .join(s.select(F.col("conv_id").alias("src"),
                           F.col("simhash").alias("sig_src")), "src")
            .join(s.select(F.col("conv_id").alias("dst"),
                           F.col("simhash").alias("sig_dst")), "dst")
            .where(F.bit_count(F.col("sig_src").bitwiseXOR(F.col("sig_dst")))
                   <= F.lit(hamming_threshold))
            .select("src", "dst"))


def simhash_cc(shingles: DataFrame, hamming_threshold: int = 3,
               num_blocks: int = 4, pair_cap: int = 32) -> DataFrame:
    """Full SimHash path: (conv_id, shingles) -> (conv_id, cc_id).

    sigs feed three consumers (block grouping, block join-back, edge
    verification) — persisted here, released once CC has materialized
    (connected_components localCheckpoints its input eagerly)."""
    sigs = simhash_signatures(shingles).persist()
    try:
        edges = simhash_candidate_edges(sigs, num_blocks, pair_cap)
        verified = simhash_verified_edges(edges, sigs, hamming_threshold)
        # candidate edges are emitted src > dst (pairs, star, sub-star,
        # chain all orient) and verification only filters
        return connected_components(verified, oriented=True,
                                    distinct_input=True)
    finally:
        sigs.unpersist()
