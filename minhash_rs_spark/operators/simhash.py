"""SimHash near-dup path (north-rule addition; no reference counterpart).

sig = 64-bit per-bit majority vote over the doc's (uniformly mixed)
shingle hashes (functions/udfs.simhash_udf). Near-duplicates = pairs with
Hamming distance <= hamming_threshold.

Candidate generation is pigeonhole block-LSH: split the 64-bit signature
into `num_blocks` contiguous blocks; any pair within Hamming distance
num_blocks-1 shares at least one exact block, so grouping by
(block_id, block_value) and emitting star edges finds all of them.
Verification is JVM-side: bit_count(sig_a ^ sig_b) — no Python.

Same output contract as the minhash path: edges -> connected components
-> cluster_assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minhash_rs_spark.functions.udfs import simhash_udf
from minhash_rs_spark.operators.connected_components import connected_components


def simhash_signatures(shingles: DataFrame) -> DataFrame:
    """(conv_id, shingles) -> (conv_id, simhash: long)."""
    return shingles.select("conv_id", simhash_udf(F.col("shingles")).alias("simhash"))


def simhash_candidate_edges(sigs: DataFrame, num_blocks: int = 4) -> DataFrame:
    """Star edges over pigeonhole blocks. Guarantees recall 1.0 for pairs
    at Hamming distance <= num_blocks - 1."""
    assert 64 % num_blocks == 0
    width = 64 // num_blocks
    mask = (1 << width) - 1
    blocks = None
    for b in range(num_blocks):
        part = sigs.select(
            "conv_id", "simhash",
            F.lit(b).alias("block_id"),
            (F.shiftrightunsigned(F.col("simhash"), b * width)
             .bitwiseAND(F.lit(mask))).alias("block_val"))
        blocks = part if blocks is None else blocks.union(part)
    reps = (blocks.groupBy("block_id", "block_val")
            .agg(F.min("conv_id").alias("rep"), F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1))
    return (blocks.join(reps, ["block_id", "block_val"])
            .where(F.col("conv_id") != F.col("rep"))
            .select(F.col("conv_id").alias("src"), F.col("rep").alias("dst"))
            .distinct())


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
               num_blocks: int = 4) -> DataFrame:
    """Full SimHash path: (conv_id, shingles) -> (conv_id, cc_id)."""
    sigs = simhash_signatures(shingles)
    edges = simhash_candidate_edges(sigs, num_blocks)
    verified = simhash_verified_edges(edges, sigs, hamming_threshold)
    return connected_components(verified)
