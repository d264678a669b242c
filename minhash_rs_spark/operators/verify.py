"""J6 — exact-Jaccard verification of candidate pairs.

The reference computes true Jaccard only as an offline analytics pass
over already-built components (`true-jacc`,
/root/reference/src/main.rs:1573-1677). The north rule promotes it into
the pipeline: LSH candidate edges are verified by exact Jaccard over the
documents' shingle sets BEFORE the union step, so a false-positive LSH
collision never contaminates a cluster.

Shingle sets are computed once upstream (functions/udfs.shingle_sets)
and joined to both edge endpoints; the two joins are plain shuffle
equi-joins on conv_id (AQE handles any hot doc)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from minhash_rs_spark.functions.udfs import with_jaccard


def edges_with_jaccard(edges: DataFrame, shingles: DataFrame) -> DataFrame:
    """(src, dst) + shingle sets -> (src, dst, jaccard). Scoring is a
    batch-vectorized mapInArrow over flat buffers (udfs.with_jaccard) —
    no per-row Python."""
    sh = shingles.select("conv_id", "shingles")
    joined = (
        edges
        .join(sh.select(F.col("conv_id").alias("src"),
                        F.col("shingles").alias("sh_src")), "src")
        .join(sh.select(F.col("conv_id").alias("dst"),
                        F.col("shingles").alias("sh_dst")), "dst")
        .select("src", "dst", "sh_src", "sh_dst")
    )
    return with_jaccard(joined, "sh_src", "sh_dst", "jaccard")


def verified_edges(edges: DataFrame, shingles: DataFrame,
                   threshold: float) -> DataFrame:
    """Keep only candidate edges whose exact Jaccard >= threshold."""
    return (edges_with_jaccard(edges, shingles)
            .where(F.col("jaccard") >= F.lit(threshold))
            .select("src", "dst"))


def intra_cluster_jaccards(assignments: DataFrame, shingles: DataFrame) -> DataFrame:
    """All within-component pairs with exact Jaccard — the reference's
    `true-jacc` analytics output (src/main.rs:1656-1677) as a DataFrame:
    (cc_id, conv_id_a, conv_id_b, jaccard)."""
    cand = (assignments.where(F.col("cc_size") > 1)
            .select("cc_id", "conv_id")
            .join(shingles.select("conv_id", "shingles"), "conv_id"))
    a = cand.select("cc_id", F.col("conv_id").alias("conv_id_a"),
                    F.col("shingles").alias("sh_a"))
    b = cand.select("cc_id", F.col("conv_id").alias("conv_id_b"),
                    F.col("shingles").alias("sh_b"))
    joined = (a.join(b, "cc_id")
              .where(F.col("conv_id_a") < F.col("conv_id_b"))
              .select("cc_id", "conv_id_a", "conv_id_b", "sh_a", "sh_b"))
    return with_jaccard(joined, "sh_a", "sh_b", "jaccard")
