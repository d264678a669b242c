"""G7/G8/J2/J3 — cluster stats, survivor election, annotate & prune sinks.

Reference behaviors re-expressed:
  - annotation quads (line, cc_size, cc_id, cc_idx) -> columns joined
    onto the turns table as a `minhash` struct
    (ref: src/main.rs:1256-1319, splice :1536-1540)
  - kill-list election: keep exactly one doc per component; the reference
    keeps an arbitrary DashMap-order member (src/main.rs:1175-1191); we
    keep the rank-0 member by conv_id — deterministic, documented
    divergence (SURVEY §7.4)
  - prune: left_anti join instead of kill files (src/main.rs:1390-1436)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_assignments(docs: DataFrame, cc: DataFrame) -> DataFrame:
    """Full per-conversation cluster table (conv_id, cc_id, cc_size, cc_idx).

    docs: one row per conv_id. cc: (conv_id, cc_id) for non-singletons.
    Singletons get cc_id = own conv_id (C3, ref src/main.rs:1089-1099).
    cc_size / cc_idx via one window over cc_id (G5/G8).
    """
    labeled = (docs.select("conv_id")
               .join(cc, "conv_id", "left")
               .select("conv_id", F.coalesce("cc_id", "conv_id").alias("cc_id")))
    w = Window.partitionBy("cc_id")
    wo = w.orderBy("conv_id")
    return labeled.select(
        "conv_id", "cc_id",
        F.count(F.lit(1)).over(w).alias("cc_size"),
        (F.row_number().over(wo) - F.lit(1)).alias("cc_idx"),
    )


def annotate_turns(turns: DataFrame, assignments: DataFrame,
                   conv_col: str = "conv_id",
                   struct_col: str = "minhash") -> DataFrame:
    """Annotate mode: every input row preserved, plus a
    `minhash: struct<cc_id, cc_size, cc_idx>` column
    (output shape: FIXTURES.md F4; ref splice src/main.rs:1536-1540)."""
    anno = assignments.select(
        F.col("conv_id").alias(conv_col),
        F.struct("cc_id", "cc_size", "cc_idx").alias(struct_col))
    return turns.join(anno, conv_col, "left")


def survivors(assignments: DataFrame) -> DataFrame:
    """conv_ids that survive dedup: exactly one per component (cc_idx 0)."""
    return assignments.where(F.col("cc_idx") == 0).select("conv_id")


def prune_turns(turns: DataFrame, assignments: DataFrame,
                conv_col: str = "conv_id") -> DataFrame:
    """Dedup mode: keep only turns of surviving conversations.

    left_semi on the survivor set == the reference's kill-list anti-join
    (J2, src/main.rs:1370-1427); the whole conversation lives or dies
    together (J7 transitive group kill, src/main.rs:1395-1421).
    """
    surv = survivors(assignments).withColumnRenamed("conv_id", conv_col)
    return turns.join(surv, conv_col, "left_semi")
