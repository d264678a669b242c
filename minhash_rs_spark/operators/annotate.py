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


def cluster_assignments(docs: DataFrame, cc: DataFrame,
                        with_idx: bool = True) -> DataFrame:
    """Full per-conversation cluster table (conv_id, cc_id, cc_size[, cc_idx]).

    docs: one row per conv_id. cc: (conv_id, cc_id) for non-singletons.
    Singletons get cc_id = own conv_id (C3, ref src/main.rs:1089-1099).

    cc_size is algebraic (groupBy + join), never a window: a window
    over partitionBy(cc_id) lands a degenerate mega-component (e.g.
    every empty doc clustering together) in a single task, while the
    groupBy's map-side partial aggregation absorbs it. cc_idx (a
    per-member ordinal, ref annotation quad src/main.rs:1256-1319)
    inherently requires an in-component sort, so it stays a window —
    pass with_idx=False on paths that only need sizes or survivor
    election (prune/dedup mode, histograms); survivors() below is
    idx-free by construction.
    """
    labeled = (docs.select("conv_id")
               .join(cc, "conv_id", "left")
               .select("conv_id", F.coalesce("cc_id", "conv_id").alias("cc_id")))
    sizes = labeled.groupBy("cc_id").agg(F.count(F.lit(1)).alias("cc_size"))
    out = labeled.join(sizes, "cc_id").select("conv_id", "cc_id", "cc_size")
    if with_idx:
        wo = Window.partitionBy("cc_id").orderBy("conv_id")
        out = out.withColumn("cc_idx", F.row_number().over(wo) - F.lit(1))
    return out


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
    """conv_ids that survive dedup: exactly one per component — the
    min-conv_id member, identical to cc_idx==0 (the window orders by
    conv_id) but algebraic: a groupBy min survives a mega-component
    where a partitionBy(cc_id) window would serialize into one task,
    and it works on with_idx=False assignment tables."""
    return assignments.groupBy("cc_id").agg(
        F.min("conv_id").alias("conv_id")).select("conv_id")


def prune_turns(turns: DataFrame, assignments: DataFrame,
                conv_col: str = "conv_id") -> DataFrame:
    """Dedup mode: keep only turns of surviving conversations.

    left_semi on the survivor set == the reference's kill-list anti-join
    (J2, src/main.rs:1370-1427); the whole conversation lives or dies
    together (J7 transitive group kill, src/main.rs:1395-1421).
    """
    surv = survivors(assignments).withColumnRenamed("conv_id", conv_col)
    return turns.join(surv, conv_col, "left_semi")
