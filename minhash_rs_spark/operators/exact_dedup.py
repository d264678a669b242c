"""Exact-dedup entry point (ref: /root/reference/src/exact_dedup.rs).

The reference SipHashes each line's text_field into a DashMap and keeps
the first member of each hash bucket (exact_dedup.rs:105-115, 178-188).
Spark version is one shuffle: group documents by their exact text
(cc_id = min(conv_id) over identical texts), survivor = rank-0 by
conv_id (deterministic; the reference's survivor is insertion-order
arbitrary). Grouping directly on the text value rather than a 64-bit
hash removes even the theoretical hash-collision false-merge.

Returns the same assignment shape as the minhash path, so annotate/prune
sinks are shared (annotate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minhash_rs_spark.operators.annotate import cluster_assignments


def exact_cc(docs: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """(conv_id, cc_id) with cc_id = min(conv_id) among identical texts.

    Implemented as groupBy(text).min + join-back rather than a window so
    map-side partial aggregation absorbs skew from mega-groups (e.g.
    empty documents) — same shape as lsh.star_edges.
    """
    reps = (docs.groupBy(text_col)
            .agg(F.min("conv_id").alias("cc_id"), F.count(F.lit(1)).alias("cnt")))
    return (docs.join(reps.select(text_col, "cc_id", "cnt"), text_col)
            .select("conv_id", "cc_id"))


def exact_dedup_assignments(docs: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """(conv_id, cc_id, cc_size, cc_idx) under exact-text identity
    (output analog of the `exact_dedup` struct, exact_dedup.rs:204-210)."""
    return cluster_assignments(docs.select("conv_id"),
                               exact_cc(docs, text_col))
