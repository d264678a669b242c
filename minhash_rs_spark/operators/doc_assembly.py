"""G1 — document assembly: turns -> per-conversation documents.

The reference merges *consecutive JSONL lines* sharing a concat_key tuple
with "\n".join (/root/reference/src/main.rs:499-521). Our input is a
columnar transcripts table (conv_id, turn_idx, role, text, tool, ts);
the same semantic is: group by conv_id, order by turn_idx (STABLE turn
ordering — the BASELINE per-row invariant), join texts with "\n".

Implementation is pure DataFrame (one shuffle, map-side partial
collect_list is not possible but the groupBy is key-balanced on conv_id):
collect_list(struct(turn_idx, text)) -> array_sort (sorts by struct
fields in order => by turn_idx) -> transform to texts -> array_join.
Catalyst prunes the scan to exactly (conv_id, turn_idx, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_documents(turns: DataFrame,
                       conv_col: str = "conv_id",
                       order_col: str = "turn_idx",
                       text_col: str = "text") -> DataFrame:
    """Returns (conv_id, doc_text, n_turns) — one row per conversation."""
    pair = F.struct(F.col(order_col).alias("o"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("t"))
    return (
        turns
        .select(F.col(conv_col).alias("conv_id"), pair.alias("p"))
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("p")), lambda x: x["t"]),
                "\n",
            ).alias("doc_text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
