"""Reference-format JSONL corpus reader (S1-S3 compatibility path).

The reference's native input is a directory of `.jsonl(.gz/.zst)` files,
one JSON object per line, text under a (possibly dotted) `content_key`,
with optional `concat_key` fields marking consecutive-line document
groups (/root/reference/src/main.rs:386-404, 489-521). This module maps
that surface onto the engine's transcripts model:

  - file identity / path_id      -> input_file_name() (bookkeeping only)
  - line order within a file     -> monotonically_increasing_id per file
                                    (Spark reads json files in order
                                    within a partition; one jsonl file
                                    <= one partition split for typical
                                    corpus file sizes)
  - dotted content_key           -> F.get_json_object($raw, '$.a.b')
  - concat_key run-grouping      -> run detection over a window
                                    (consecutive lines, same key tuple
                                    -> one doc, ref src/main.rs:506-516)

Compressed variants: .gz is handled natively by Spark's text reader
(roundtrip-tested in tests/test_sources.py). .zst requires Hadoop's
native ZStandardCodec, which this container lacks (no native-hadoop
libs) — the gate is asserted in the same test; on a real cluster with
libhadoop the reader works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_jsonl_corpus(spark: SparkSession, path: str,
                      content_key: str = "text",
                      concat_key: list[str] | None = None) -> DataFrame:
    """Read a reference-style corpus into the engine's transcript shape:
    (conv_id, turn_idx, text) — one conversation per concat_key run (or
    per line when concat_key is None, matching ref cur_line semantics).
    """
    # _line encodes (partition_id << 33) + row offset. Ordering by it
    # WITHIN a file is offset-true even for splittable files: Spark
    # generates a file's splits in offset order (all max-size except
    # the tail) and packs them with a stable size sort, so a file's
    # splits keep ascending partition ids relative to each other; .gz
    # inputs are single-split by construction. The window below
    # partitions by _file, so cross-file partition interleaving is
    # irrelevant.
    raw = (spark.read.text(path)
           .withColumn("_file", F.input_file_name())
           .withColumn("_line", F.monotonically_increasing_id()))

    def extract(key: str):
        return F.get_json_object(F.col("value"), "$." + key)

    df = raw.withColumn("text", extract(content_key))
    if not concat_key:
        # every line is its own single-turn document
        return df.select(
            F.concat_ws(":", F.col("_file"), F.col("_line")).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            "text")
    for i, k in enumerate(concat_key):
        df = df.withColumn(f"_ck{i}", extract(k))
    ck_cols = [F.col(f"_ck{i}") for i in range(len(concat_key))]
    w = Window.partitionBy("_file").orderBy("_line")
    # run detection: a new group starts whenever the concat tuple differs
    # from the previous line's (ref src/main.rs:506-516 — runs, NOT
    # global grouping: two separated runs with equal keys stay distinct)
    changed = (
        F.coalesce(
            F.concat_ws("\x1f", *ck_cols) !=
            F.lag(F.concat_ws("\x1f", *ck_cols)).over(w),
            F.lit(True))
        .cast("int"))
    grouped = (df.withColumn("_new_run", changed)
               .withColumn("_run", F.sum("_new_run").over(w)))
    return grouped.select(
        F.concat_ws(":", F.col("_file"), F.col("_run")).alias("conv_id"),
        F.row_number().over(
            Window.partitionBy("_file", "_run").orderBy("_line")).alias("turn_idx"),
        "text")
