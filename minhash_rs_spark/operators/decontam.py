"""Benchmark decontamination: flag corpus documents that share any
word-level k-gram with a benchmark/eval set (the standard guard against
train/test contamination in LLM data pipelines; same exact-overlap
family as the reference's exact line dedup, /root/reference/src/main.rs
exact-dedup path, generalized from whole-line to k-gram granularity).

Scale design (the part that matters at 100 TB):
- Shingles travel as 64-bit `xxhash64` keys, never strings — the
  shuffle/broadcast payload is 8 bytes per shingle regardless of text
  width. Whitespace words cannot contain the ' ' joiner, so the
  space-joined shingle string is injective and the only error source is
  a 64-bit hash collision (~n^2/2^64 false-positive odds, documented).
- The benchmark side is DISTINCT-reduced then (optionally, default on)
  broadcast: eval sets are millions of shingles at most while the
  corpus is the 100 TB side, so the hit-join is map-side with zero
  corpus shuffle. With `broadcast_bench=False` it degrades to a plain
  shuffled semi-join for the rare huge-benchmark case.
- Per-doc totals come from the pre-explode array (`size`), so the
  explode feeds ONLY the hit-join, and the final assembly is a
  doc_id-keyed left join of an aggregate that is at most one row per
  contaminated doc.

Everything is JVM-side `pyspark.sql.functions` — no Python in the path
— and deliberately mirror-expressible in ANSI SQL (DuckDB oracle uses
the raw string shingles; __spark_entry__.q_decontam_ngram).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _word_kgrams(text: Column, k: int) -> Column:
    """Distinct space-joined word k-grams of `text` (lowercased,
    whitespace-split); empty array when the doc has < k words."""
    words = F.filter(F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
                     lambda t: t != "")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(words, i, k), " "))
    return F.array_distinct(F.when(n >= k, grams)
                            .otherwise(F.array().cast("array<string>")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame, k: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text",
                  broadcast_bench: bool = True) -> DataFrame:
    """Per corpus document: (id, n_shingles, n_hits, contam_frac_e6,
    contaminated) where n_shingles counts the doc's DISTINCT word
    k-grams, n_hits counts those also present anywhere in `benchmark`,
    contam_frac_e6 = n_hits*1e6 div n_shingles (0 for docs shorter than
    k words), contaminated = n_hits > 0.

    k=8 follows common decontamination practice (PaLM-style 8-gram
    overlap); pass k=13 for GPT-3-style filtering. Output is one row
    per corpus document, so a pipeline kills or down-weights with a
    simple filter/join on `contaminated`.
    """
    sh = _word_kgrams(F.col(text_col), k)
    per_doc = corpus.select(F.col(id_col), sh.alias("_sh"),
                            F.size(sh).cast("long").alias("n_shingles"))
    corpus_sh = per_doc.select(id_col, F.explode("_sh").alias("_g")) \
                       .select(id_col, F.xxhash64("_g").alias("_h"))
    bench_sh = (benchmark
                .select(F.explode(_word_kgrams(F.col(bench_text_col), k))
                        .alias("_g"))
                .select(F.xxhash64("_g").alias("_h")).distinct())
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    hits = (corpus_sh.join(bench_sh, "_h", "left_semi")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("_hits")))
    n_hits = F.coalesce(F.col("_hits"), F.lit(0)).cast("long")
    return (per_doc.drop("_sh").join(hits, id_col, "left")
            .select(F.col(id_col), F.col("n_shingles"),
                    n_hits.alias("n_hits"),
                    F.when(F.col("n_shingles") > 0,
                           F.expr("coalesce(_hits,0)*1000000 div n_shingles"))
                     .otherwise(F.lit(0)).cast("long")
                     .alias("contam_frac_e6"),
                    (n_hits > 0).alias("contaminated")))
