"""Relational n-gram/word-set Jaccard near-dup detection (task brief:
"n-gram Jaccard" dedup) — a pure DataFrame alternative to the MinHash
kernel for moderate scales, and the fully-SQL-checkable member of the
dedup family.

Candidate blocking uses prefix-filtering on RARE tokens: only documents
sharing at least one token with document-frequency <= max_df become a
candidate pair (a standard set-similarity join trick — common tokens
like stopwords would otherwise produce O(n^2) pairs per block). The
exact word-set Jaccard of each candidate pair is then computed from the
full token arrays (array_intersect). High-similarity docs share many
tokens including rare ones, so recall at high thresholds is near-total;
docs made ONLY of ultra-common tokens are the documented miss case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_sets(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    words = F.array_distinct(
        F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                 lambda t: t != ""))
    return docs.select(F.col(id_col).alias("doc"), words.alias("words"))


def word_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                       max_df: int = 20, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, n_common, jaccard_e6) for candidate pairs with
    word-set Jaccard >= threshold. jaccard_e6 is exact-integer
    micro-units (portable across engines)."""
    ws = _word_sets(docs, id_col, text_col)
    exploded = ws.select("doc", F.explode("words").alias("word"))
    rare = (exploded.groupBy("word")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df").between(2, max_df))
            .select("word"))
    rare_posts = exploded.join(rare, "word")
    cand = (rare_posts.alias("a").join(rare_posts.alias("b"), "word")
            .where(F.col("a.doc") < F.col("b.doc"))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct())
    a = ws.select(F.col("doc").alias("doc_a"), F.col("words").alias("wa"))
    b = ws.select(F.col("doc").alias("doc_b"), F.col("words").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb")).cast("long")
    union = (F.size("wa") + F.size("wb")).cast("long") - inter
    jac_e6 = F.expr("(_inter*1000000) div greatest(_union,1)")
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .withColumn("_inter", inter).withColumn("_union", union)
            .withColumn("jaccard_e6", jac_e6)
            .where(F.col("jaccard_e6") >= int(threshold * 1_000_000))
            .select("doc_a", "doc_b",
                    F.col("_inter").alias("n_common"), "jaccard_e6"))
