"""Similarity search over embedding columns (task brief: ANN over
array<float> — brute-force cosine top-k baseline + an LSH-bucketed
scale path).

Everything is JVM-side (zip_with/aggregate dot products) — no Python in
the scoring loop. At 100 TB scale:
  - brute-force: broadcast the (small) query set, scan candidates once,
    per-partition top-k via window; O(|Q| * N) dot products but a single
    pass, no shuffle of the big side until the final top-k agg.
  - sign-LSH: bucket vectors by the sign pattern of `n_bits` leading
    components (a fixed public hyperplane family: the axis planes);
    candidates are same-bucket only — a coarse IVF-style route that cuts
    the scored pairs by ~2^n_bits at some recall cost (measured in
    tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minhash_rs_spark.functions.udfs import cosine_expr


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cos_sim", 6).alias("cos_sim_r")))


def brute_force_topk(embeddings: DataFrame, k: int = 5,
                     query_mod: int = 50,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: queries = rows with id % query_mod == 0,
    candidates = all other rows. Output (query_id, neighbor_id, rank,
    cos_sim_r)."""
    q = (embeddings.where(F.pmod(F.col(id_col), F.lit(query_mod)) == 0)
         .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"))
    scored = (q.crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine_expr(F.col("qv"), F.col("cv")).alias("cos_sim")))
    return _ranked_topk(scored, k)


def _sign_bucket(vec, n_bits: int):
    """Bucket key: sign bits of the first n_bits components, as an int."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b * 2 + F.when(F.element_at(vec, i + 1) >= 0, 1).otherwise(0)
    return b


def lsh_topk(embeddings: DataFrame, k: int = 5, query_mod: int = 50,
             n_bits: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only same-sign-bucket pairs."""
    with_bucket = embeddings.select(
        F.col(id_col), F.col(vec_col),
        _sign_bucket(F.col(vec_col), n_bits).alias("bucket"))
    q = (with_bucket.where(F.pmod(F.col(id_col), F.lit(query_mod)) == 0)
         .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                 "bucket"))
    c = with_bucket.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("cv"), "bucket")
    scored = (q.join(c, "bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      cosine_expr(F.col("qv"), F.col("cv")).alias("cos_sim")))
    return _ranked_topk(scored, k)


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.45,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task brief): all (a < b)
    pairs with cosine >= threshold. Brute-force O(n^2) scoring — the
    exact baseline; route through lsh_topk buckets for the approximate
    scale path. Output ids only (vec_a, vec_b): float scores stay
    engine-internal so downstream equality checks never compare floats.
    """
    a = embeddings.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (a.crossJoin(b)
            .where(F.col("vec_a") < F.col("vec_b"))
            .where(cosine_expr(F.col("va"), F.col("vb")) >= F.lit(threshold))
            .select("vec_a", "vec_b"))
