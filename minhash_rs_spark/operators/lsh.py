"""G2/J1 — LSH bucketing and star-edge extraction.

The reference buckets signature records per (band, sig) into a DashMap
and chains consecutive members as edges (src/main.rs:814-887,
1024-1042). Spark version:

  sigs(conv_id, band_id, sig_hi, sig_lo)
    -> groupBy(band_id, sig_hi, sig_lo): rep = min(conv_id), cnt
       [partial/map-side aggregation collapses hot buckets before the
        shuffle — min/count are algebraic, so a mega-bucket costs one
        record per input partition, not a shuffled mega-group]
    -> keep cnt > 1 (P4 group-size predicate, src/main.rs:847-851)
    -> join back to sigs on the bucket key to emit STAR edges
       (member, rep): linear in bucket size, same clique-connectivity
       as the reference's chained pairs (src/main.rs:1031-1039) but
       rooted at the bucket minimum -> deterministic.
       The join is where a hot bucket skews; AQE skew-join splitting
       handles it (spark.sql.adaptive.skewJoin, enabled in session.py).
    -> distinct() across bands (the reference re-unites the same pair
       once per band — harmless in its UF, wasteful for our verification
       stage; SURVEY §4 "dedup of candidate pairs").

At 100 TB scale: the bucket key is 128-bit (sig_hi, sig_lo) + band_id —
buckets never falsely merge; star edges bound output at O(N * num_bands)
rows regardless of bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_KEY = ["band_id", "sig_hi", "sig_lo"]


def lsh_buckets(sigs: DataFrame, salt_buckets: int = 0) -> DataFrame:
    """Bucket stats: (band_id, sig_hi, sig_lo, rep, cnt) for cnt > 1.

    salt_buckets > 0 adds an explicit two-phase salted aggregation
    (north rule): phase 1 groups on (bucket key, salt=xxhash(conv_id)%S)
    so a degenerate mega-bucket (e.g. all-empty docs) is reduced by S
    parallel tasks before the final combine. With plain min/count Spark's
    map-side partial aggregation already bounds the skew, so salting is
    belt-and-braces — it matters when this operator is extended with
    non-algebraic aggregates.
    """
    if salt_buckets and salt_buckets > 1:
        phase1 = (
            sigs.withColumn("_salt", F.pmod(F.xxhash64("conv_id"),
                                            F.lit(salt_buckets)))
            .groupBy(*BUCKET_KEY, "_salt")
            .agg(F.min("conv_id").alias("rep_p"), F.count(F.lit(1)).alias("cnt_p"))
        )
        return (phase1.groupBy(*BUCKET_KEY)
                .agg(F.min("rep_p").alias("rep"), F.sum("cnt_p").alias("cnt"))
                .where(F.col("cnt") > 1))
    return (
        sigs.groupBy(*BUCKET_KEY)
        .agg(F.min("conv_id").alias("rep"), F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def star_edges(sigs: DataFrame, buckets: DataFrame | None = None,
               salt_buckets: int = 0) -> DataFrame:
    """Candidate-duplicate edges (src, dst=bucket-min), distinct.

    src > dst by construction (rep is the bucket min), so edges are
    already in canonical (larger, smaller) orientation for CC.
    """
    if buckets is None:
        buckets = lsh_buckets(sigs, salt_buckets)
    return (
        sigs.join(buckets.select(*BUCKET_KEY, "rep"), BUCKET_KEY)
        .where(F.col("conv_id") != F.col("rep"))
        .select(F.col("conv_id").alias("src"), F.col("rep").alias("dst"))
        .distinct()
    )
