"""minhash_rs_spark — a from-scratch, PySpark-native near-duplicate
detection and clustering engine with the capabilities of
revbucket/minhash-rs (reference read-only at /root/reference).

This is NOT a port: the reference is a disk-oriented single/multi-node
Rust dataflow program (MinHash -> LSH banding -> union-find -> prune/
annotate over JSONL corpora). This package re-expresses every operator
of that pipeline (SURVEY.md §2) as idiomatic PySpark DataFrame
transformations plus numpy-vectorized Arrow/pandas UDFs, over a columnar
table of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Top-level entry points:
    - pipeline.MinHashPipeline / run_minhash          (ref: src/main.rs min-hash)
    - operators.exact_dedup.exact_dedup               (ref: src/exact_dedup.rs)
    - operators.subsample.dup_aware_subsample         (ref: src/dup_aware_subsample.rs)
    - operators.simhash / operators.substring         (north-rule additions)
"""

from minhash_rs_spark.config import MinHashConfig

__all__ = ["MinHashConfig"]
__version__ = "0.1.0"
