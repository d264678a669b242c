"""CLI mirroring the reference's subcommand surface
(/root/reference/src/main.rs:1717-1772) for spark-submit use:

  spark-submit --py-files minhash_rs_spark.zip -m ... OR
  python -m minhash_rs_spark <command> --config config.yaml \
      --input <table/parquet> --output <dir> [--master local[32]]

Commands (reference analog):
  min-hash             full fuzzy-dedup pipeline (src/main.rs:1684-1701)
  exact-dedup          exact-text dedup          (src/exact_dedup.rs)
  dup-aware-subsample  component-level sampling  (src/dup_aware_subsample.rs)
  true-jacc            intra-cluster exact Jaccard (src/main.rs:1573-1677)
  incremental          dedup a NEW batch against prior runs' committed
                       checkpoints (no reference analog — append-only
                       production shape; operators/incremental.py)
  decontam             flag docs sharing word k-grams with a benchmark
                       set (operators/decontam.py)
  compact              union a chain of incremental checkpoints into
                       ONE committed history table (operators/
                       incremental.compact_history) so day-N's old
                       side reads a single table

The YAML config keys are the reference's (num_bands, band_size,
ngram_size, tokenizer_str, hash_seed, content_key, annotate_only,
exact_override, ...) — see config.MinHashConfig.from_reference_dict.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_config(path: str | None):
    from minhash_rs_spark.config import MinHashConfig

    if not path:
        return MinHashConfig()
    try:
        return MinHashConfig.from_yaml(path)
    except ImportError:
        with open(path) as f:
            raw = json.load(f)
        return MinHashConfig.from_reference_dict(raw)


def main(argv=None):
    p = argparse.ArgumentParser(prog="minhash_rs_spark")
    p.add_argument("command", choices=[
        "min-hash", "exact-dedup", "dup-aware-subsample", "true-jacc",
        # granular phase commands (reference: build-file-map/hash-only/
        # gather-edges/build-uf/uf-size-prune/annotate,
        # src/main.rs:1725-1756) — each materializes the pipeline up to
        # its checkpoint stage; later invocations resume from there
        "build-file-map", "hash-only", "gather-edges", "build-uf",
        "uf-size-prune", "annotate", "incremental", "decontam",
        "compact"])
    p.add_argument("--config", help="reference-style YAML (or JSON) config")
    p.add_argument("--input", required=True,
                   help="parquet path of the transcripts table")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--master", default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--annotations", default=None,
                   help="dup-aware-subsample only: parquet of a PRIOR "
                        "run's annotated output (turns with the "
                        "minhash struct) or assignments table — skips "
                        "recomputing the pipeline, exactly like the "
                        "reference running over annotated files "
                        "(src/dup_aware_subsample.rs:70-113)")
    p.add_argument("--subsample-rate", type=float, default=None)
    p.add_argument("--max-cc-size", type=int, default=None)
    p.add_argument("--jaccard-threshold", type=float, default=None)
    p.add_argument("--out-token", default=None,
                   help="compact only: token to commit the unioned "
                        "history under")
    p.add_argument("--base-token", action="append", default=None,
                   help="incremental/compact (repeatable): input_token of "
                        "a prior run whose committed sigs/shingles form "
                        "history")
    p.add_argument("--batch-token", default=None,
                   help="incremental only: checkpoint token for THIS "
                        "batch (default: --input path)")
    p.add_argument("--benchmark", default=None,
                   help="decontam only: parquet of the benchmark/eval "
                        "docs (text read from --bench-text-col, which "
                        "defaults to --text-col)")
    p.add_argument("--bench-text-col", default=None,
                   help="decontam only: text column of the --benchmark "
                        "parquet when it differs from the corpus's "
                        "--text-col")
    p.add_argument("--k", type=int, default=8,
                   help="decontam only: word k-gram size")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    args = p.parse_args(argv)

    from dataclasses import replace

    from minhash_rs_spark.session import get_spark

    cfg = _load_config(args.config)
    overrides = {}
    if args.checkpoint_dir:
        overrides["checkpoint_dir"] = args.checkpoint_dir
    if args.subsample_rate is not None:
        overrides["subsample_rate"] = args.subsample_rate
    if args.max_cc_size is not None:
        overrides["max_cc_size"] = args.max_cc_size
    if args.jaccard_threshold is not None:
        overrides["jaccard_threshold"] = args.jaccard_threshold
    if overrides:
        cfg = replace(cfg, **overrides)

    spark = get_spark(f"minhash-rs-spark:{args.command}", master=args.master)
    # compact operates purely on committed checkpoints; --input is unused
    turns = (spark.read.parquet(args.input)
             if args.command != "compact" else None)

    from minhash_rs_spark.pipeline import run_exact_dedup, run_minhash

    if args.command == "min-hash":
        res = run_minhash(spark, turns, cfg, input_token=args.input)
        res.output.write.mode("overwrite").parquet(args.output)
        print(json.dumps(res.collect_stats()))
    elif args.command == "exact-dedup":
        res = run_exact_dedup(spark, turns, cfg, input_token=args.input)
        res.output.write.mode("overwrite").parquet(args.output)
        print(json.dumps(res.collect_stats()))
    elif args.command == "dup-aware-subsample":
        from minhash_rs_spark.operators.subsample import dup_aware_subsample

        if args.annotations:
            # standalone over a prior run's annotations (reference
            # behavior: src/dup_aware_subsample.rs:70-113) — no pipeline
            # recompute. Accepts either the annotated turns table (with
            # the minhash struct) or a bare assignments table.
            prior = spark.read.parquet(args.annotations)
            from pyspark.sql import functions as F
            if "minhash" in prior.columns:
                assignments = (prior.select(
                    F.col(cfg.conv_col).alias("conv_id"),
                    F.col("minhash.cc_id").alias("cc_id"),
                    F.col("minhash.cc_size").alias("cc_size"),
                    F.col("minhash.cc_idx").alias("cc_idx"))
                    .dropDuplicates(["conv_id"]))
            else:
                assignments = prior.select("conv_id", "cc_id",
                                           "cc_size", "cc_idx")
        else:
            assignments = run_minhash(spark, turns, cfg,
                                      input_token=args.input).assignments
        kept = dup_aware_subsample(assignments, cfg.subsample_rate,
                                   cfg.max_cc_size, cfg.subsample_seed)
        surviving = kept.select("conv_id")
        out = turns.join(surviving.withColumnRenamed("conv_id", cfg.conv_col),
                         cfg.conv_col, "left_semi")
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"kept_convs": surviving.count()}))
    elif args.command == "true-jacc":
        from dataclasses import replace as _r

        from minhash_rs_spark.operators.verify import intra_cluster_jaccards

        # true-jacc needs shingle sets: force the threshold path so the
        # shingles stage materializes (any tau; edges unaffected at 0.0)
        cfg_tj = cfg if cfg.jaccard_threshold is not None else _r(
            cfg, jaccard_threshold=0.0)
        res = run_minhash(spark, turns, cfg_tj, input_token=args.input)
        tj = intra_cluster_jaccards(res.assignments, res.shingles)
        tj.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"pairs": spark.read.parquet(args.output).count()}))
    elif args.command == "build-file-map":
        # obsolete by design: file identity is the conv_id column and the
        # checkpoint manifest (SURVEY §2.1 S1) — report the input snapshot
        print(json.dumps({"note": "file map subsumed by conv_id + manifest",
                          "input": args.input,
                          "rows": turns.count()}))
    elif args.command in ("hash-only", "gather-edges", "build-uf"):
        if not cfg.checkpoint_dir:
            raise SystemExit(f"{args.command} requires --checkpoint-dir "
                             "(phase outputs must persist to be resumable)")
        upto = {"hash-only": "sigs", "gather-edges": "edges",
                "build-uf": "cc"}[args.command]
        run_minhash(spark, turns, cfg, input_token=args.input, upto=upto)
        print(json.dumps({"stage": upto, "checkpoint": cfg.checkpoint_dir}))
    elif args.command == "incremental":
        from minhash_rs_spark.operators.incremental import incremental_minhash

        if not cfg.checkpoint_dir:
            raise SystemExit("incremental requires --checkpoint-dir")
        if not args.base_token:
            raise SystemExit("incremental requires >= 1 --base-token")
        res = incremental_minhash(
            spark, turns, cfg,
            batch_token=args.batch_token or args.input,
            base_token=args.base_token)
        res.output.write.mode("overwrite").parquet(args.output)
        print(json.dumps(res.collect_stats(turns, cfg.conv_col)))
    elif args.command == "compact":
        from minhash_rs_spark.operators.incremental import compact_history

        if not cfg.checkpoint_dir:
            raise SystemExit("compact requires --checkpoint-dir")
        if not args.base_token or not args.out_token:
            raise SystemExit("compact requires >= 1 --base-token and "
                             "--out-token")
        tok = compact_history(spark, cfg, args.base_token, args.out_token)
        print(json.dumps({"compacted": args.base_token, "out_token": tok,
                          "checkpoint": cfg.checkpoint_dir}))
    elif args.command == "decontam":
        from pyspark.sql import functions as F

        from minhash_rs_spark.operators.decontam import decontaminate

        if not args.benchmark:
            raise SystemExit("decontam requires --benchmark <parquet>")
        bench = spark.read.parquet(args.benchmark)
        out = decontaminate(turns, bench, k=args.k, id_col=args.id_col,
                            text_col=args.text_col,
                            bench_text_col=(args.bench_text_col
                                            or args.text_col))
        out.write.mode("overwrite").parquet(args.output)
        written = spark.read.parquet(args.output)
        print(json.dumps({
            "docs": written.count(),
            "contaminated": written.where(F.col("contaminated")).count()}))
    elif args.command in ("uf-size-prune", "annotate"):
        from dataclasses import replace as _r

        cfg2 = _r(cfg, annotate_only=(args.command == "annotate"))
        res = run_minhash(spark, turns, cfg2, input_token=args.input)
        res.output.write.mode("overwrite").parquet(args.output)
        print(json.dumps(res.collect_stats()))
    spark.stop()


if __name__ == "__main__":
    main()
