"""Quantify the verified-path cost (VERDICT r2 #8): time the flagship
pipeline in reference-parity mode (star edges, no verification) vs the
verified mode (pair_edges + exact-Jaccard) across pair_cap settings,
on the pre-generated scaling corpus. Justifies the shipped defaults
with data; writes a table to BENCH/PAIRCAP.md.

Usage: python tools/paircap_bench.py [corpus_parquet] [cpus]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from minhash_rs_spark.config import MinHashConfig  # noqa: E402
from minhash_rs_spark.pipeline import run_minhash  # noqa: E402
from minhash_rs_spark.session import get_spark  # noqa: E402


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/scaling_corpus/turns_550000"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark("paircap-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    turns = spark.read.parquet(corpus)
    n = turns.count()
    turns.limit(100).mapInPandas(lambda it: it, turns.schema).count()

    configs = [
        ("star (unverified, reference parity)", MinHashConfig()),
        ("verified pair_cap=8", MinHashConfig(jaccard_threshold=0.8,
                                              verify_pair_cap=8)),
        ("verified pair_cap=32 (default)",
         MinHashConfig(jaccard_threshold=0.8, verify_pair_cap=32)),
        ("verified pair_cap=64", MinHashConfig(jaccard_threshold=0.8,
                                               verify_pair_cap=64)),
    ]
    rows = []
    for label, cfg in configs:
        # warm-up pass then timed pass (host fault-path pathology)
        run_minhash(spark, turns, cfg).assignments.count()
        t0 = time.time()
        res = run_minhash(spark, turns, cfg)
        n_out = res.assignments.count()
        dt = round(time.time() - t0, 2)
        rows.append((label, dt, n_out))
        print(f"# {label}: {dt}s ({n_out} convs)", file=sys.stderr)
        spark.catalog.clearCache()

    base = rows[0][1]
    md_rows = "\n".join(
        f"| {label} | {dt} | {dt / base:.2f}x | {n_out} |"
        for label, dt, n_out in rows)
    md = f"""# BENCH/PAIRCAP — verified-path cost vs pair_cap

Flagship pipeline over {n} turns, local[{cpus}], warm-up + 1 timed run
per config (same session). "star" is the reference-parity unverified
path; "verified" adds pair_edges candidate generation (all pairs in
buckets <= pair_cap, star+sub-star+chain above) and exact-Jaccard
verification of every candidate edge.

| config | sec | vs star | convs |
|---|---|---|---|
{md_rows}
"""
    (ROOT / "BENCH").mkdir(exist_ok=True)
    (ROOT / "BENCH" / "PAIRCAP.md").write_text(md)
    print(json.dumps({"turns": n, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
