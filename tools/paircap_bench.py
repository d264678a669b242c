"""Quantify the verified-path cost (VERDICT r3 #1): time the flagship
pipeline in reference-parity mode (star edges, no verification) vs the
verified mode (pair_edges + exact-Jaccard) across pair_cap settings.

Round-4 protocol — the same discipline that made BENCH/SCALING.md
credible (the round-3 single-run table was non-monotonic host noise:
pair_cap=32 read 3.07x star while pair_cap=64 read 1.43x):
  * each (round, config) leg is a fresh pinned SUBPROCESS (taskset
    0..cpus-1, local[cpus], glibc arena trimming disabled) — no shared
    JVM state, no unpinned stray threads;
  * per leg: 1 untimed warm-up pipeline run + 1 timed run (this VM's
    fresh-page-fault path is intermittently pathological; warm reuse is
    stable — BENCH/BASELINE.md);
  * configs are INTERLEAVED round-robin across `rounds` rounds, so host
    drift hits all configs symmetrically; per-config result = median
    across valid rounds;
  * validity gate: a round counts only if the fresh-alloc bandwidth
    stamps of all its legs agree within 2x (the SCALING.md gate);
  * CPU-time secondary per leg (process-tree CPU seconds around the
    timed run): the cost ratio in core-seconds is invariant to uniform
    host slowdowns and is the number that predicts cluster cost.

Writes BENCH/PAIRCAP.md and prints a JSON summary.

Usage: python tools/paircap_bench.py [n_convs] [cpus] [rounds]
       (internal: python tools/paircap_bench.py --leg <corpus> <cpus>
        <label> <jaccard_threshold|none> <pair_cap>)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1099511627776",
    "MALLOC_TRIM_THRESHOLD_": "-1",
}

CONFIGS = [
    ("star", None, 0),          # unverified, reference parity
    ("v_cap8", 0.8, 8),
    ("v_cap32", 0.8, 32),       # shipped default
    ("v_cap64", 0.8, 64),
]


def leg_main(corpus: str, cpus: int, label: str, thr: str, cap: int):
    from bench import host_alloc_gbs, tree_cpu_seconds
    from minhash_rs_spark.config import MinHashConfig
    from minhash_rs_spark.pipeline import run_minhash
    from minhash_rs_spark.session import get_spark

    alloc_before = host_alloc_gbs()
    cfg = MinHashConfig() if thr == "none" else MinHashConfig(
        jaccard_threshold=float(thr), verify_pair_cap=cap)
    spark = get_spark("paircap-leg", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    turns = spark.read.parquet(corpus)
    n = turns.count()
    turns.limit(100).mapInPandas(lambda it: it, turns.schema).count()
    run_minhash(spark, turns, cfg).assignments.count()   # warm-up
    spark.catalog.clearCache()
    cpu0, t0 = tree_cpu_seconds(), time.time()
    n_out = run_minhash(spark, turns, cfg).assignments.count()
    wall = round(time.time() - t0, 2)
    cpu = round(tree_cpu_seconds() - cpu0, 1)
    spark.stop()
    print(json.dumps({"label": label, "wall": wall, "cpu": cpu,
                      "turns": n, "convs": n_out,
                      "alloc_before": alloc_before,
                      "alloc_after": host_alloc_gbs()}))


def gen_corpus(n_convs: int) -> str:
    path = f"/tmp/scaling_corpus/turns_{n_convs}"
    if Path(path, "_SUCCESS").exists():
        return path
    # subprocess: spark.stop() does not kill the py4j JVM while the
    # parent lives, and a lingering local[32] JVM contaminates legs
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "from minhash_rs_spark.data.transcripts import "
        "transcripts_spark_distributed\n"
        "from minhash_rs_spark.session import get_spark\n"
        "spark = get_spark('paircap-gen', master='local[32]', "
        "shuffle_partitions=64)\n"
        "transcripts_spark_distributed(spark, n_base=%d, seed=42)"
        ".write.mode('overwrite').parquet(%r)\n"
        "spark.stop()\n" % (str(ROOT), n_convs, path))
    subprocess.run([sys.executable, "-c", code], check=True)
    return path


def run_leg(corpus: str, cpus: int, label: str, thr, cap: int) -> dict:
    cmd = [sys.executable, str(Path(__file__).resolve()), "--leg", corpus,
           str(cpus), label, "none" if thr is None else str(thr), str(cap)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ, PYTHONPATH=str(ROOT), **MALLOC_ENV)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(ROOT))
    if p.returncode != 0:
        print(p.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"leg {label} failed")
    out = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    print(f"# {label}: wall {out['wall']}s cpu {out['cpu']}s "
          f"alloc {out['alloc_before']}->{out['alloc_after']} GB/s",
          file=sys.stderr)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        leg_main(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5],
                 int(sys.argv[6]))
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    corpus = gen_corpus(n_convs)

    by_round: list[list[dict]] = []
    for r in range(rounds):
        legs = [run_leg(corpus, cpus, label, thr, cap)
                for label, thr, cap in CONFIGS]
        allocs = [min(l["alloc_before"], l["alloc_after"]) for l in legs] + \
                 [max(l["alloc_before"], l["alloc_after"]) for l in legs]
        valid = max(allocs) <= 2 * min(allocs) + 1e-9
        for leg in legs:
            leg["round"], leg["valid_round"] = r, valid
        by_round.append(legs)
        print(f"# round {r}: {'VALID' if valid else 'REJECTED'} "
              f"(alloc range {min(allocs)}-{max(allocs)} GB/s)",
              file=sys.stderr)

    def med(label: str, key: str, valid_only: bool) -> float | None:
        vals = [l[key] for legs in by_round for l in legs
                if l["label"] == label and (l["valid_round"]
                                            or not valid_only)]
        return round(statistics.median(vals), 2) if vals else None

    n_valid = sum(1 for legs in by_round if legs[0]["valid_round"])
    use_valid = n_valid > 0
    star_wall = med("star", "wall", use_valid)
    star_cpu = med("star", "cpu", use_valid)
    table = []
    for label, thr, cap in CONFIGS:
        w, c = med(label, "wall", use_valid), med(label, "cpu", use_valid)
        walls = [l["wall"] for legs in by_round for l in legs
                 if l["label"] == label]
        table.append({"config": label, "pair_cap": cap,
                      "wall_med": w, "wall_all": walls, "cpu_med": c,
                      "wall_vs_star": round(w / star_wall, 2),
                      "cpu_vs_star": round(c / star_cpu, 2)})

    turns = by_round[0][0]["turns"]
    rows = "\n".join(
        f"| {t['config']} | {t['pair_cap'] or '—'} | {t['wall_med']} "
        f"| {t['wall_vs_star']}x | {t['cpu_med']} | {t['cpu_vs_star']}x "
        f"| {t['wall_all']} |" for t in table)
    valid_str = ", ".join(
        f"round {i}: {'VALID' if legs[0]['valid_round'] else 'REJECTED'}"
        for i, legs in enumerate(by_round))
    md = f"""# BENCH/PAIRCAP — verified-path cost vs pair_cap (round-4 protocol)

Flagship pipeline over {turns} turns, taskset-pinned local[{cpus}],
{rounds} interleaved rounds (configs round-robin so host drift hits all
configs symmetrically), per leg a fresh subprocess with 1 untimed
warm-up + 1 timed run, alloc-bandwidth validity gate per round (all
legs within 2x). Medians over valid rounds ({n_valid}/{rounds} valid:
{valid_str}).

"star" is the reference-parity unverified path; "v_capK" adds
pair_edges candidate generation (all pairs in buckets <= K,
star+sub-star+salted-chain above) and exact-Jaccard verification of
every candidate edge (the promoted analog of the reference's true-jacc,
/root/reference/src/main.rs:1573-1677).

| config | pair_cap | wall med (s) | vs star | cpu med (core-s) | vs star | all walls (s) |
|---|---|---|---|---|---|---|
{rows}

The CPU column (process-tree core-seconds around the timed run) is the
host-slowdown-invariant cost number — it is what predicts multi-executor
cluster cost; the wall column inherits whatever bus contention the box
had during that leg.
"""
    (ROOT / "BENCH").mkdir(exist_ok=True)
    (ROOT / "BENCH" / "PAIRCAP.md").write_text(md)
    print(json.dumps({"turns": turns, "cpus": cpus, "rounds": rounds,
                      "valid_rounds": n_valid, "table": table}))


if __name__ == "__main__":
    main()
