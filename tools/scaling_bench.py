"""Two-cluster-size scaling evidence (BASELINE.json north rule): run
the flagship pipeline at pinned N and 4N cores on the SAME
pre-generated input and report throughput at both plus scaling
efficiency = (T_N / T_4N) / 4.

No real multi-node cluster exists in this sandbox, so "N and 4N
executors" is evidenced by taskset-pinned core counts (the documented
stand-in): unpinned runs let the small-N JVM's GC/shuffle threads and
Python workers overflow onto idle cores, corrupting the ratio.

Methodology upgrades over round 1 (which measured 0.44 at 5.45M turns):
  * the corpus is pre-generated ONCE to parquet at full parallelism and
    read by both levels — generation is excluded and the input is
    byte-identical;
  * flagship-only (the suite's small queries are pure fixed-latency at
    2 cores and tell nothing about scaling);
  * 10x corpus (default 3.3M conversations ~= 30M turns): round 1's
    Amdahl decomposition showed ~90 s of parallelism-independent time
    (CC round latency, stage setup) vs ~30 s of parallel work — the
    parallel fraction must dominate before efficiency is measurable;
  * host allocation bandwidth is stamped before/after each level (this
    VM's memory subsystem intermittently collapses; a degraded window
    invalidates the ratio).

Writes BENCH/SCALING.md and prints a JSON summary.

Usage: python tools/scaling_bench.py [sf_dir] [N] [n_convs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
CORPUS_DIR = "/tmp/scaling_corpus"


def gen_corpus(n_convs: int) -> str:
    path = f"{CORPUS_DIR}/turns_{n_convs}"
    if Path(path, "_SUCCESS").exists():
        return path
    sys.path.insert(0, str(ROOT))
    from minhash_rs_spark.data.transcripts import transcripts_spark_distributed
    from minhash_rs_spark.session import get_spark

    spark = get_spark("scaling-gen", master="local[32]",
                      shuffle_partitions=64)
    t0 = time.time()
    turns = transcripts_spark_distributed(spark, n_base=n_convs, seed=42)
    turns.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"# generated {n} turns in {time.time() - t0:.0f}s -> {path}",
          file=sys.stderr)
    spark.stop()
    return path


def run_level(corpus: str, sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus), PYTHONPATH=str(ROOT),
               SPARK_GRAFT_TURNS_PARQUET=corpus,
               SPARK_GRAFT_FLAGSHIP_ONLY="1")
    cmd = [sys.executable, str(ROOT / "bench.py")]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=str(ROOT))
    wall = time.time() - t0
    if p.returncode != 0:
        print(p.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"bench.py failed at local[{cpus}]")
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    out["wall_sec"] = round(wall, 1)
    print(f"# local[{cpus}] pinned: flagship {out['flagship_sec']}s "
          f"({out['turns_per_sec']} turns/s), host alloc "
          f"{out['host_alloc_gbs']}->{out['host_alloc_gbs_after']} GB/s",
          file=sys.stderr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # default N=2 -> pinned 2 vs 8 cores ("N and 4N cores"): this box's
    # memory bus saturates around ~8-12 heavy threads, so 8-vs-32
    # measures the bandwidth wall, not the job's scalability
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 3_300_000
    corpus = gen_corpus(n_convs)
    r_n = run_level(corpus, sf_dir, n)
    r_4n = run_level(corpus, sf_dir, 4 * n)
    t_n, t_4n = r_n["flagship_sec"], r_4n["flagship_sec"]
    eff = (t_n / t_4n) / 4
    summary = {
        "corpus": corpus,
        "turns": r_n["turns"],
        "n_cpus": n, "n4_cpus": 4 * n,
        "flagship_sec_n": t_n, "flagship_sec_4n": t_4n,
        "turns_per_sec_n": r_n["turns_per_sec"],
        "turns_per_sec_4n": r_4n["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "host_alloc_gbs": [r_n["host_alloc_gbs"],
                           r_n["host_alloc_gbs_after"],
                           r_4n["host_alloc_gbs"],
                           r_4n["host_alloc_gbs_after"]],
    }
    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    md = f"""# BENCH/SCALING — N vs 4N evidence (pinned cores)

Same job (flagship MinHash dedup pipeline: assemble -> shingle ->
minhash -> LSH -> CC -> assignments), same pre-generated input
({r_n["turns"]} turns), taskset-pinned {n} vs {4 * n} cores.

| metric | local[{n}] pinned | local[{4 * n}] pinned |
|---|---|---|
| flagship sec | {t_n} | {t_4n} |
| turns/sec | {r_n["turns_per_sec"]} | {r_4n["turns_per_sec"]} |
| host alloc GB/s (before/after) | {r_n["host_alloc_gbs"]}/{r_n["host_alloc_gbs_after"]} | {r_4n["host_alloc_gbs"]}/{r_4n["host_alloc_gbs_after"]} |

Scaling efficiency (T_{n} / T_{4 * n}) / 4 = **{eff:.3f}**
(north-rule target >= 0.8; host alloc bandwidth must read ~9+ GB/s on
both levels for the ratio to be valid — see BENCH/BASELINE.md for this
VM's degradation history).
"""
    (bench_dir / "SCALING.md").write_text(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
