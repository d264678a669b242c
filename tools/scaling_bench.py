"""Two-cluster-size scaling evidence (BASELINE.json north rule): run
the flagship pipeline at pinned N and 4N cores on the SAME
pre-generated input and report throughput at both plus scaling
efficiency = (T_N / T_4N) / 4, with a CPU-utilization secondary that is
invariant to host slowdowns.

No real multi-node cluster exists in this sandbox, so "N and 4N
executors" is evidenced by taskset-pinned core counts (the documented
stand-in): unpinned runs let the small-N JVM's GC/shuffle threads and
Python workers overflow onto idle cores, corrupting the ratio.

Round-3 protocol (the round-2 measurement was invalidated by a host
whose allocation bandwidth swung 3x between legs):
  * INTERLEAVED legs A(4N)/B(N)/A(4N)/B(N) back-to-back, so a host
    drift affects both levels symmetrically instead of one;
  * per-leg WARM-UP run (untimed) + 2 timed runs: this VM's fresh
    page-fault path intermittently collapses to 0.01 GB/s while mapped
    page REUSE stays ~8 GB/s, so the first run per process is host
    noise by construction; glibc is told to never return arenas
    (MALLOC_TRIM_THRESHOLD_) so Python workers keep their pages;
  * validity gate: a pair of adjacent legs counts only when the two
    legs' fresh-alloc bandwidth stamps read within 2x of each other;
  * CPU-time secondary: bench.py samples the process tree's CPU
    seconds around each timed run; utilization = cpu/(wall*cores).
    A drop in utilization from N to 4N cores separates "lost
    parallelism" from "host got slower" — wall ratios can't.
  * Amdahl decomposition from the level medians:
    T = s + W/cores  =>  W = (4N/3)(T_N - T_4N), s = T_N - W/N.

Writes BENCH/SCALING.md and prints a JSON summary.

Usage: python tools/scaling_bench.py [sf_dir] [N] [n_convs] [pairs] [out_md] [poll_gbs] [cpm_ref]
  out_md (default SCALING.md) names the BENCH/ output file, so a second
  corpus size can be recorded alongside the first (VERDICT r3 #3).
  poll_gbs (default 0 = off): before launching each leg, poll the
  fresh-alloc bandwidth probe until two consecutive readings are at or
  above this threshold (VERDICT r4 #4: healthy windows DO occur on this
  host — wait for one instead of burning a leg in a degraded band).
  Polling caps at 30 min per leg, then launches anyway with the stamp
  on record — the per-pair 2x gate still decides validity.
  cpm_ref (default 0 = off): known-healthy CPU cost of this job in
  core-seconds per M turns (e.g. 71.6 for the flagship at 8c,
  BENCH/PAIRCAP.md). Endpoint alloc stamps are necessary but NOT
  sufficient — round-4/5 legs started AND ended healthy yet burned
  5-6x the healthy CPU from mid-leg contention. With cpm_ref set, a
  leg whose measured core-s/M exceeds 2x the reference is marked
  CONTENDED and its pair is rejected by the CPU ledger; a contended
  4N leg also FAST-FAILS its attempt (the ~4x-longer N leg is skipped,
  so a bad host window costs one leg, not two).
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
CORPUS_DIR = "/tmp/scaling_corpus"

# keep worker/JVM arenas mapped: fresh faults are the pathological path
MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1099511627776",
    "MALLOC_TRIM_THRESHOLD_": "-1",
}


def gen_corpus(n_convs: int) -> str:
    path = f"{CORPUS_DIR}/turns_{n_convs}"
    if Path(path, "_SUCCESS").exists():
        return path
    # generate in a SUBPROCESS: spark.stop() does not kill the py4j JVM
    # while the parent Python lives, and a lingering unpinned local[32]
    # JVM (GC threads on all cores) contaminates every pinned leg
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "from minhash_rs_spark.data.transcripts import "
        "transcripts_spark_distributed\n"
        "from minhash_rs_spark.session import get_spark\n"
        "spark = get_spark('scaling-gen', master='local[32]', "
        "shuffle_partitions=64)\n"
        "t0 = time.time()\n"
        "transcripts_spark_distributed(spark, n_base=%d, seed=42)"
        ".write.mode('overwrite').parquet(%r)\n"
        "n = spark.read.parquet(%r).count()\n"
        "print(f'# generated {n} turns in {time.time()-t0:.0f}s', "
        "file=sys.stderr)\n"
        "spark.stop()\n" % (str(ROOT), n_convs, path, path))
    subprocess.run([sys.executable, "-c", code], check=True)
    return path


def wait_healthy(min_gbs: float, timeout_s: float = 1800.0,
                 settle: int = 2, interval_s: float = 45.0) -> bool:
    """Poll the fresh-alloc bandwidth probe (bench.host_alloc_gbs, the
    same stamp the validity gate reads) until `settle` consecutive
    readings >= min_gbs, or timeout. The pathology this dodges: legs
    launched in a degraded band (0.1-0.5 GB/s) inflate CPU 5-6x and are
    auto-rejected by the 2x gate — polling spends idle seconds instead
    of 10-minute rejected legs. Returns True iff the band was entered."""
    sys.path.insert(0, str(ROOT))
    from bench import host_alloc_gbs
    t0 = time.time()
    good = 0
    while True:
        g = host_alloc_gbs()
        good = good + 1 if g >= min_gbs else 0
        print(f"# poll alloc {g} GB/s ({good}/{settle} good)",
              file=sys.stderr, flush=True)
        if good >= settle:
            return True
        if time.time() - t0 >= timeout_s:
            print(f"# poll timeout after {timeout_s:.0f}s — launching "
                  "in current band (gate will judge)", file=sys.stderr,
                  flush=True)
            return False
        time.sleep(interval_s)


def run_leg(corpus: str, sf_dir: str, cpus: int, leg_id: str) -> dict:
    # wall-clock contingency knob: a long-corpus run scheduled behind
    # other benches can be trimmed mid-flight by writing a run count
    # into this file (read at leg start, so it applies to queued legs)
    timed = "3"
    knob = Path("/tmp/scaling_timed_runs")
    if knob.exists():
        timed = knob.read_text().strip() or "3"
    # shuffle partitions: sized to the corpus (~200k turns/partition),
    # IDENTICAL at both core counts — legs must compare executor
    # parallelism, never plan shape. At 8 partitions a 25M-turn corpus
    # went superlinear (~3M rows/shuffle partition); this is the same
    # data-not-cores sizing rule the engine prescribes at 100 TB.
    # gen_corpus paths end in '_<n_convs>' (~10 turns each); any other
    # corpus dir falls back to a mid-range default instead of raising
    try:
        n_turns_est = int(corpus.rsplit("_", 1)[-1]) * 10
    except ValueError:
        n_turns_est = 10_000_000
    shuf = max(32, min(512, n_turns_est // 200_000))
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus), PYTHONPATH=str(ROOT),
               SPARK_GRAFT_TURNS_PARQUET=corpus,
               SPARK_GRAFT_FLAGSHIP_ONLY="1",
               SPARK_GRAFT_WARMUP_RUNS="1",
               SPARK_GRAFT_TIMED_RUNS=timed,
               SPARK_GRAFT_SHUFFLE_PARTITIONS=str(shuf),
               **MALLOC_ENV)
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
    out["leg"] = leg_id
    out["leg_wall_sec"] = round(wall, 1)
    print(f"# leg {leg_id} local[{cpus}] pinned: flagship "
          f"{out['flagship_sec']}s median of {out['flagship_runs']}, "
          f"cpu {out['flagship_cpu_sec']}s util {out['flagship_util']}, "
          f"alloc {out['host_alloc_gbs']}->{out['host_alloc_gbs_after']} GB/s",
          file=sys.stderr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # default N=4 -> pinned 4 vs 16 cores ("N and 4N cores"): this box's
    # memory bus saturates around ~8-12 heavy threads, so 8-vs-32
    # measures the bandwidth wall, not the job's scalability
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_100_000
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    out_md = sys.argv[5] if len(sys.argv) > 5 else "SCALING.md"
    poll_gbs = float(sys.argv[6]) if len(sys.argv) > 6 else 0.0
    cpm_ref = float(sys.argv[7]) if len(sys.argv) > 7 else 0.0
    corpus = gen_corpus(n_convs)

    def annotate(leg: dict) -> dict:
        cpm = leg["flagship_cpu_sec"] / (leg["turns"] / 1e6)
        leg["cpu_per_m"] = round(cpm, 1)
        leg["contended"] = bool(cpm_ref > 0 and cpm > 2 * cpm_ref)
        if leg["contended"]:
            print(f"# leg {leg['leg']} CONTENDED: {cpm:.1f} core-s/M-turn"
                  f" > 2x healthy ref {cpm_ref} — CPU-ledger reject",
                  file=sys.stderr, flush=True)
        return leg

    legs: list[dict] = []
    complete_pairs: list[tuple[dict, dict]] = []
    for i in range(pairs):
        if poll_gbs > 0:
            wait_healthy(poll_gbs)
        a = annotate(run_leg(corpus, sf_dir, 4 * n, f"A{i}"))
        legs.append(a)
        if a["contended"]:
            # fast-fail: don't burn the ~4x-longer N-core leg on an
            # attempt the CPU ledger has already rejected
            continue
        if poll_gbs > 0:
            wait_healthy(poll_gbs)
        b = annotate(run_leg(corpus, sf_dir, n, f"B{i}"))
        legs.append(b)
        complete_pairs.append((a, b))

    if not complete_pairs:
        # every attempt fast-failed on a contended 4N leg: record the
        # raw legs honestly and exit without fabricating a pair
        bench_dir = ROOT / "BENCH"
        bench_dir.mkdir(exist_ok=True)
        leg_rows = "\n".join(
            f"| {l['leg']} | {l['flagship_sec']} | {l['flagship_cpu_sec']}"
            f" | {l['cpu_per_m']} | {l['flagship_util']}"
            f" | {l['host_alloc_gbs']} -> {l['host_alloc_gbs_after']}"
            f" | {'CONTENDED' if l['contended'] else 'ok'} |"
            for l in legs)
        (bench_dir / out_md).write_text(
            f"# BENCH/SCALING — no gated pair this run\n\n"
            f"Every {4 * n}-core leg exceeded 2x the healthy CPU "
            f"reference ({cpm_ref} core-s/M-turn) — mid-leg host "
            f"contention; paired {n}-core legs were fast-fail skipped.\n\n"
            f"| leg | wall (s) | cpu (core-s) | core-s/M | util "
            f"| alloc GB/s | ledger |\n|---|---|---|---|---|---|---|\n"
            f"{leg_rows}\n")
        print(json.dumps({"no_gated_pair": True, "corpus": corpus,
                          "cpm_ref": cpm_ref, "legs": legs}))
        return

    pair_rows = []
    for a, b in complete_pairs:
        ga, gb = a["host_alloc_gbs"], b["host_alloc_gbs"]
        stamps_ok = max(ga, gb) <= 2 * min(ga, gb) + 1e-9
        valid = stamps_ok and not a["contended"] and not b["contended"]
        eff = round((b["flagship_sec"] / a["flagship_sec"]) / 4, 3)
        pair_rows.append({"pair": a["leg"][1:], "t_n": b["flagship_sec"],
                          "t_4n": a["flagship_sec"], "eff": eff,
                          "alloc_n": gb, "alloc_4n": ga,
                          "cpm_n": b["cpu_per_m"], "cpm_4n": a["cpu_per_m"],
                          "contended": a["contended"] or b["contended"],
                          "valid": valid})
    valid_effs = [p["eff"] for p in pair_rows if p["valid"]]

    a_legs = [a for a, _ in complete_pairs]
    b_legs = [b for _, b in complete_pairs]
    t_n = statistics.median(l["flagship_sec"] for l in b_legs)
    t_4n = statistics.median(l["flagship_sec"] for l in a_legs)
    util_n = statistics.median(l["flagship_util"] for l in b_legs)
    util_4n = statistics.median(l["flagship_util"] for l in a_legs)
    cpu_n = statistics.median(l["flagship_cpu_sec"] for l in b_legs)
    cpu_4n = statistics.median(l["flagship_cpu_sec"] for l in a_legs)
    eff_wall = round((t_n / t_4n) / 4, 3)
    # CPU-utilization efficiency: fraction of the 4N cores doing work,
    # relative to the N-core run — invariant to uniform host slowdowns
    eff_util = round(util_4n / util_n, 3) if util_n else None
    # Amdahl: T = s + W/c
    w = 4 * n * (t_n - t_4n) / 3
    s = max(0.0, t_n - w / n)
    summary = {
        "corpus": corpus,
        "turns": legs[0]["turns"],
        "n_cpus": n, "n4_cpus": 4 * n, "pairs": pairs,
        "flagship_sec_n": t_n, "flagship_sec_4n": t_4n,
        "turns_per_sec_n": round(legs[0]["turns"] / t_n, 1),
        "turns_per_sec_4n": round(legs[0]["turns"] / t_4n, 1),
        "scaling_efficiency_wall": eff_wall,
        "scaling_efficiency_by_pair": pair_rows,
        "valid_pair_effs": valid_effs,
        "cpu_sec_n": cpu_n, "cpu_sec_4n": cpu_4n,
        "util_n": util_n, "util_4n": util_4n,
        "scaling_efficiency_util": eff_util,
        "amdahl_serial_sec": round(s, 1),
        "amdahl_parallel_core_sec": round(w, 1),
    }

    bench_dir = ROOT / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    rows = "\n".join(
        f"| {p['pair']} | {p['t_n']} | {p['t_4n']} | {p['eff']} "
        f"| {p['alloc_n']} / {p['alloc_4n']} "
        f"| {p['cpm_n']} / {p['cpm_4n']} "
        f"| {'VALID' if p['valid'] else 'rejected (cpu ledger)' if p['contended'] else 'rejected'} |"
        for p in pair_rows)
    md = f"""# BENCH/SCALING — N vs 4N evidence (pinned cores, interleaved)

Same job (flagship MinHash dedup pipeline: assemble -> shingle ->
minhash -> LSH -> CC -> assignments), same pre-generated input
({legs[0]["turns"]} turns), taskset-pinned {n} vs {4 * n} cores,
legs interleaved A({4 * n}c)/B({n}c)/A/B; per leg: 1 untimed warm-up
run + median of {len(legs[0]['flagship_runs'])} timed runs (the warm-up defeats this VM's
pathological fresh-page-fault path — see BENCH/BASELINE.md; glibc
arena trimming is disabled so workers keep their pages).

| pair | T_{n}c (s) | T_{4 * n}c (s) | eff (T_N/T_4N)/4 | alloc GB/s N / 4N | core-s/M N / 4N | gate |
|---|---|---|---|---|---|---|
{rows}

Level medians: T_{n}c = {t_n}s, T_{4 * n}c = {t_4n}s ->
**wall scaling efficiency = {eff_wall}** (north-rule target >= 0.8;
valid-pair efficiencies: {valid_effs}).

Host-invariant secondary — process-tree CPU utilization
(cpu_sec / wall / cores): {util_n} at {n}c vs {util_4n} at {4 * n}c ->
**utilization-ratio efficiency = {eff_util}**. Total CPU work:
{cpu_n}s at {n}c vs {cpu_4n}s at {4 * n}c (equal work means the 4N run
didn't inflate; a 4N utilization near the N one means the extra cores
were actually kept busy — this metric survives uniform host slowdowns
that invalidate wall ratios).

Amdahl fit (T = s + W/cores): serial s = {s:.1f}s, parallel work
W = {w:.0f} core-seconds -> predicted efficiency at {n}->{4 * n} cores
= {(s + w / n) / (4 * (s + w / (4 * n))):.3f}.
"""
    (bench_dir / out_md).write_text(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
