"""CLI smoke tests (python -m minhash_rs_spark ...) — the spark-submit
entry surface mirroring the reference's subcommands."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def turns_parquet(spark, tiny_corpus, tmp_path_factory):
    turns, _ = tiny_corpus
    p = tmp_path_factory.mktemp("cli") / "turns.parquet"
    turns.write.parquet(str(p))
    return str(p)


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "minhash_rs_spark", *args,
         "--master", "local[4]"],
        capture_output=True, text=True, cwd=str(ROOT), timeout=420)


def test_cli_min_hash(turns_parquet, tmp_path, spark):
    out = tmp_path / "out"
    p = _run_cli("min-hash", "--input", turns_parquet, "--output", str(out))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["documents"] > 0 and stats["clusters"] > 0
    res = spark.read.parquet(str(out))
    assert res.count() > 0
    assert "minhash" in res.columns  # annotate_only default


def test_cli_exact_dedup(turns_parquet, tmp_path):
    out = tmp_path / "out_ed"
    p = _run_cli("exact-dedup", "--input", turns_parquet,
                 "--output", str(out))
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["clusters"] <= stats["documents"]


def test_cli_rejects_unknown_command(turns_parquet, tmp_path):
    p = _run_cli("frobnicate", "--input", turns_parquet,
                 "--output", str(tmp_path / "x"))
    assert p.returncode != 0


def test_cli_phase_commands_resume(turns_parquet, tmp_path):
    """Reference-style granular phases: hash-only -> gather-edges ->
    build-uf -> annotate, each resuming the previous phase's tables."""
    ck = tmp_path / "ck"
    out = tmp_path / "out_phase"
    for cmd, key in [("hash-only", '"stage": "sigs"'),
                     ("gather-edges", '"stage": "edges"'),
                     ("build-uf", '"stage": "cc"')]:
        p = _run_cli(cmd, "--input", turns_parquet,
                     "--output", str(out), "--checkpoint-dir", str(ck))
        assert p.returncode == 0, (cmd, p.stderr[-1500:])
        assert key in p.stdout
    manifest = (ck / "_manifest.jsonl").read_text()
    for stage in ["docs", "sigs", "edges", "cc"]:
        assert f'"stage": "{stage}"' in manifest
    n_rows_before = manifest.count("\n")
    p = _run_cli("annotate", "--input", turns_parquet,
                 "--output", str(out), "--checkpoint-dir", str(ck))
    assert p.returncode == 0, p.stderr[-1500:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["documents"] > 0
    manifest2 = (ck / "_manifest.jsonl").read_text()
    # annotate only adds the assignments stage — everything else resumed
    assert manifest2.count("\n") == n_rows_before + 1


def test_cli_phase_requires_checkpoint(turns_parquet, tmp_path):
    p = _run_cli("hash-only", "--input", turns_parquet,
                 "--output", str(tmp_path / "x"))
    assert p.returncode != 0
    assert "checkpoint" in (p.stderr + p.stdout).lower()


def test_cli_subsample_from_prior_annotations(turns_parquet, tmp_path, spark):
    """dup-aware-subsample --annotations consumes a prior min-hash run's
    annotated output standalone (ref src/dup_aware_subsample.rs:70-113)
    and keeps exactly the conversations the recompute path keeps."""
    anno = tmp_path / "anno"
    p = _run_cli("min-hash", "--input", turns_parquet, "--output", str(anno))
    assert p.returncode == 0, p.stderr[-2000:]

    out_prior = tmp_path / "sub_prior"
    p = _run_cli("dup-aware-subsample", "--input", turns_parquet,
                 "--output", str(out_prior), "--annotations", str(anno),
                 "--subsample-rate", "0.5")
    assert p.returncode == 0, p.stderr[-2000:]

    out_recompute = tmp_path / "sub_recompute"
    p = _run_cli("dup-aware-subsample", "--input", turns_parquet,
                 "--output", str(out_recompute), "--subsample-rate", "0.5")
    assert p.returncode == 0, p.stderr[-2000:]

    kept_prior = {r["conv_id"] for r in
                  spark.read.parquet(str(out_prior)).collect()}
    kept_re = {r["conv_id"] for r in
               spark.read.parquet(str(out_recompute)).collect()}
    assert kept_prior == kept_re
    assert 0 < len(kept_prior)


def test_cli_incremental_and_decontam(turns_parquet, tmp_path, spark):
    """New-op subcommands: `incremental` dedups a batch against the
    checkpoint a prior min-hash run committed; `decontam` flags k-gram
    overlap against a benchmark parquet."""
    ck = tmp_path / "ck"
    base_out = tmp_path / "base_out"
    p = _run_cli("min-hash", "--input", turns_parquet,
                 "--output", str(base_out), "--checkpoint-dir", str(ck))
    assert p.returncode == 0, p.stderr[-2000:]
    # the batch: reuse the same turns (everything duplicates history)
    inc_out = tmp_path / "inc_out"
    p = _run_cli("incremental", "--input", turns_parquet,
                 "--output", str(inc_out), "--checkpoint-dir", str(ck),
                 "--base-token", turns_parquet,
                 "--batch-token", "day1")
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["dup_of_old"] == stats["new_conversations"] > 0
    assert stats["removal_rate"] == 1.0

    # decontam: benchmark = the same docs -> everything contaminated
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string")
    docs_p = tmp_path / "docs.parquet"
    bench_p = tmp_path / "bench.parquet"
    docs.write.parquet(str(docs_p))
    docs.limit(1).write.parquet(str(bench_p))
    dec_out = tmp_path / "dec_out"
    p = _run_cli("decontam", "--input", str(docs_p),
                 "--output", str(dec_out), "--benchmark", str(bench_p),
                 "--k", "4")
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats == {"docs": 2, "contaminated": 1}


def test_cli_compact(turns_parquet, tmp_path):
    """`compact` unions a chain of committed checkpoints into one
    history token that `incremental` can then read as a single table."""
    ck = tmp_path / "ck"
    p = _run_cli("min-hash", "--input", turns_parquet,
                 "--output", str(tmp_path / "o1"),
                 "--checkpoint-dir", str(ck))
    assert p.returncode == 0, p.stderr[-2000:]
    p = _run_cli("incremental", "--input", turns_parquet,
                 "--output", str(tmp_path / "o2"),
                 "--checkpoint-dir", str(ck),
                 "--base-token", turns_parquet, "--batch-token", "day1")
    assert p.returncode == 0, p.stderr[-2000:]
    p = _run_cli("compact", "--input", turns_parquet,
                 "--output", str(tmp_path / "o3"),
                 "--checkpoint-dir", str(ck),
                 "--base-token", turns_parquet, "--base-token", "day1",
                 "--out-token", "hist")
    assert p.returncode == 0, p.stderr[-2000:]
    out = json.loads([ln for ln in p.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert out["out_token"] == "hist"
    # day2 against the compacted history alone: everything still dups
    p = _run_cli("incremental", "--input", turns_parquet,
                 "--output", str(tmp_path / "o4"),
                 "--checkpoint-dir", str(ck),
                 "--base-token", "hist", "--batch-token", "day2")
    assert p.returncode == 0, p.stderr[-2000:]
    stats = json.loads([ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["removal_rate"] == 1.0
