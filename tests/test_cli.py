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
