"""Stage checkpointing + per-partition lineage manifest (north rule:
"every stage writes per-partition lineage + counters ... so the job
resumes from the last committed checkpoint").

Spark-native analog of the reference's phase files + S3 staging
(/root/reference/src/main.rs:411-429 binary IR layout;
/root/reference/python/orchestration.py:90-157 upload_and_clean /
re-run-from-phase): each named stage persists its output as a table and
appends a manifest record {run fingerprint, stage, per-partition row
counts, wall_ms, committed_at}. On re-run with the same fingerprint the
stage is served from the committed checkpoint instead of recomputed.

Table format: parquet directories in this sandbox. On a real cluster the
same manager targets Iceberg (`df.writeTo(f"{db}.{stage}")`) — the
format is isolated behind _write/_read so only these two methods change;
no Iceberg runtime jars are available in this container.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    """fingerprint: a stable hash of (pipeline config, input identity);
    stages with a committed manifest row under the same fingerprint are
    resumed, not recomputed."""

    def __init__(self, spark: SparkSession, base_dir: str | None,
                 fingerprint: str):
        self.spark = spark
        self.base_dir = Path(base_dir) if base_dir else None
        self.fingerprint = fingerprint
        self._manifest_path = (self.base_dir / "_manifest.jsonl"
                               if self.base_dir else None)

    # ---- manifest ----

    def _manifest_rows(self) -> list[dict]:
        if not self._manifest_path or not self._manifest_path.exists():
            return []
        with open(self._manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self, stage: str) -> bool:
        """A stage resumes only if its manifest row exists under this
        fingerprint AND its table is still on disk (a deleted table must
        recompute, not fail downstream)."""
        has_row = any(
            r["stage"] == stage and r["fingerprint"] == self.fingerprint
            for r in self._manifest_rows())
        return has_row and (self.base_dir / stage).exists()

    def _append_manifest(self, record: dict) -> None:
        self.base_dir.mkdir(parents=True, exist_ok=True)
        with open(self._manifest_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    # ---- stage execution ----

    def stage(self, name: str, build, partition_cols: list[str] | None = None) -> DataFrame:
        """Run (or resume) one pipeline stage.

        build: () -> DataFrame. With no base_dir, checkpointing is off and
        the DataFrame flows through lazily (single-job execution).
        """
        if self.base_dir is None:
            return build()
        path = str(self.base_dir / name)
        if self.committed(name):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage counters (north rule): rows per output file
        per_part = [
            {"partition": r["p"], "rows": r["rows"]}
            for r in (out.groupBy(F.spark_partition_id().alias("p"))
                      .agg(F.count(F.lit(1)).alias("rows")).collect())
        ]
        self._append_manifest({
            "fingerprint": self.fingerprint,
            "stage": name,
            "rows_out": sum(p["rows"] for p in per_part),
            "partitions": per_part,
            "wall_ms": int((time.time() - t0) * 1000),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        return out
