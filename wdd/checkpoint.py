"""Resumable stage store: parquet materialization + JSON manifests.

North-rule requirement: "per-partition checkpointed lineage + metrics so any
stage resumes mid-run". Each stage the pipeline materializes is written to
`<root>/<stage>/` with a `_manifest.json` recording row count, partition
count, the pinned algorithm config, and wall time. A rerun with the same
store skips any stage whose manifest is present and loads its parquet instead
— idempotent overwrite semantics replace the reference's Celery job-dedup
(web.py:29-43) and task-state machinery (discover.py:204-227).

Storage format: local parquet with an explicit directory layout. On a real
cluster the same call sites write Iceberg (`writeTo(...).createOrReplace()`)
with `bucket(N, url)` partition transforms — the Iceberg runtime jar is not
available in this sandbox (no network, SURVEY.md §7.6), so the fallback
materializes the bucket id as a column and repartitions on it, giving the
same co-location properties to downstream joins.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from wdd.config import DEFAULT, WddConfig


class StageStore:
    def __init__(self, root: str, spark: SparkSession,
                 cfg: WddConfig = DEFAULT):
        self.root = Path(root)
        self.spark = spark
        self.cfg = cfg
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, stage: str) -> Path:
        return self.root / stage

    def _manifest(self, stage: str) -> Path:
        return self._dir(stage) / "_manifest.json"

    def exists(self, stage: str) -> bool:
        return self._manifest(stage).exists()

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(str(self._dir(stage) / "data"))

    def manifest(self, stage: str) -> dict:
        with open(self._manifest(stage)) as f:
            return json.load(f)

    def materialize(self, stage: str, df: DataFrame,
                    partition_by: list[str] | None = None) -> DataFrame:
        """Write-once: if the stage manifest exists, return the stored data
        (resume path); otherwise write parquet + manifest atomically
        (manifest last, so a crashed write is retried, never half-trusted)."""
        if self.exists(stage):
            return self.load(stage)
        t0 = time.monotonic()
        path = self._dir(stage) / "data"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(path))
        out = self.spark.read.parquet(str(path))
        n = out.count()
        manifest = {
            "stage": stage,
            "rows": n,
            "partitions": out.rdd.getNumPartitions(),
            "wall_ms": int((time.monotonic() - t0) * 1000),
            "written_files": len([p for p in os.listdir(path)
                                  if p.endswith(".parquet")]),
            "config": self.cfg.as_dict(),
        }
        with open(self._manifest(stage), "w") as f:
            json.dump(manifest, f, indent=1)
        return out
