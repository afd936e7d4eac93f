"""SparkSession factory with the engine's physical defaults.

Single-JVM local mode in this sandbox (local[$SPARK_GRAFT_CPUS]); the same
settings are what we'd submit cluster-side via spark-submit --conf. AQE stays
on so skewed LSH-band shuffles get split at runtime (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from wdd.config import DEFAULT, WddConfig


def get_spark(app_name: str = "wdd", cpus: int | None = None,
              cfg: WddConfig = DEFAULT, extra_conf: dict | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(cfg.arrow_max_records))
        .config("spark.driver.memory", os.environ.get("WDD_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
