#!/usr/bin/env python
"""Round-7 optimization measurement harness (guide §1.4 noop-sink isolation).

NOT the driver bench (bench.py is frozen); this file exists so optimization
A/Bs can time one query at a time with the noop sink, capture
.explain("formatted") plans, and dump per-stage pipeline timings.

Usage:
  python bench_extra.py queries [name ...]      # time declared queries (noop)
  python bench_extra.py plans <outdir> [name..] # write explain(formatted)
  python bench_extra.py pipeline                # per-stage headline timings

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     WDD_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from wdd.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("wdd-bench-extra", cpus=cpus, extra_conf={
        "spark.sql.shuffle.partitions": str(2 * cpus),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    })
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def time_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("WDD_BENCH_REPS", "3"))
    spark = _spark()
    qmap = entrymod.queries()
    names = names or list(qmap)
    out: dict[str, list[float]] = {}
    # one warmup of the first query so JVM/codegen startup is not charged
    qmap[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for r in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:r{r}")
            t0 = time.monotonic()
            qmap[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            out.setdefault(name, []).append(round(time.monotonic() - t0, 3))
    med = {n: sorted(v)[len(v) // 2] for n, v in out.items()}
    print(json.dumps({"medians": med, "samples": out,
                      "load": round(os.getloadavg()[0], 2)}))
    spark.stop()


def dump_plans(outdir: str, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qmap = entrymod.queries()
    for name in (names or list(qmap)):
        df = qmap[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")
    spark.stop()


def time_pipeline() -> None:
    from wdd.pipeline import run_dedup_pipeline
    from wdd.sources.pages import synth_pages
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("WDD_BENCH_REPS", "3"))
    spark = _spark()
    pages, _ = synth_pages(spark, sf_dir, with_embeddings=True)
    par = spark.sparkContext.defaultParallelism
    n = pages.count()
    width = int(min(4 * par, max(2 * par, 16, n // 256)))
    pages = (pages.select("url", "warc_ts", "html", "embedding")
             .repartition(width).localCheckpoint(eager=True))
    # warmup
    warm = run_dedup_pipeline(spark, pages.limit(300), eager_stages=False)
    warm.clusters.write.format("noop").mode("overwrite").save()
    warm.release()
    walls = []
    for r in range(reps):
        t0 = time.monotonic()
        res = run_dedup_pipeline(spark, pages, eager_stages=False)
        ncl = res.clusters.select("cluster_id").distinct().count()
        walls.append(round(time.monotonic() - t0, 3))
        res.release()
    # one eager run for per-stage wall breakdown
    t0 = time.monotonic()
    res = run_dedup_pipeline(spark, pages, eager_stages=True)
    eager_wall = round(time.monotonic() - t0, 3)
    stages = {r.stage: round(r.wall_ms / 1000.0, 3)
              for r in res.metrics.records}
    print(json.dumps({
        "lazy_walls": walls, "median": sorted(walls)[len(walls) // 2],
        "clusters": ncl, "eager_wall": eager_wall, "eager_stages": stages,
        "cc_iterations": res.cc_iterations,
        "load": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        time_queries(sys.argv[2:])
    elif mode == "plans":
        dump_plans(sys.argv[2], sys.argv[3:])
    elif mode == "pipeline":
        time_pipeline()
    else:
        raise SystemExit(f"unknown mode {mode}")
