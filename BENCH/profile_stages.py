#!/usr/bin/env python
"""Job-timeline profile of one pipeline leg: name the non-scaling seconds.

Runs the SAME pipeline workload as a scaling leg (synth + replicate +
warmup + lazy pipeline + distinct-count) at a given pinned core count, and
captures the Spark status-API job timeline for the timed region. Output
(one JSON line) decomposes the timed wall into:

  * per-job wall (submission -> completion), with the job's first line of
    call-site description so jobs can be matched across legs;
  * driver gaps (time between consecutive jobs — plan analysis, scheduling,
    py4j round trips, checkpoint bookkeeping: all single-threaded driver
    work that cannot scale with cores);
  * total timed wall.

Comparing a 2-core and an 8-core profile job-by-job names exactly where
the flat seconds live: a job whose wall is ~equal on both legs is serial
(or scheduling-bound); a job that speeds up ~4x is scaling. Usage:

  taskset -c 0-1 python BENCH/profile_stages.py 2 32
  taskset -c 0-7 python BENCH/profile_stages.py 8 32
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    try:
        os.sched_setaffinity(0, set(range(cpus)))  # children inherit
    except Exception:
        pass

    from wdd.session import get_spark
    from wdd.pipeline import run_dedup_pipeline
    from wdd.sources.pages import synth_pages
    import bench as benchmod

    heap = os.environ.get("WDD_PROFILE_HEAP") or f"{max(2, 2 * cpus)}g"
    extra = {
        "spark.sql.shuffle.partitions": str(max(2 * cpus, replicas // 4, 8)),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        "spark.driver.memory": heap,
        "spark.ui.enabled": "true",
    }
    # A/B knobs for chasing the task-CPU inflation between legs
    if os.environ.get("WDD_JAVA_OPTS"):
        extra["spark.driver.extraJavaOptions"] = os.environ["WDD_JAVA_OPTS"]
    if os.environ.get("WDD_IO_CODEC"):
        extra["spark.io.compression.codec"] = os.environ["WDD_IO_CODEC"]
    spark = get_spark("wdd-profile", cpus=cpus, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    pages, _ = synth_pages(spark, sf_dir, with_truth=False)
    pages = (benchmod._replicate_pages(pages, replicas)
             .repartition(max(4 * cpus, 16))
             .localCheckpoint(eager=True))
    n_pages = pages.count()

    warm = run_dedup_pipeline(spark, pages.limit(300), eager_stages=False)
    warm.clusters.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def jobs_after(first_job_id):
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
            js = json.load(r)
        return sorted((j for j in js if j["jobId"] >= first_job_id),
                      key=lambda j: j["jobId"])

    def parse_ts(s):
        # "2026-08-17T11:22:33.123GMT"
        from datetime import datetime
        return datetime.strptime(s.replace("GMT", ""),
                                 "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    mark = 0
    # read the current max job id from the status API; jobs >= mark are
    # the timed region's
    try:
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            existing = json.load(r)
        mark = (max((j["jobId"] for j in existing), default=-1)) + 1
    except Exception:
        pass

    t0 = time.monotonic()
    res = run_dedup_pipeline(spark, pages, eager_stages=False)
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0

    # stage-level executor metrics for the timed region: per-job walls
    # overlap under AQE (concurrent stage futures), so only aggregate task
    # time can say whether 4x cores ran 4x the work in the same task-seconds
    # (ideal), left cores idle (scheduling/skew), or inflated per-task time
    # (bandwidth/GC contention)
    def stages_after(first_stage_id):
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages"
                "?status=complete") as r:
            st = json.load(r)
        return [s for s in st if s["stageId"] >= first_stage_id]

    jobs = jobs_after(mark)
    first_stage = min((min(j["stageIds"]) for j in jobs
                       if j.get("stageIds")), default=0)
    stages = stages_after(first_stage)
    agg = {}
    for k in ("executorRunTime", "executorCpuTime", "jvmGcTime",
              "shuffleWriteBytes", "shuffleReadBytes", "inputBytes",
              "outputBytes", "memoryBytesSpilled", "diskBytesSpilled",
              "executorDeserializeTime", "shuffleFetchWaitTime",
              "shuffleWriteTime", "numTasks"):
        agg[k] = sum(s.get(k, 0) or 0 for s in stages)
    top_stages = [
        {"stage": s["stageId"], "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
         "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
         "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
         "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
         "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
         "spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
         "tasks": s.get("numTasks"),
         "name": (s.get("name") or "")[:80]}
        for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:14]]
    rows, prev_end = [], None
    gap_total = 0.0
    for j in jobs:
        sub = parse_ts(j["submissionTime"])
        end = parse_ts(j["completionTime"])
        gap = (sub - prev_end) if prev_end is not None else 0.0
        gap_total += max(0.0, gap)
        rows.append({
            "job": j["jobId"],
            "wall_s": round(end - sub, 3),
            "gap_before_s": round(max(0.0, gap), 3),
            "tasks": j.get("numTasks"),
            "desc": (j.get("description") or j.get("name", ""))[:90],
        })
        prev_end = end
    run_s = agg["executorRunTime"] / 1e3
    print(json.dumps({
        "cpus": cpus, "replicas": replicas, "pages": n_pages,
        "clusters": n_clusters, "wall_s": round(wall, 2),
        "jobs_wall_s": round(sum(r["wall_s"] for r in rows), 2),
        "driver_gaps_s": round(gap_total, 2),
        "n_jobs": len(rows),
        "task_run_s": round(run_s, 1),
        "task_cpu_s": round(agg["executorCpuTime"] / 1e9, 1),
        "gc_s": round(agg["jvmGcTime"] / 1e3, 1),
        "deser_s": round(agg["executorDeserializeTime"] / 1e3, 1),
        "shuffle_fetch_wait_s": round(agg["shuffleFetchWaitTime"] / 1e3, 1),
        "shuffle_write_time_s": round(agg["shuffleWriteTime"] / 1e9, 1),
        "shuffle_write_gb": round(agg["shuffleWriteBytes"] / 1e9, 2),
        "shuffle_read_gb": round(agg["shuffleReadBytes"] / 1e9, 2),
        "spill_disk_gb": round(agg["diskBytesSpilled"] / 1e9, 2),
        "spill_mem_gb": round(agg["memoryBytesSpilled"] / 1e9, 2),
        "n_tasks": agg["numTasks"],
        "core_utilization": round(run_s / (cpus * wall), 3),
        "cpu_frac_of_run": round(
            agg["executorCpuTime"] / 1e9 / run_s, 3) if run_s else None,
        "top_stages": top_stages,
        "jobs": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
