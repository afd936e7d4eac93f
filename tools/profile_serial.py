"""Decompose a bench-shaped lazy pipeline run into parallel vs serial time.

The round-5 scaling analysis back-solved a ~79 s fixed serial component per
x128 leg from throughput ratios alone; this measures it directly. The timed
window is the same lazy flagship the scaling legs run; afterwards the local
Spark UI's REST API supplies per-stage executor time and per-job
submission/completion stamps, giving:

  wall                 = timed wall-clock
  executor_run/cpus    = perfectly-parallel lower bound
  inside-job slack     = sum(job walls) - executor_run/cpus
                         (scheduling + task dispatch + stage barriers + skew)
  between-job gaps     = wall - sum(job walls)
                         (driver-only: Catalyst analysis/optimization, AQE
                          re-planning, collect handling, python)

Usage: taskset -c 0-(cpus-1) python tools/profile_serial.py <cpus> <replicas>
"""
import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus, replicas = int(sys.argv[1]), int(sys.argv[2])
try:
    os.sched_setaffinity(0, set(range(cpus)))
except Exception:
    pass

from wdd.session import get_spark                    # noqa: E402
from wdd.pipeline import run_dedup_pipeline          # noqa: E402
from wdd.sources.pages import synth_pages            # noqa: E402
import bench                                         # noqa: E402

spark = get_spark(
    "serialprof", cpus=cpus,
    extra_conf={
        "spark.sql.shuffle.partitions": str(max(2 * cpus, replicas // 4, 8)),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
        # the session builder disables the UI; the REST decomposition below
        # needs it (it IS the measurement instrument here)
        "spark.ui.enabled": "true",
        # WDD_NO_AQE=1: A/B the adaptive executor's job-per-shuffle-stage
        # driver overhead (the 1-core x128 baseline measured 124 jobs and
        # ~46 s of non-executor wall)
        **({"spark.sql.adaptive.enabled": "false"}
           if os.environ.get("WDD_NO_AQE") else {}),
    })
spark.sparkContext.setLogLevel("ERROR")

pages, _ = synth_pages(spark, "/root/testdata/sf0.1")
n_base = pages.count()
width = int(min(4 * cpus, max(2 * cpus, 16, n_base * replicas // 256)))
pages = (bench._replicate_pages(pages, replicas)
         .select("url", "warc_ts", "html")
         .repartition(width).localCheckpoint(eager=True))
n_pages = pages.count()

warm = run_dedup_pipeline(spark, pages.limit(300), eager_stages=False)
warm.clusters.write.format("noop").mode("overwrite").save()
warm.release()

ui = spark.sparkContext.uiWebUrl


def api(path: str):
    with urllib.request.urlopen(ui + "/api/v1" + path, timeout=30) as r:
        return json.load(r)


app = api("/applications")[0]["id"]


def _ts(s: str) -> float:
    # "2026-08-18T12:34:56.789GMT"
    return datetime.strptime(s.replace("GMT", "+0000"),
                             "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


jobs_before = {j["jobId"] for j in api(f"/applications/{app}/jobs")}
stages_before = {s["stageId"] for s in api(f"/applications/{app}/stages")}

t0 = time.monotonic()
res = run_dedup_pipeline(spark, pages, eager_stages=False)
n_clusters = res.clusters.select("cluster_id").distinct().count()
wall = time.monotonic() - t0

jobs = [j for j in api(f"/applications/{app}/jobs")
        if j["jobId"] not in jobs_before and j.get("completionTime")]
stages = [s for s in api(f"/applications/{app}/stages?status=complete")
          if s["stageId"] not in stages_before]

run_s = sum(s["executorRunTime"] for s in stages) / 1000.0
cpu_s = sum(s.get("executorCpuTime", 0) for s in stages) / 1e9
jobs.sort(key=lambda j: _ts(j["submissionTime"]))
job_wall = sum(_ts(j["completionTime"]) - _ts(j["submissionTime"])
               for j in jobs)
gaps = []
for a, b in zip(jobs, jobs[1:]):
    g = _ts(b["submissionTime"]) - _ts(a["completionTime"])
    if g > 0:
        gaps.append((a["jobId"], b["jobId"], round(g, 2)))
gap_s = sum(g for _, _, g in gaps)

print(json.dumps({
    "cpus": cpus, "replicas": replicas, "pages": n_pages,
    "clusters": n_clusters, "cc_iterations": res.cc_iterations,
    "wall_s": round(wall, 1),
    "n_jobs": len(jobs), "n_stages": len(stages),
    "executor_run_s": round(run_s, 1),
    "executor_cpu_s": round(cpu_s, 1),
    "parallel_bound_s": round(run_s / cpus, 1),
    "sum_job_wall_s": round(job_wall, 1),
    "inside_job_slack_s": round(job_wall - run_s / cpus, 1),
    "between_job_gap_s": round(max(wall - job_wall, 0), 1),
    "top_gaps": sorted(gaps, key=lambda x: -x[2])[:12],
}, indent=1))
spark.stop()
