"""Per-stage wall times at a given core count (for scaling diagnosis).
Usage: python tools/profile_scaling.py <cpus> <replicas>"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from wdd.session import get_spark
from wdd.sources.pages import synth_pages
from wdd.pipeline import run_dedup_pipeline
import bench

cpus, reps = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark("profile", cpus=cpus,
                  extra_conf={"spark.sql.shuffle.partitions": str(max(32, 2*cpus))})
spark.sparkContext.setLogLevel("ERROR")
pages, _ = synth_pages(spark, "/root/testdata/sf0.1")
pages = bench._replicate_pages(pages, reps).localCheckpoint(eager=True)
n = pages.count()
warm = run_dedup_pipeline(spark, pages.limit(300))
warm.clusters.write.format("noop").mode("overwrite").save()
t0 = time.monotonic()
res = run_dedup_pipeline(spark, pages)
res.clusters.select("cluster_id").distinct().count()
total = time.monotonic() - t0
print(f"RESULT cpus={cpus} reps={reps} pages={n} total={total:.1f}s "
      f"pps={n/total:.0f} cc={res.cc_iterations}")
for r in res.metrics.records:
    print(f"  {r.stage:18s} {r.wall_ms/1000:8.2f}s rows={r.rows_out}")
