"""In-flight progress surface (reference discover.py:214-227 + web.py:138-165).

The reference streams 'Processed i out of N captures.' from the Celery
worker while simhashing runs and serves PENDING/SUCCESS/error shapes from
/job?job_id; TrackedJob reproduces those shapes from Spark's status tracker.
"""

import time

import pytest
from pyspark.sql import functions as F

from wdd.progress import JobRegistry, TrackedJob


def _slow_action(spark, n_parts=8, delay=0.25):
    """An action whose tasks take long enough to observe mid-flight: one
    sleep per partition via a pandas UDF (Arrow-batched, one batch/task)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def slow_id(v: pd.Series) -> pd.Series:
        time.sleep(delay)
        return v

    df = (spark.range(0, n_parts * 10, 1, n_parts)
          .select(F.sum(slow_id(F.col("id"))).alias("s")))
    return lambda: df.collect()[0].s


def test_pending_then_success_with_item_scaling(spark):
    job = TrackedJob(spark, _slow_action(spark), total_items=480,
                     description="simhash the year")
    job.start()
    # poll until we catch it mid-run with at least one task landed
    saw_progress = None
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and not job.wait(0.05):
        st = job.status()
        assert st["job_id"] == job.job_id
        if st["status"] == "PENDING" and st["info"]:
            assert st["info"].startswith("Processed ")
            assert st["info"].endswith(" out of 480 captures.")
            saw_progress = st["info"]
    assert job.wait(30)
    assert saw_progress is not None, "never observed an in-flight poll"
    final = job.status()
    assert final["status"] == "SUCCESS"
    assert final["duration"] > 0
    assert job.result == sum(range(80))


def test_error_shape(spark):
    def boom():
        raise RuntimeError("CDX fetch failed")
    job = TrackedJob(spark, boom).start()
    assert job.wait(10)
    st = job.status()
    assert st == {"status": "error", "job_id": job.job_id,
                  "info": "CDX fetch failed"}


def test_registry_unknown_id_is_pending_like_celery(spark):
    reg = JobRegistry()
    assert reg.poll("deadbeef") == {"status": "PENDING",
                                    "job_id": "deadbeef", "info": None}
    assert reg.poll(None) == {"status": "error",
                              "info": "job_id param is required."}


def test_registry_tracks_and_polls(spark):
    reg = JobRegistry()
    job = reg.track(TrackedJob(spark, _slow_action(spark, n_parts=4,
                                                   delay=0.05)))
    assert reg.poll(job.job_id)["status"] in ("PENDING", "SUCCESS")
    assert job.wait(30)
    assert reg.poll(job.job_id)["status"] == "SUCCESS"


def test_cancel_interrupts_group(spark):
    job = TrackedJob(spark, _slow_action(spark, n_parts=8, delay=3.0)).start()
    # wait until the job actually has tasks on the cluster, then cancel
    deadline = time.monotonic() + 20
    while time.monotonic() < deadline:
        if job._task_progress()[1] > 0:
            break
        time.sleep(0.05)
    job.cancel()
    assert job.wait(30)
    st = job.status()
    # cancellation surfaces as the reference's error shape
    assert st["status"] == "error"
