"""Idempotent job submission (reference web.py:29-43 get_active_task parity
at the bulk level): resubmission is a no-op, failures rerun, the StageStore
manifest completes jobs, and the status poll reads the latest transition."""
import pytest
from pyspark.sql import functions as F

from wdd.checkpoint import StageStore
from wdd.jobs import JobLedger, pending_work


@pytest.fixture()
def requested(spark):
    return spark.createDataFrame(
        [(f"http://site{i}.example/", "2024") for i in range(10)],
        "url string, year string")


def test_submit_then_resubmit_is_noop(spark, tmp_path, requested):
    led = JobLedger(tmp_path / "jobs", spark)
    first = led.submit(requested)
    assert first.count() == 10
    again = led.submit(requested)
    assert again.count() == 0          # all active -> reference no-op path
    # a NEW url in the same batch still runs
    mixed = requested.unionByName(spark.createDataFrame(
        [("http://new.example/", "2024")], "url string, year string"))
    third = led.submit(mixed)
    assert [r.url for r in third.collect()] == ["http://new.example/"]


def test_failed_jobs_rerun_and_done_jobs_do_not(spark, tmp_path, requested):
    led = JobLedger(tmp_path / "jobs", spark)
    sub = led.submit(requested)
    failed = sub.where(F.col("url").contains("site3"))
    done = sub.where(~F.col("url").contains("site3"))
    led.mark(failed, "failed")
    led.mark(done, "done")
    rerun = led.submit(requested)
    assert [r.url for r in rerun.collect()] == ["http://site3.example/"]
    assert led.status("http://site4.example/", 2024) == "done"
    assert led.status("http://site3.example/", 2024) == "running"  # rerunning
    assert led.status("http://absent.example/", 2024) is None


def test_reconcile_with_stage_store(spark, tmp_path, requested):
    led = JobLedger(tmp_path / "jobs", spark)
    store = StageStore(tmp_path / "store", spark)
    led.submit(requested, stage="sig_batch_1")
    assert led.reconcile(store) == 0   # manifest not written yet
    store.materialize("sig_batch_1", requested)   # the stage completes
    assert led.reconcile(store) == 10
    assert led.submit(requested).count() == 0     # done blocks resubmission
    assert led.status("http://site0.example/", "2024") == "done"


def test_pending_work_is_one_antijoin(spark, requested):
    """pending_work must not collect: its plan is a distinct + anti-join."""
    ledger = spark.createDataFrame(
        [("j1", "http://site1.example/", "2024", "done", None, 1),
         ("j2", "http://site2.example/", "2024", "failed", None, 1)],
        "job_id string, url string, year string, status string, "
        "stage string, seq long")
    out = pending_work(requested, ledger)
    assert out.count() == 9            # done blocks, failed does not
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_latest_status_deterministic_under_same_seq_race(spark, tmp_path,
                                                         requested):
    """Two racing writers can both read max(seq) and append the same seq
    (jobs.py _next_seq is read-max-then-append). latest_status must resolve
    the tie deterministically: terminal status outranks 'running'
    (done > failed > running), so the winner does not depend on parquet
    file scan order."""
    from wdd.jobs import latest_status

    led = JobLedger(tmp_path / "jobs", spark)
    sub = led.submit(requested)                     # seq=1, running

    def batch(status):
        return (sub.select("job_id", "url", "year", "stage")
                .withColumn("status", F.lit(status))
                .withColumn("seq", F.lit(2).cast("long"))
                .select("job_id", "url", "year", "status", "stage", "seq"))

    # racing writers: one marks done, one appends running, SAME seq
    batch("done").write.mode("append").parquet(str(led._data_dir()))
    batch("running").write.mode("append").parquet(str(led._data_dir()))

    for _ in range(3):   # stable across repeated evaluations
        ls = {r.url: r.status for r in latest_status(led.read()).collect()}
        assert set(ls.values()) == {"done"}
    # and the terminal state blocks resubmission
    assert led.submit(requested).count() == 0
