"""Incremental ingest: availableNow stream over pages parquet produces the
same simhashes as the batch stage, and a rerun with the same checkpoint
ingests nothing new (exactly-once file progress)."""
import os

from pyspark.sql import functions as F

from wdd.sources.pages import synth_pages
from wdd.streaming.ingest import run_incremental_simhash


def test_incremental_ingest_matches_batch(spark, sf_dir, tmp_path):
    pages, _ = synth_pages(spark, sf_dir, with_truth=False)
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages.limit(80).write.parquet(pages_dir)

    run_incremental_simhash(spark, pages_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    n1 = got.count()
    assert n1 == 80
    assert set(got.columns) == {"url", "warc_ts", "digest", "page_id",
                                "simhash64", "signature"}

    # batch equivalence on a sample
    from wdd.streaming.ingest import _signature_batch
    batch = _signature_batch(spark.read.parquet(pages_dir))
    b = {r.page_id: r.simhash64 for r in batch.collect()}
    s = {r.page_id: r.simhash64 for r in got.collect()}
    assert b == s

    # rerun: checkpoint prevents reprocessing
    run_incremental_simhash(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1


def _write_event_file(path, rows, spark, mtime):
    """One bare parquet FILE at `path` (the file stream source does not
    recurse into per-write subdirectories), mtime pinned so
    maxFilesPerTrigger=1 drains the files in deterministic order."""
    import os
    import shutil
    import tempfile
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.mode("overwrite").parquet(td + "/p")
        part = next(f for f in os.listdir(td + "/p")
                    if f.endswith(".parquet"))
        shutil.copy(os.path.join(td, "p", part), str(path))
    os.utime(path, (mtime, mtime))


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Watermarked tumbling windows over a multi-batch file stream: on-time
    windows finalize with exact counts, a row later than the watermark is
    DROPPED (its already-finalized window is not revised), and a window the
    final watermark never passes is withheld — the state-eviction contract
    that lets the aggregation run forever at cluster scale."""
    from datetime import datetime as dt
    from wdd.streaming.windows import windowed_event_counts
    src = tmp_path / "events"
    src.mkdir()
    t = lambda h, m: dt(2024, 3, 1, h, m)
    _write_event_file(src / "f1.parquet",
                      [(1, t(12, 0), 1.0), (1, t(12, 5), 1.0),
                       (1, t(12, 40), 1.0)], spark, 1000)   # wm -> 12:30
    _write_event_file(src / "f2.parquet",
                      [(1, t(13, 20), 1.0)], spark, 2000)   # wm -> 13:10
    # f3's 12:03 row is LATE by two batches: its window [12:00,12:10) was
    # finalized+evicted when the watermark passed 12:30, so the stateful op
    # must DROP it (not re-open the window) — the state-eviction contract.
    _write_event_file(src / "f3.parquet",
                      [(1, t(12, 3), 1.0), (1, t(14, 0), 1.0)], spark, 3000)
    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (windowed_event_counts(stream, window="10 minutes",
                               watermark="10 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName("winagg").option(
             "checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM winagg").collect()
    got = {(r.win_start.hour, r.win_start.minute): r.n_events for r in rows}
    assert len(rows) == 3             # no duplicate/reopened windows
    assert got[(12, 0)] == 2          # late 12:03 row NOT counted
    assert got[(12, 40)] == 1 and got[(13, 20)] == 1
    assert (14, 0) not in got         # final watermark never passed 14:10


def test_sessionize_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: state carries across file-
    stream batches (a gap closes a session exactly once), and the event-time
    timeout flushes idle sessions when the watermark passes — sessions still
    inside the watermark remain open and unemitted."""
    from datetime import datetime as dt
    from wdd.streaming.windows import sessionize
    src = tmp_path / "events"
    src.mkdir()
    t = lambda h, m: dt(2024, 3, 1, h, m)
    _write_event_file(src / "f1.parquet", [(1, t(12, 0), 1.0), (1, t(12, 2), 1.0),
                                   (2, t(12, 0), 1.0)], spark, 1000)
    _write_event_file(src / "f2.parquet", [(1, t(12, 30), 1.0),
                                   (9, t(15, 0), 1.0)], spark, 2000)
    _write_event_file(src / "f3.parquet", [(9, t(15, 30), 1.0)], spark, 3000)
    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (sessionize(stream, gap_seconds=600, watermark="30 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName("sessions").option(
             "checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_start.strftime("%H:%M"),
            r.session_end.strftime("%H:%M"), r.n_events)
           for r in spark.sql("SELECT * FROM sessions").collect()}
    assert (1, "12:00", "12:02", 2) in got   # closed by the 12:30 gap
    assert (1, "12:30", "12:30", 1) in got   # flushed by event-time timeout
    assert (2, "12:00", "12:00", 1) in got   # flushed by event-time timeout
    assert (9, "15:00", "15:00", 1) in got   # closed by the 15:30 gap
    # user 9's session opened at 15:30 is still inside the watermark
    # (timeout 15:40 > final wm 15:00) -> open, unemitted at drain end
    assert not any(u == 9 and s == "15:30" for (u, s, *_rest) in got)
    assert len(got) == 4


def test_incremental_ingest_f256_matches_batch(spark, sf_dir, tmp_path):
    """The streaming signature stage at the reference's PROD width (f=256,
    conf.yml.example:2): wide sim_parts column end-to-end, value-identical
    to the batch-path signature stage."""
    from wdd.config import WddConfig
    from wdd.streaming.ingest import _signature_batch

    cfg = WddConfig(simhash_size=256)
    pages, _ = synth_pages(spark, sf_dir, with_truth=False)
    pages_dir = str(tmp_path / "pages")
    pages.limit(40).write.parquet(pages_dir)

    run_incremental_simhash(spark, pages_dir, str(tmp_path / "out"),
                            str(tmp_path / "ckpt"), cfg=cfg)
    got = spark.read.parquet(str(tmp_path / "out"))
    assert set(got.columns) == {"url", "warc_ts", "digest", "page_id",
                                "sim_parts", "signature"}
    rows = got.collect()
    assert rows and all(len(r.sim_parts) == 4 for r in rows)  # 4x64-bit words

    batch = _signature_batch(spark.read.parquet(pages_dir), cfg)
    b = {r.page_id: tuple(r.sim_parts) for r in batch.collect()}
    s = {r.page_id: tuple(r.sim_parts) for r in rows}
    assert b == s


def test_streaming_ledger_reconcile_crash_resume(spark, tmp_path):
    """Crash-resume through the streaming sink: a run that died after
    submitting its jobs but before the stage manifest leaves 'running'
    rows; the next drain writes the manifest and reconcile converges the
    ledger to 'done' — end-to-end, no coordinator."""
    from pyspark.sql import functions as F
    from wdd.checkpoint import StageStore
    from wdd.jobs import JobLedger

    from datetime import datetime
    ts = datetime(2024, 3, 1)
    pages = spark.createDataFrame(
        [(f"http://s{i}.example/", ts,
          bytearray(b"<html><body><p>w" + str(i).encode() + b"</p></body></html>"),
          f"w{i}", "en") for i in range(6)],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    pages_dir = str(tmp_path / "pages")
    pages.write.parquet(pages_dir)

    ledger = JobLedger(tmp_path / "jobs", spark)
    store = StageStore(tmp_path / "store", spark)

    # simulate the crashed run: jobs submitted (running), no manifest
    ledger.submit(
        pages.select("url", F.year("warc_ts").cast("string").alias("year")),
        stage="ingest_1")
    assert ledger.status("http://s0.example/", 2024) == "running"

    run_incremental_simhash(spark, pages_dir, str(tmp_path / "out"),
                            str(tmp_path / "ckpt"),
                            ledger=ledger, store=store, stage="ingest_1")
    assert spark.read.parquet(str(tmp_path / "out")).count() == 6
    assert ledger.status("http://s0.example/", 2024) == "done"

    # second drain: checkpoint ingests nothing, ledger stays converged
    run_incremental_simhash(spark, pages_dir, str(tmp_path / "out"),
                            str(tmp_path / "ckpt"),
                            ledger=ledger, store=store, stage="ingest_1")
    assert spark.read.parquet(str(tmp_path / "out")).count() == 6
    assert ledger.status("http://s5.example/", 2024) == "done"


def test_streaming_ledger_requires_stage_and_store(spark, tmp_path):
    """A ledger submit without the stage/store pair would strand 'running'
    rows forever (reconcile filters stage IS NOT NULL) — rejected at entry."""
    import pytest
    from wdd.jobs import JobLedger

    ledger = JobLedger(tmp_path / "jobs", spark)
    with pytest.raises(ValueError, match="stage"):
        run_incremental_simhash(spark, str(tmp_path / "pages"),
                                str(tmp_path / "out"), str(tmp_path / "ckpt"),
                                ledger=ledger)


def test_streaming_manifest_dedups_replayed_batches(spark, tmp_path):
    """foreachBatch + append parquet is at-least-once: a crash between batch
    write and checkpoint commit replays the batch, duplicating sink rows.
    The stage manifest must freeze the exactly-once view (page_id, digest)."""
    from datetime import datetime

    from wdd.checkpoint import StageStore
    from wdd.jobs import JobLedger

    ts = datetime(2024, 3, 1)
    pages = spark.createDataFrame(
        [(f"http://d{i}.example/", ts,
          bytearray(b"<html><body><p>w" + str(i).encode() + b"</p></body></html>"),
          f"w{i}", "en") for i in range(5)],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    pages.write.parquet(pages_dir)

    # simulate a replayed batch already sitting in the sink directory
    from wdd.streaming.ingest import _signature_batch
    _signature_batch(spark.read.parquet(pages_dir)) \
        .write.mode("append").parquet(out_dir)

    ledger = JobLedger(tmp_path / "jobs", spark)
    store = StageStore(tmp_path / "store", spark)
    run_incremental_simhash(spark, pages_dir, out_dir,
                            str(tmp_path / "ckpt"),
                            ledger=ledger, store=store, stage="ingest_1")

    # sink keeps the at-least-once contract (replay + drain = 10 rows);
    # the manifest view is exactly-once
    assert spark.read.parquet(out_dir).count() == 10
    assert store.load("ingest_1").count() == 5
