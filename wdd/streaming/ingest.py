"""Incremental ingest via Structured Streaming (SURVEY.md §2.8).

The reference is task-queue incremental (Celery jobs per url/year,
web.py:121-123); semantically that's "new captures arrive, compute their
simhashes, append to the store". Here: a file-source stream over the pages
directory, trigger availableNow (drain-everything-then-stop — the batch-first
design), foreachBatch running the SAME deterministic signature stage as the
batch pipeline, appending to a parquet sink. Stream checkpointing gives
exactly-once file-level progress, replacing the reference's job-state
machinery; no watermarks/event-time windows are needed (the reference has no
late-data semantics — Redis TTL is operational, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wdd import udfs
from wdd.config import DEFAULT, WddConfig
from wdd.operators import dedup as D


def _signature_batch(batch: DataFrame, cfg: WddConfig = DEFAULT) -> DataFrame:
    wide = cfg.simhash_size != 64
    prepped = D.with_page_id(D.with_digest(batch))
    uniq = prepped.select("digest", "html").dropDuplicates(["digest"])
    # same fused one-Arrow-round signature UDF as the batch pipeline
    # (wdd/pipeline.py signatures stage) — identical kernels, so an
    # incremental drain and a batch run produce identical rows
    fused = udfs.make_signatures_udf(cfg.simhash_size, cfg.simhash_hash)
    sigs = uniq.select("digest", fused("html").alias("x")).select(
        "digest",
        F.col("x.sim_parts" if wide else "x.simhash64")
         .alias("sim_parts" if wide else "simhash64"),
        F.col("x.signature").alias("signature"),
    )
    return prepped.select("url", "warc_ts", "digest", "page_id") \
        .join(sigs, "digest")


def run_incremental_simhash(spark: SparkSession, pages_dir: str,
                            out_dir: str, checkpoint_dir: str,
                            schema: str | None = None,
                            cfg: WddConfig = DEFAULT,
                            ledger=None, store=None,
                            stage: str | None = None) -> None:
    """Drain all new page files into the simhashes sink, then stop.

    cfg selects the signature width (f=64 scalar `simhash64` vs wide
    `sim_parts` — the reference's prod f=256, conf.yml.example:2).

    Ledger wiring (crash-resume end-to-end): when `ledger`/`store`/`stage`
    are given, each micro-batch submits its (url, year) work to the
    JobLedger as 'running' before writing, and after the drain the stage
    manifest is materialized into the StageStore and `ledger.reconcile`
    transitions running->done. A run that crashed between submit and
    manifest leaves 'running' rows; the NEXT run's stream checkpoint skips
    already-ingested files while reconcile converges the ledger — no
    coordinator, same invariant as the batch pipeline's StageStore resume."""
    if ledger is not None and (store is None or stage is None):
        # a ledger submit without the stage/store pair would write 'running'
        # rows that reconcile() (which filters stage IS NOT NULL against the
        # stage manifest) can never transition to 'done' — permanently
        # blocking resubmission of those (url, year) jobs
        raise ValueError(
            "ledger wiring requires both store and stage: submitted rows "
            "are only reconciled to 'done' through the stage manifest")
    schema = schema or ("url string, warc_ts timestamp, html binary, "
                        "text string, lang string")
    stream = (spark.readStream.schema(schema).parquet(pages_dir))

    def _sink(batch: DataFrame, batch_id: int):
        if ledger is not None:
            ledger.submit(
                batch.select("url",
                             F.year("warc_ts").cast("string").alias("year")),
                stage=stage)
        out = _signature_batch(batch, cfg)
        out.write.mode("append").parquet(out_dir)

    (stream.writeStream
     .foreachBatch(_sink)
     .option("checkpointLocation", checkpoint_dir)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())

    if ledger is not None and store is not None and stage is not None:
        if not store.exists(stage):
            # foreachBatch + append parquet is at-least-once: a crash between
            # the batch write and the stream-checkpoint commit re-writes that
            # batch on resume, duplicating rows in out_dir. Dedup on the
            # (page_id, digest) identity when freezing the stage manifest so
            # duplicates never enter the store (the sink directory itself
            # keeps the at-least-once contract; readers needing exactly-once
            # go through the manifest).
            store.materialize(
                stage,
                spark.read.parquet(out_dir)
                .dropDuplicates(["page_id", "digest"]))
        ledger.reconcile(store)
