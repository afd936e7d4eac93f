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
