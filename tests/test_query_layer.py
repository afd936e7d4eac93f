"""Query-layer parity with the reference's store/lookup semantics.

The SAMPLE_REDIS_CONTENT fixture and the parametrized expectations are ported
verbatim from the reference tests/test_util.py:7-109; the store here is the
simhash_index DataFrame instead of a Redis hash."""
import pytest
from pyspark.sql import functions as F

from wdd.operators.lookup import (
    CAPTURE_NOT_FOUND,
    NO_CAPTURES,
    NOT_CAPTURED,
    compress_captures,
    compress_captures_df,
    timestamp_simhash,
    year_simhash,
)
from wdd.operators.windows import collapse_timestamp, paginate

SAMPLE_CONTENT = {
    'com,example)/': {
        '20141021062411': 'o52rOf0Hi2o=',
        '20140202131837': 'og2jGKWHsy4=',
        '20140824062257': 'o52jPP0Hg2o=',
        '20160824062257': 'o52jPP0Hg2o=',
    },
    'com,other)/': {'2014': '-1'},
    'org,nonexistingdomain)/': {'1999': '-1'},
}


@pytest.fixture(scope="module")
def index(spark):
    rows = [(k, ts, sim) for k, d in SAMPLE_CONTENT.items()
            for ts, sim in d.items()]
    return spark.createDataFrame(
        rows, "surt_key string, ts14 string, simhash_b64 string").cache()


@pytest.mark.parametrize('url,timestamp,simhash', [
    ('http://example.com', '20141021062411', 'o52rOf0Hi2o='),
    ('http://example.com', '2014102', None),
    ('http://other.com', '20141021062411', None),
])
def test_timestamp_simhash(index, url, timestamp, simhash):
    res = timestamp_simhash(index, url, timestamp)
    if simhash:
        assert res == {'simhash': simhash}
    elif url == 'http://other.com':
        assert res == NO_CAPTURES
    else:
        assert res == CAPTURE_NOT_FOUND


@pytest.mark.parametrize('url,year,count', [
    ('http://example.com', '2014', 3),
    ('http://example.com', '2016', 1),
    ('http://example.com', '2017', None),
    ('http://example.com', '', None),
    ('http://other.com', '2014', None),
])
def test_year_simhash(index, url, year, count):
    res = year_simhash(index, url, year)
    if isinstance(res, dict):
        if year == '2014':
            assert res == NO_CAPTURES
        else:
            assert res == NOT_CAPTURED
    if count:
        assert len(res[0]) == count
        assert res[1] == count


def test_year_simhash_pagination(index):
    res = year_simhash(index, 'http://example.com', '2014',
                       page=1, snapshots_per_page=2)
    rows, total = res
    assert rows[0] == ["pages", 2]
    assert len(rows) == 3  # header + 2 rows
    assert total == 3
    res2 = year_simhash(index, 'http://example.com', '2014',
                        page=99, snapshots_per_page=2)  # clamped to last page
    assert res2[0][0] == ["pages", 2]
    assert len(res2[0]) == 2  # header + 1 row


def test_compress_captures_reference_docstring_example():
    # exact example from reference util.py:118-123
    captures = [["20130603143716", "NRyJrLc2FWA="],
                ["20130402202841", "FT6d7Jc3vWA="]]
    new_captures, hashes = compress_captures(captures)
    assert hashes == ['NRyJrLc2FWA=', 'FT6d7Jc3vWA=']
    assert new_captures == [[2013, [6, [3, ['143716', 0]]],
                                   [4, [2, ['202841', 1]]]]]


def test_compress_captures_dedups_hash_ids():
    captures = [["20140101000000", "A="], ["20140102000000", "B="],
                ["20140103000000", "A="]]
    _, hashes = compress_captures(captures)
    assert hashes == ["A=", "B="]


def test_compress_captures_df(index, spark):
    out = compress_captures_df(index.where(F.col("ts14") != "2014"))
    rows = out.where(F.col("surt_key") == 'com,example)/').collect()
    ymd = {(r.year, r.month, r.day) for r in rows}
    assert (2014, 10, 21) in ymd and (2016, 8, 24) in ymd
    # dup content across years shares one hash_id
    ids = {r.ts14: None for r in index.collect()}
    flat = {c.hash_id for r in rows for c in r.captures}
    assert len(flat) == 3  # 4 captures, 3 distinct simhashes


def test_collapse_timestamp(spark):
    df = spark.createDataFrame(
        [("u", "2019-01-01 10:00:00"), ("u", "2019-01-01 10:59:00"),
         ("u", "2019-01-01 13:00:00"), ("v", "2019-01-01 10:30:00")],
        ["url", "ts"]).withColumn("warc_ts", F.to_timestamp("ts"))
    out = collapse_timestamp(df, "warc_ts", ["url"], prefix=10)  # hour buckets
    got = {(r.url, str(r.warc_ts)) for r in out.collect()}
    assert got == {("u", "2019-01-01 10:00:00"), ("u", "2019-01-01 13:00:00"),
                   ("v", "2019-01-01 10:30:00")}


def test_paginate(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    out = paginate(df, ["k"], page=3, per_page=10).collect()
    assert [r.k for r in out] == list(range(20, 30))
    assert [r.rn for r in out] == list(range(21, 31))


def test_capture_diff_matrix(spark, sf_dir):
    from wdd.operators.lookup import capture_diff_matrix
    from wdd.pipeline import build_simhash_index
    from wdd.sources.pages import synth_pages
    from wdd.streaming.ingest import _signature_batch
    pages, _ = synth_pages(spark, sf_dir, with_truth=False)
    sims = _signature_batch(pages)
    idx = build_simhash_index(sims)
    out = capture_diff_matrix(idx, "http://hot.example/doc/0", "2019").collect()
    # doc 0 is 7-divisible -> base + exact-dup capture of the same url
    assert len(out) == 1
    assert out[0].hamming == 0  # identical content -> identical simhash
