from pyspark.sql import functions as F

from wdd.config import WddConfig
from wdd.sources.ingest import no_capture_sentinels, normalize_pages


def test_normalize_pages(spark):
    rows = [
        ("http://example.com/a b", "2019-01-01 00:00:00", b"<p>x</p>", "text/html"),
        ("not a url", "2019-01-01 00:00:00", b"<p>y</p>", "text/html"),
        ("http://ok.com/big", "2019-01-01 00:00:00", b"Z" * 100, "text/html"),
        ("http://img.com/x", "2019-01-01 00:00:00", b"\x89PNG", "image/png"),
    ]
    df = spark.createDataFrame(rows, ["url", "ts", "html", "mime"]) \
        .withColumn("warc_ts", F.to_timestamp("ts"))
    cfg = WddConfig(max_capture_bytes=10)
    out = normalize_pages(df, cfg, mime_col="mime").collect()
    urls = {r.url for r in out}
    assert "http://example.com/a%20b" in urls          # url_fix percent-encodes
    assert not any("not a url" in u for u in urls)     # invalid dropped
    assert not any("img.com" in u for u in urls)       # mime filtered
    big = next(r for r in out if "ok.com" in r.url)
    assert len(big.html) == 10                         # truncated


def test_no_capture_sentinels(spark):
    index = spark.createDataFrame(
        [("com,example)/", "20140202131837", "abc=")],
        "surt_key string, ts14 string, simhash_b64 string")
    requests = spark.createDataFrame(
        [("com,example)/", 2014), ("com,example)/", 2015),
         ("com,other)/", 2014)],
        "surt_key string, year int")
    out = {(r.surt_key, r.ts14, r.simhash_b64)
           for r in no_capture_sentinels(requests, index).collect()}
    assert out == {("com,example)/", "2015", "-1"),
                   ("com,other)/", "2014", "-1")}
