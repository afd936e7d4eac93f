"""Ingest normalization for raw pages (reference write-path semantics).

Maps the reference's per-capture guards onto one declarative pass:
  * F2 url_fix before any processing        (discover.py:191)
  * F1 url validity filter                  (web.py:112-113 -> util.py:103-114)
  * O5 capture truncation to 1 MB           (discover.py:90,131)
  * F4 content-type predicate               (discover.py:134-137), expressed
    over the `lang`/mime hint column (the html column is already text/html by
    construction in this corpus; a real WARC ingest would filter on the
    record's Content-Type header column)
  * L1 CDX collapse (optional)              (discover.py:251-256)

Everything is built-ins except the two tiny string UDFs (url_fix / validity),
which run once per row at ingest — off the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wdd import udfs
from wdd.config import DEFAULT, WddConfig
from wdd.operators.windows import collapse_timestamp


def normalize_pages(pages: DataFrame, cfg: WddConfig = DEFAULT,
                    mime_col: str | None = None,
                    collapse: bool = False) -> DataFrame:
    out = (pages
           .withColumn("url", udfs.url_fix_udf("url"))
           .where(udfs.url_is_valid_udf("url"))
           .withColumn("html",
                       F.substring("html", 1, cfg.max_capture_bytes)))
    if mime_col is not None:
        m = F.lower(F.col(mime_col))
        out = out.where(m.contains("text") | m.contains("html"))
    if collapse:
        out = collapse_timestamp(out, "warc_ts", ["url"],
                                 prefix=cfg.collapse_ts_prefix)
    return out


def no_capture_sentinels(requests: DataFrame, index: DataFrame) -> DataFrame:
    """S4 bulk form: for requested (surt_key, year) pairs with no captures in
    the index, emit sentinel rows (ts14 = bare year, simhash_b64 = '-1') —
    the reference's hset(urlkey, year, -1) (discover.py:263-269)."""
    have = (index
            .select("surt_key",
                    F.substring("ts14", 1, 4).alias("year"))
            .dropDuplicates(["surt_key", "year"]))
    return (requests.select("surt_key", F.col("year").cast("string").alias("year"))
            .dropDuplicates(["surt_key", "year"])
            .join(have, ["surt_key", "year"], "left_anti")
            .select("surt_key",
                    F.col("year").alias("ts14"),
                    F.lit("-1").alias("simhash_b64")))
