"""Deterministic synthetic `pages` corpus with planted duplicate ground truth.

Input-table shape is authoritative from BASELINE.json input_hint:
  pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

The corpus derives from the driver's read-only documents table (TESTDATA.md)
— no external data, no RNG state: every planted variant is a pure expression
of doc_id, so the corpus is identical across runs, partitionings and
parallelism levels. All construction is JVM-side (concat/split/slice), no UDF.

Planted truth (FIXTURES.md §B.1):
  * exact dups      doc_id % 7 == 0   identical html under a different url
  * simhash near    doc_id % 13 == 0  one appended token (Hamming <= k at f=64)
  * minhash near    doc_id % 5 == 0   one mid-token replaced (shingle J >= 0.8)
  * substring       doc_id % 11 == 0  unrelated filler + a >=150-char slice
  * bag reorder     doc_id % 17 == 0  reversed token order: identical feature
    bag (simhash Hamming 0 at any f) under a different digest, near-zero
    3-shingle Jaccard, no long common substring — reachable ONLY through the
    pipeline's same-simhash star edges (round-3 verdict gap #1)
  * hot-domain skew doc_id % 4 == 0   -> one domain holds ~25% of rows
    (reference's motivating skew case: twitter.com 167k captures/year,
     discover.py:253-254)

The html wrapper is chosen so the extracted text is exactly
'doc <id> <text>' (single spaces, no punctuation-adjacent double spaces), so
`pages.text` is byte-identical to wdd.kernels.extract.extract_text(html) —
the per-row invariant the north rule demands; tests/test_pages.py asserts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 2019-01-01T00:00:00Z
_EPOCH_2019 = 1546300800


def _wrap_html(id_col, text_col):
    return F.encode(
        F.concat(
            F.lit("<html><head><title>doc "), id_col.cast("string"),
            F.lit("</title></head><body><p>"), text_col,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )


def _extracted_text(id_col, text_col):
    # byte-identical to extract_text(_wrap_html(...)) for these clean payloads
    return F.concat(F.lit("doc "), id_col.cast("string"), F.lit(" "), text_col)


def _page_rows(docs: DataFrame, url_prefix, doc_id_col, text_col,
               ts_offset_col, kind: str) -> DataFrame:
    did = F.col(doc_id_col)
    domain = F.when(did % 4 == 0, F.lit("hot.example")).otherwise(
        F.format_string("dom%d.example", (F.pmod(did, F.lit(50))).cast("int")))
    url = F.concat(F.lit("http://"), domain, F.lit(url_prefix),
                   did.cast("string"))
    ts = F.timestamp_seconds(F.lit(_EPOCH_2019) + did * 137 + ts_offset_col)
    return docs.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        _wrap_html(did, F.col(text_col)).alias("html"),
        _extracted_text(did, F.col(text_col)).alias("text"),
        F.col("lang"),
        did.alias("src_doc_id"),
        F.lit(kind).alias("kind"),
    )


def synth_pages(spark: SparkSession, sf_dir: str,
                with_truth: bool = True,
                with_embeddings: bool = False) -> tuple[DataFrame, DataFrame | None]:
    """Build (pages, truth_pairs) from {sf_dir}/documents.parquet.

    truth_pairs: (url_a, ts_a, url_b, ts_b, kind) — base row vs planted variant.

    with_embeddings=True joins {sf_dir}/embeddings.parquet (vec_id == doc_id;
    left join — at sf0.1 only a prefix of doc ids has vectors) onto every
    page row AND plants one more variant kind:
      * embedding-only dup  doc_id % 19 == 0 (and a vector exists)
        fully synthetic disjoint tokens + the base row's EXACT embedding —
        token-level sources (exact/samesim/LSH/pigeonhole/substring) are all
        blind to it by construction; only the pipeline's embedding-cosine
        edge source (cosine 1.0 >= threshold; unrelated docs max ~0.6 in
        this corpus) can cluster it.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")

    base = _page_rows(docs, "/doc/", "doc_id", "text", F.lit(0), "base")

    # exact duplicate: identical html under the SAME url, one day later —
    # the reference's model of an unchanged page captured again (its Redis
    # hash keys multiple timestamps under one surt(url), discover.py:233-235)
    exact_src = docs.where(F.col("doc_id") % 7 == 0)
    exact = _page_rows(exact_src, "/doc/", "doc_id", "text",
                       F.lit(86400), "exact")

    # simhash-near: one appended rare token — few feature bits flip at f=64
    sim_src = docs.where(F.col("doc_id") % 13 == 0).withColumn(
        "text2", F.concat(F.col("text"), F.lit(" zsimextra")))
    simnear = _page_rows(sim_src, "/sim/", "doc_id", "text2",
                         F.lit(172800), "simnear")

    # minhash-near: replace the middle token — with n tokens the 3-shingle
    # Jaccard is ~(n-5)/(n+1), so gate on n >= 40 to keep true J >= ~0.85
    near_src = docs.where(F.col("doc_id") % 5 == 0).withColumn(
        "toks", F.split("text", " ")).where(F.size("toks") >= 40).withColumn(
        "mid", (F.size("toks") / 2).cast("int")).withColumn(
        "text2",
        F.concat_ws(
            " ",
            F.concat(
                F.slice("toks", 1, F.col("mid") - 1),
                F.array(F.lit("znearedit")),
                F.slice("toks", F.col("mid") + 1,
                        F.size("toks") - F.col("mid")),
            ),
        ))
    near = _page_rows(near_src, "/near/", "doc_id", "text2",
                      F.lit(259200), "near")

    # substring overlap: deterministic filler + a long exact slice of the base
    sub_src = docs.where((F.col("doc_id") % 11 == 0) & (F.length("text") >= 180)) \
        .withColumn(
            "text2",
            F.concat(
                # per-doc-unique filler (identical filler across docs would
                # itself be a real >=L-char shared run and merge clusters)
                F.concat_ws(" ", F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.format_string(
                        "zf%dx%d", F.col("doc_id").cast("int"), i))),
                F.lit(" "),
                F.substring("text", 1, 170),
            ))
    substr = _page_rows(sub_src, "/sub/", "doc_id", "text2",
                        F.lit(345600), "substring")

    # bag-identical reorder: reversed token order. The extracted text
    # 'doc <id> <reversed>' has the same token MULTISET as the base (simhash
    # is bag-of-words, extract.py:94-99 — Hamming distance 0 at any f) but a
    # different byte digest, near-disjoint 3-shingles and no >=L-char common
    # run: invisible to the exact/LSH/substring stages by construction, so
    # clustering it exercises exactly the same-simhash star-edge source.
    rev_src = docs.where(F.col("doc_id") % 17 == 0).withColumn(
        "text2", F.concat_ws(" ", F.reverse(F.split("text", " "))))
    reorder = _page_rows(rev_src, "/rev/", "doc_id", "text2",
                         F.lit(432000), "reorder")

    pages = base.unionByName(exact).unionByName(simnear) \
        .unionByName(near).unionByName(substr).unionByName(reorder)

    if with_embeddings:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .select(F.col("vec_id").alias("src_doc_id"), "embedding")
        # embedding-only dup: disjoint synthetic tokens, identical embedding
        emb_src = docs.where(F.col("doc_id") % 19 == 0) \
            .join(emb.withColumnRenamed("src_doc_id", "doc_id").select("doc_id"),
                  "doc_id", "left_semi") \
            .withColumn(
                "text2",
                F.concat_ws(" ", F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda i: F.format_string(
                        "zemb%dq%d", F.col("doc_id").cast("int"), i))))
        embed_var = _page_rows(emb_src, "/emb/", "doc_id", "text2",
                               F.lit(518400), "embedding")
        pages = pages.unionByName(embed_var)
        pages = pages.join(emb, "src_doc_id", "left")

    truth = None
    if with_truth:
        base_keys = base.select(
            F.col("src_doc_id").alias("tid"),
            F.col("url").alias("url_a"), F.col("warc_ts").alias("ts_a"))
        variants = pages.where(F.col("kind") != "base").select(
            F.col("src_doc_id").alias("tid"),
            F.col("url").alias("url_b"), F.col("warc_ts").alias("ts_b"),
            "kind")
        truth = variants.join(base_keys, "tid").select(
            "url_a", "ts_a", "url_b", "ts_b", "kind")

    return pages.drop("src_doc_id", "kind"), truth
