"""Idempotent job submission / active-task dedup (SURVEY.md §2.6).

Reference semantics being reproduced:
  * get_active_task (reference web.py:29-43): submitting (url, year) while
    an identical task is pending/started returns the EXISTING task instead
    of spawning a second one;
  * /job status polling (reference web.py:135-164): job id -> state.

Bulk Spark form: a ledger table of (job_id, url, year, status, seq) plus
ONE anti-join of the requested set against rows whose latest status blocks
resubmission — no driver-side loop, so a 10^8-row request backlog dedups at
shuffle speed. job_id is the deterministic md5(url|year): a resubmission
maps to the same id by construction (the bulk analog of the reference's
active-task lookup). Failed jobs do NOT block — resubmitting one runs it
again, matching the reference's FAILURE -> new task path.

The ledger is parquet-append with a monotone `seq` per write batch; latest
seq wins per job_id (a per-job window, the same shape as the collapse
operator). StageStore linkage: reconcile() marks running jobs done once
their stage manifest exists, so a crashed run resumes with the store and
the ledger converges without a coordinator.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wdd.checkpoint import StageStore

LEDGER_SCHEMA = ("job_id string, url string, year string, status string, "
                 "stage string, seq long")
BLOCKING = ("running", "done")


def job_id_col(url: str = "url", year: str = "year"):
    """Deterministic job identity — identical (url, year) always maps to the
    same id, in any engine (md5 of 'url|year')."""
    return F.md5(F.concat_ws("|", F.col(url), F.col(year)))


_STATUS_RANK = {"done": 3, "failed": 2, "running": 1}


def latest_status(ledger: DataFrame) -> DataFrame:
    """One row per job_id: the row with the highest seq (per-job window —
    partitioned, scales like any collapse).

    Deterministic under concurrent writers: `_next_seq` is read-max-then-
    append, so two racing submitters CAN allocate the same seq. Ties are
    broken by status rank (done > failed > running — a terminal state a
    racing writer recorded is never shadowed by a concurrent 'running'
    append), then url/year for a total order. Same-seq same-status
    duplicates collapse to one row either way."""
    rank = F.coalesce(
        *[F.when(F.col("status") == s, F.lit(r))
          for s, r in _STATUS_RANK.items()],
        F.lit(0))
    w = Window.partitionBy("job_id").orderBy(
        F.desc("seq"), rank.desc(), F.asc("url"), F.asc("year"))
    return (ledger.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def pending_work(requested: DataFrame, ledger: DataFrame,
                 blocking: tuple[str, ...] = BLOCKING) -> DataFrame:
    """The fresh subset of requested (url, year) work: one distinct + one
    anti-join against jobs whose latest status is in `blocking`."""
    blocked = (latest_status(ledger)
               .where(F.col("status").isin(*blocking))
               .select("url", "year"))
    return (requested.select("url", "year").dropDuplicates(["url", "year"])
            .join(blocked, ["url", "year"], "left_anti"))


class JobLedger:
    """Parquet-append job ledger with idempotent submission."""

    def __init__(self, root: str, spark: SparkSession):
        self.root = Path(root)
        self.spark = spark
        self.root.mkdir(parents=True, exist_ok=True)

    def _data_dir(self) -> Path:
        return self.root / "jobs"

    def read(self) -> DataFrame:
        d = self._data_dir()
        if not d.exists():
            return self.spark.createDataFrame([], LEDGER_SCHEMA)
        return self.spark.read.parquet(str(d))

    def _next_seq(self) -> int:
        cur = self.read().agg(F.max("seq").alias("m")).collect()[0].m
        return (cur or 0) + 1

    def submit(self, requested: DataFrame,
               stage: str | None = None) -> DataFrame:
        """Idempotent submit: dedups requested (url, year) against running/
        done jobs, appends ONLY the fresh ones as 'running', and returns
        them (empty result == everything was already submitted — the
        reference's get_active_task no-op path). `stage` optionally names
        the StageStore stage whose manifest marks these jobs done."""
        fresh = pending_work(requested, self.read())
        seq = self._next_seq()
        rows = (fresh
                .withColumn("job_id", job_id_col())
                .withColumn("status", F.lit("running"))
                .withColumn("stage", F.lit(stage))
                .withColumn("seq", F.lit(seq).cast("long"))
                .select("job_id", "url", "year", "status", "stage", "seq"))
        rows.write.mode("append").parquet(str(self._data_dir()))
        return self.read().where((F.col("seq") == seq)
                                 & (F.col("status") == "running"))

    def mark(self, jobs: DataFrame, status: str) -> None:
        """Append a status transition for every job in `jobs` (needs job_id,
        url, year, stage columns — e.g. the frame submit() returned)."""
        seq = self._next_seq()
        (jobs.select("job_id", "url", "year", "stage")
         .dropDuplicates(["job_id"])
         .withColumn("status", F.lit(status))
         .withColumn("seq", F.lit(seq).cast("long"))
         .select("job_id", "url", "year", "status", "stage", "seq")
         .write.mode("append").parquet(str(self._data_dir())))

    def reconcile(self, store: StageStore) -> int:
        """Mark running jobs done when their stage manifest exists in the
        store (resume path: a crashed run that DID materialize its stage is
        recognized as complete). Stage names are few — the distinct-stage
        collect is metadata-sized. Returns #jobs transitioned."""
        running = latest_status(self.read()).where(
            (F.col("status") == "running") & F.col("stage").isNotNull())
        stages = [r.stage for r in
                  running.select("stage").distinct().collect()]
        finished = [s for s in stages if store.exists(s)]
        if not finished:
            return 0
        done = running.where(F.col("stage").isin(finished))
        n = done.count()
        if n:
            self.mark(done, "done")
        return n

    def status(self, url: str, year) -> str | None:
        """Point status read (the reference's /job poll, web.py:135-164) —
        an API-sized collect at the serving boundary."""
        rows = (latest_status(self.read())
                .where((F.col("url") == url) & (F.col("year") == str(year)))
                .select("status").collect())
        return rows[0].status if rows else None
