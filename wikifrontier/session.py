"""SparkSession factory with engine-wide tuning.

Session TZ is America/New_York for parity with the reference's
``get_timestamp_eastern_time`` (shared/utils.py:17-22). AQE is on so skew
joins / partition coalescing are handled at runtime; the runtime Bloom
filter covers part of the seen-set pre-filter (SURVEY.md §4.2).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Make the wikifrontier package importable on executors regardless of
    the driver's cwd — the local-mode equivalent of spark-submit --py-files
    (north_rule). Idempotent per session."""
    if getattr(spark, "_wikifrontier_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "wikifrontier_pyfiles.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    spark._wikifrontier_shipped = True


def get_spark(
    master: str | None = None,
    app_name: str = "wikifrontier",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "8192"),
        )
        # explicit: long-lived Python UDF workers across tasks — the
        # parse UDF dominates the round, so worker spin-up would
        # otherwise recur per task (default is true; pinned because the
        # scaling bench depends on it)
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.executor.memory", os.environ.get("SPARK_EXECUTOR_MEMORY", "8g"))
        # UI off by default (test/bench noise); SPARK_GRAFT_UI=true turns
        # it on for runs that read the REST status API (the scaling
        # bench's shuffle local/remote attribution)
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # the bench's executor-CPU-time twin metric diffs the SUM over the
        # REST API's completed-stage list; a 12-round crawl emits hundreds
        # of stages, so default retention (1000) can evict stages BETWEEN
        # the before/after samples and corrupt the delta — retain enough
        # for a full best-of-N crawl leg
        .config("spark.ui.retainedStages", "20000")
        .config("spark.ui.retainedJobs", "20000")
    )
    # Multi-executor-per-node topology fix: an executor JVM sizes its GC /
    # JIT / ForkJoin thread pools to the MACHINE's core count, not its task
    # slots, so E colocated executors spawn E×ncores GC threads and
    # oversubscribe the box during any collection. Standard operator fix is
    # -XX:ActiveProcessorCount=<cores-per-executor> via extraJavaOptions —
    # plumbed here so the scaling bench (and any colocated deployment) can
    # set it per run.
    exec_opts = os.environ.get("SPARK_GRAFT_EXECUTOR_JAVA_OPTS")
    if exec_opts:
        builder = builder.config("spark.executor.extraJavaOptions", exec_opts)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def spread(df):
    """Rebalance a narrow scan to core-parallelism before CPU-amplifying
    work (shingle explode → sha256, vector folds, HTML render UDFs): a
    small-file parquet scan yields fewer split partitions than cores,
    and every downstream narrow op inherits that — measured 2 tasks on
    32 cores for the whole minhash stage at sf0.1 (one 580 KB file). The
    shuffle moves only the pre-amplification rows (KBs); the work it
    unlocks is ~100× that. No-op when the scan is already at least
    core-parallel — the 100 TB case, where file count supplies the
    parallelism and an unconditional repartition would instead COALESCE
    thousands of scan partitions."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
