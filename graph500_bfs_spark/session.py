"""SparkSession factory.

Local-mode defaults sized for the sandbox (local[32], 128 GiB); on a real
cluster every knob here is overridable via ``extra_conf`` / spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "graph500_bfs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with Arrow + AQE enabled.

    Arrow is mandatory: every custom operator in this engine moves batches
    through ``mapInArrow`` / ``applyInPandas`` (north rule: no per-row Python).
    AQE handles runtime join-strategy switching (broadcast when a frontier
    is small — the Spark analog of the reference's bitmap<->list switch,
    /root/reference/mpi/bfs.hpp:3441-3456).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    sp = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # MS-BFS collects every superstep's frontier through the driver
        # (the allgather role); a 64-root scale-22 step exceeds the 1g default
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_GRAFT_MAX_RESULT", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # iterative drivers create a broadcast + checkpoint per superstep;
        # reclaim them promptly instead of the 30-minute default
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if spark.conf.get("spark.graft.warmed", None) != "true":
        # one tiny shuffle+aggregate job at session build: spins up executor
        # threads, the shuffle machinery and whole-stage-codegen JIT ONCE,
        # instead of inside whatever query happens to run first (measured
        # ~3 s of first-action warmup on this box — environment bootstrap,
        # not query work; guide §1 says time the computation)
        from pyspark.sql import functions as F

        (
            spark.range(32 * 1024)
            .select((F.col("id") % 257).alias("k"), "id")
            .groupBy("k")
            .agg(F.sum("id"))
            .collect()
        )
        spark.conf.set("spark.graft.warmed", "true")
    return spark
