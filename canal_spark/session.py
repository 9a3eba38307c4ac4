"""SparkSession factory with scale-aware defaults.

Local mode is a correctness/scaling proxy; the configs below are chosen so
the same plan shapes survive a multi-executor cluster at 100 TB:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (every custom compute path is a vectorized pandas UDF,
  per input_hint /root/repo/BASELINE.json:15 — no per-row Python anywhere),
- shuffle partitions sized to cores locally (would be ~2-3x total cores on a
  real cluster; every engine entry point takes an explicit parallelism knob).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "canal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("CANAL_SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # joins (guide §3.1/§9): let the planner pick shuffled-hash
        # over sort-merge when the per-partition build side fits, and
        # let AQE rewrite SMJ -> SHJ from runtime stats. Both are
        # size-gated (no OOM regime change) and env-overridable for
        # clusters that want the sort-merge default back.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("CANAL_SPARK_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("CANAL_SPARK_SHJ_LOCAL_MAP", "64m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("CANAL_SPARK_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
