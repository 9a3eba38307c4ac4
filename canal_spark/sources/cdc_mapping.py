"""Mapping of the driver's `events` table onto the CDC data model.

The driver testdata's `events` table (event_id, ts, user_id,
event_type, value, props) doubles as a changelog stand-in
(FIXTURES.md §B): event_id -> lsn, user_id -> key, event_type ->
op class, props -> payload. The op mapping mirrors canal's event-type
taxonomy [C: protocol/.../EntryProtocol.proto :: EventType]:

    signup   -> INSERT      click -> UPDATE      purchase -> DELETE
    view     -> QUERY       (filtered like canal's filterQueryDml)
    error    -> HEARTBEAT   (liveness, suppressed at sink)

Every query built on this mapping keeps a 1:1 ANSI-SQL oracle — the
CASE ladder below is replicated verbatim in `oracle_sql()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_SQL_CASE = (
    "CASE event_type WHEN 'signup' THEN 'INSERT' WHEN 'click' THEN 'UPDATE' "
    "WHEN 'purchase' THEN 'DELETE' WHEN 'view' THEN 'QUERY' ELSE 'HEARTBEAT' END"
)

N_SOURCE_PARTITIONS = 8


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one driver table; `spread=True` additionally spreads an
    under-split scan.

    The testdata tables arrive as ONE small parquet file (one row
    group), so the scan plans as ONE task and every scan-side
    computation built on it — minhash folds, simhash bit aggregates,
    per-character winnowing md5s, to_json/from_json round-trips —
    serializes on a single core while the other 31 idle (guide §2.5
    "input skew", §6 input split size: a single-row-group file is
    unsplittable no matter the split config). With `spread=True`, one
    cheap round-robin repartition right after the read restores scan
    parallelism; queries whose per-row work dominates opt in, while
    cheap projections/aggregations keep the exchange-free single-task
    scan (the repartition costs a fixed ~0.1-0.3 s stage that a
    sub-second query cannot amortize — measured both ways in
    bench_out/, r6).

    Scale-adaptive, not local-tuned: the trigger is `scan splits <
    session default parallelism`, which a production-sized table
    (thousands of files/row groups) never hits — there the repartition
    is a no-op branch; when it does hit (a few huge unsplittable gzip
    files, one hot ingest file), repartitioning immediately after the
    read is exactly the guide's remedy. Round-robin repartition is
    deterministic under retries (sortBeforeRepartition, SPARK-23207),
    so results are stable; every declared query orders/aggregates with
    explicit keys, so row order never reaches an oracle."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def events_as_changelog(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """events -> (op, key, lsn, source_partition, ts, value, props)."""
    return load(spark, sf_dir, "events", spread=spread).select(
        F.expr(OP_SQL_CASE).alias("op"),
        F.col("user_id").alias("key"),
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % N_SOURCE_PARTITIONS).alias("source_partition"),
        "ts",
        "value",
        "props",
    )
