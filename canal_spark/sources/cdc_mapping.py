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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_as_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (op, key, lsn, source_partition, ts, value, props)."""
    return load(spark, sf_dir, "events").select(
        F.expr(OP_SQL_CASE).alias("op"),
        F.col("user_id").alias("key"),
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % N_SOURCE_PARTITIONS).alias("source_partition"),
        "ts",
        "value",
        "props",
    )
