"""Kafka-shaped bus edge: wire-format records -> typed changelog rows.

Canal's delivery story is an MQ topic of JSON messages
[C: connector/kafka-connector/.../CanalKafkaProducer.java ::
#send(MQDestination, ...); connector/core/.../MQMessageUtils.java ::
#messagePartition] — records carry (topic, partition, offset, key,
value). No broker exists in this sandbox, so this module implements the
two halves around the wire:

- `changelog_from_bus`: records whose `value` is a JSON changelog event
  -> typed rows via `from_json` with an EXPLICIT schema (never
  inference — a 100 TB inference pass is an extra scan and a drift
  hazard). This is the exact decode a `.format("kafka")` readStream
  needs; swap the source, keep the decode and the epoch kernel.
- `bus_records_from_changelog`: the producer-side encoder (tests and
  loopback drives): partition = source_partition, offset = lsn, key =
  doc_id — canal's pk-hash routing puts all events of one key in one
  partition, preserving per-key order.

Offset semantics downstream: the payload's (source_partition, lsn) IS
the source position; StreamingUpsert.apply_batch drops records at or
below the committed per-partition high-watermark, so bus redelivery
(at-least-once) lands exactly-once in the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from canal_spark.sources.changelog import CHANGELOG_DDL

#: wire `ts` is UTC epoch MICROSECONDS (int64): string timestamp
#: formats silently truncate to milliseconds through to_json, and
#: integer micros are the common Kafka payload convention anyway.
#: The changelog `ts` column is TIMESTAMP_NTZ (a wall clock); the wire
#: contract pins that wall clock to UTC via explicit NTZ epoch
#: arithmetic (timestampdiff/timestampadd against TIMESTAMP_NTZ
#: '1970-01-01') — NEVER via a cast through TIMESTAMP, which would
#: round-trip through spark.sql.session.timeZone and shift every
#: value when producer and consumer sessions disagree on timezone.
BUS_VALUE_DDL = CHANGELOG_DDL.replace("ts timestamp", "ts_us long")

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

#: Kafka record wire shape (what .format("kafka") yields after
#: CAST(value AS STRING))
BUS_RECORD_DDL = (
    "topic string, partition int, offset long, key string, value string, "
    "timestamp timestamp"
)


def changelog_from_bus(records: DataFrame, value_schema: str = BUS_VALUE_DDL) -> DataFrame:
    """Decode bus records into typed changelog rows. Corrupt /
    non-JSON values are dropped (PERMISSIVE from_json yields an
    all-null struct; a record without position or op is unusable),
    matching canal's skip-on-parse-error sink policy."""
    parsed = records.select(F.from_json(F.col("value"), value_schema).alias("r"))
    parsed = parsed.filter(
        F.col("r").isNotNull()
        & F.col("r.lsn").isNotNull()
        & F.col("r.source_partition").isNotNull()
        & F.col("r.op").isNotNull()
    )
    out_cols = [
        F.expr(f"timestampadd(MICROSECOND, r.ts_us, {_NTZ_EPOCH})").alias("ts")
        if c == "ts"
        else F.col(f"r.{c}")
        for c in CHANGELOG_DDL.replace(",", " ").split()[::2]
    ]
    return parsed.select(*out_cols)


def bus_records_from_changelog(df: DataFrame, topic: str = "canal.changes") -> DataFrame:
    """Encode changelog rows as bus records (producer side)."""
    payload_cols = [
        F.expr(
            f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, cast(ts as timestamp_ntz))"
        ).alias("ts_us")
        if c == "ts"
        else F.col(c)
        for c in df.columns
    ]
    return df.select(
        F.lit(topic).alias("topic"),
        F.col("source_partition").cast("int").alias("partition"),
        F.col("lsn").cast("long").alias("offset"),
        F.col("doc_id").alias("key"),
        F.to_json(F.struct(*payload_cols)).alias("value"),
        F.col("ts").alias("timestamp"),
    )
