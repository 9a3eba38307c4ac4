"""Kafka-shaped source: JSON wire records -> from_json decode ->
the same apply_batch epoch kernel, with explicit offsets. Covers
roundtrip fidelity, out-of-order/overlapping redelivery, and a
restart-with-redelivery streaming drive over the bus format."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from canal_spark.plans.table import SnapshotTable
from canal_spark.sources.bus import (
    BUS_RECORD_DDL,
    bus_records_from_changelog,
    changelog_from_bus,
)
from canal_spark.streaming.stream import StreamingUpsert
from tests.conftest import assert_state_equals_oracle


def test_bus_roundtrip_is_lossless(spark, changelog_dir):
    ch = spark.read.parquet(changelog_dir)
    back = changelog_from_bus(bus_records_from_changelog(ch))
    assert back.columns == ch.columns
    assert back.count() == ch.count()
    assert back.exceptAll(ch).count() == 0 and ch.exceptAll(back).count() == 0


def test_bus_ts_roundtrip_is_timezone_independent(spark, changelog_dir):
    """Wire ts_us is UTC epoch micros pinned by NTZ arithmetic: a
    consumer session configured with a different timezone must decode
    the exact producer wall clocks (regression for the cast-through-
    session-timezone shift)."""
    ch = spark.read.parquet(changelog_dir).limit(20)
    # produce (materialize the wire JSON) under the default UTC session
    wire_values = [r["value"] for r in bus_records_from_changelog(ch).collect()]
    expected = {(r["doc_id"], r["lsn"]): r["ts"] for r in ch.collect()}
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        # consume in a session pinned to a different timezone
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        wire = spark.createDataFrame(
            [("t", 0, i, "k", v, None) for i, v in enumerate(wire_values)],
            BUS_RECORD_DDL,
        )
        got = {
            (r["doc_id"], r["lsn"]): r["ts"]
            for r in changelog_from_bus(wire).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == expected


def test_bus_corrupt_records_dropped(spark, changelog_dir):
    ch = spark.read.parquet(changelog_dir).limit(5)
    good = bus_records_from_changelog(ch)
    junk = spark.createDataFrame(
        [("canal.changes", 0, 999_999, "k", "{not json", None)], BUS_RECORD_DDL
    )
    decoded = changelog_from_bus(good.unionByName(junk))
    assert decoded.count() == 5


def test_bus_batches_with_overlapping_offsets_apply_exactly_once(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Redelivery at the RECORD level (overlapping offset ranges across
    batches), not just whole-batch redelivery: the per-partition offset
    high-watermark must drop the duplicates."""
    ch = spark.read.parquet(changelog_dir)
    lo, hi = 0, int(ch.agg(F.max("lsn")).first()[0])
    cut = hi // 2
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table)
    # batch 1: [0, cut]; batch 2: [cut - 10%, hi] — overlap is stale
    b1 = bus_records_from_changelog(ch.filter(F.col("lsn") <= cut))
    b2 = bus_records_from_changelog(ch.filter(F.col("lsn") > cut - (cut // 10)))
    assert su.apply_batch(changelog_from_bus(b1), 0) is True
    ck_after_1 = table.checkpoints()
    assert su.apply_batch(changelog_from_bus(b2), 1) is True
    # whole-batch redelivery after the fact: no-op
    assert su.apply_batch(changelog_from_bus(b2), 1) is False
    assert all(table.checkpoints()[p] >= ck_after_1[p] for p in ck_after_1)
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_bus_stream_restart_with_redelivery(spark, changelog_dir, oracle_state, tmp_path):
    """Drive the epoch kernel from a streamed directory of bus-format
    JSON files; kill after the first epoch; restart on the same
    checkpoint — the in-flight batch may be redelivered (at-least-once)
    and must land exactly once."""
    bus_dir = str(tmp_path / "bus")
    ch = spark.read.parquet(changelog_dir)
    # one JSON file per source partition, written in partition order
    for p in sorted(r[0] for r in ch.select("source_partition").distinct().collect()):
        bus_records_from_changelog(ch.filter(F.col("source_partition") == p)).coalesce(
            1
        ).write.mode("overwrite").json(os.path.join(bus_dir, f"chunk={p}"))

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table)
    ckpt = str(tmp_path / "ckpt")

    def _start():
        stream = (
            spark.readStream.schema(BUS_RECORD_DDL)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .json(bus_dir)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: su.apply_batch(changelog_from_bus(df), bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    q = _start()
    import time

    deadline = time.time() + 120
    while (table.current_epoch() or 0) < 1:
        assert time.time() < deadline, "first bus epoch never committed"
        time.sleep(0.2)
    q.stop()  # crash point: checkpoint may be mid-batch
    epoch_mid = table.current_epoch()

    q2 = _start()
    deadline = time.time() + 180
    while (table.current_epoch() or 0) < epoch_mid + 1 or q2.status["isDataAvailable"]:
        if time.time() > deadline:
            break
        time.sleep(0.2)
    q2.processAllAvailable()
    q2.stop()
    assert_state_equals_oracle(table.read(spark), oracle_state)
