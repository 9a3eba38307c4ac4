"""Structured Streaming front-end (T1–T4): file-tail -> foreachBatch
epoch kernel -> same final state as the batch engine and the oracle;
restart resumes exactly-once; redelivered batches are no-ops."""

from __future__ import annotations

from canal_spark.plans.table import SnapshotTable
from canal_spark.streaming.stream import StreamingUpsert
from tests.conftest import assert_state_equals_oracle


def _run_stream(spark, changelog_dir, table, ckpt_dir, max_files=1):
    su = StreamingUpsert(spark, table)
    q = su.start(changelog_dir, ckpt_dir, max_files_per_trigger=max_files)
    q.awaitTermination(300)
    return su


def test_stream_replay_matches_oracle(spark, changelog_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    _run_stream(spark, changelog_dir, table, str(tmp_path / "ckpt"))
    # 4 source files, 1 per trigger -> 4 stream epochs
    assert table.current_epoch() == 4
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # trailing incomplete txs are durably pending, never applied
    pending = table.read_pending(spark)
    assert pending is not None and pending.filter("tx_commit").count() == 0


def test_stream_mor_replay_matches_oracle_and_compacts(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Streaming merge-on-read: every micro-batch appends fragments
    (low-latency commits), the resolved view matches the oracle, and
    compact_files folds the stream's fragment pile."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table, write_mode="mor")
    q = su.start(changelog_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(300)
    assert table.current_epoch() == 4
    snap = table.snapshot()
    assert max(len(fs) for fs in snap["files"].values()) >= 2
    assert_state_equals_oracle(table.read(spark), oracle_state)
    assert table.compact_files(spark, target_bytes=1 << 30)
    assert all(len(fs) == 1 for fs in table.snapshot()["files"].values())
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # redelivery after compaction still a no-op
    assert su.apply_batch(spark.read.parquet(changelog_dir), batch_id=0) is False


def test_stream_batch_redelivery_is_noop(spark, changelog_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = _run_stream(spark, changelog_dir, table, str(tmp_path / "ckpt"))
    epoch = table.current_epoch()
    # simulate foreachBatch redelivery of the last batch
    batch = spark.read.parquet(changelog_dir)
    assert su.apply_batch(batch, batch_id=0) is False  # already-seen id
    assert table.current_epoch() == epoch
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_stream_restart_resumes_from_checkpoint(spark, changelog_dir, oracle_state, tmp_path):
    """Kill the query after the first batch; a fresh query on the same
    checkpoint dir processes only the remainder."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(
            __import__("canal_spark.sources.changelog", fromlist=["CHANGELOG_DDL"]).CHANGELOG_DDL
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(changelog_dir)
    )
    q = (
        stream.writeStream.foreachBatch(su.apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    while table.current_epoch() < 1:
        q.processAllAvailable() if False else None  # spin until first commit
        import time

        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    mid_epoch = table.current_epoch()
    assert mid_epoch >= 1

    # restart: same checkpoint, availableNow drains the rest
    su2 = StreamingUpsert(spark, table)
    q2 = su2.start(changelog_dir, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(300)
    assert table.current_epoch() >= mid_epoch
    assert_state_equals_oracle(table.read(spark), oracle_state)
