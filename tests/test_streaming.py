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


def test_stream_tx_spanning_micro_batches(spark, changelog_dir, tmp_path):
    """A transaction SPLIT across micro-batches: batch 1 ends mid-tx,
    batch 2 brings the commit marker. The prefix must be durably held
    (never applied early), then applied once complete — final state
    equals the oracle of the whole partition."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from tests.oracle_replay import replay

    t = pq.read_table(os.path.join(changelog_dir, "part-p0000.parquet"))
    lsns = t.column("lsn").to_pylist()
    commits = [l for l, c in zip(lsns, t.column("tx_commit").to_pylist()) if c]
    # a multi-event transaction to split down the middle
    p, c = next(
        (p, c) for p, c in zip(commits, commits[1:]) if c - p >= 4
    )
    cut = (p + c) // 2
    assert p < cut < c
    src = str(tmp_path / "src")
    os.makedirs(src)
    fa, fb = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    pq.write_table(t.filter(pc.less_equal(t.column("lsn"), cut)), fa)
    os.utime(fa, (1000, 1000))

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    su = StreamingUpsert(spark, table)
    q = su.start(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert q.awaitTermination(300)
    # the split tx's prefix is held, not applied: checkpoint stopped at
    # the last complete commit, pending covers (p, cut]
    assert table.checkpoints()[0] == p
    held = table.read_pending(spark)
    assert held is not None
    held_lsns = sorted(r["lsn"] for r in held.collect())
    assert held_lsns and held_lsns[0] > p and held_lsns[-1] <= cut

    pq.write_table(t.filter(pc.greater(t.column("lsn"), cut)), fb)
    os.utime(fb, (1001, 1001))
    su2 = StreamingUpsert(spark, table)
    q = su2.start(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert q.awaitTermination(300)
    assert table.checkpoints()[0] >= c  # the split tx committed
    assert_state_equals_oracle(table.read(spark), replay(src))


def test_stream_multi_tx_spanning_micro_batches(spark, changelog_dir, tmp_path):
    """Same split-transaction property through the GROUP-level pending
    store of the streaming multi-table front-end."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from canal_spark.multi import TableRoute
    from canal_spark.streaming.stream import StreamingMultiUpsert
    from tests.oracle_replay import replay

    t = pq.read_table(os.path.join(changelog_dir, "part-p0000.parquet"))
    lsns = t.column("lsn").to_pylist()
    commits = [l for l, c in zip(lsns, t.column("tx_commit").to_pylist()) if c]
    p, c = next((p, c) for p, c in zip(commits, commits[1:]) if c - p >= 4)
    cut = (p + c) // 2
    src = str(tmp_path / "src")
    os.makedirs(src)
    fa, fb = os.path.join(src, "a.parquet"), os.path.join(src, "b.parquet")
    pq.write_table(t.filter(pc.less_equal(t.column("lsn"), cut)), fa)
    os.utime(fa, (1000, 1000))

    routes = [
        TableRoute("low", SnapshotTable.create(str(tmp_path / "ta"), n_buckets=4),
                   source_whitelist="src[0-4]"),
        TableRoute("high", SnapshotTable.create(str(tmp_path / "tb"), n_buckets=4),
                   source_whitelist="src[5-9]"),
    ]
    smu = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    q = smu.start(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert q.awaitTermination(300)
    assert smu.group.checkpoints()[0] == p  # stopped at the last commit
    marker = smu.group.marker(smu.group.current_epoch())
    held = spark.read.parquet(
        *[os.path.join(smu.group.root, f) for f in marker["pending"]]
    )
    assert held.count() > 0

    pq.write_table(t.filter(pc.greater(t.column("lsn"), cut)), fb)
    os.utime(fb, (1001, 1001))
    smu2 = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    q = smu2.start(src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert q.awaitTermination(300)
    assert smu2.group.checkpoints()[0] >= c
    for route, pat in zip(routes, ("src[0-4]", "src[5-9]")):
        assert_state_equals_oracle(
            route.table.read(spark), replay(src, source_pattern=pat)
        )
