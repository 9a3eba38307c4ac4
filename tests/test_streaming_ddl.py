"""In-stream DDL for the streaming front-end: schema updates from the
A3 side-table applied IN POSITION between micro-batch events —
DML before the DDL runs under the old schema, DML at/after it under
the new one, each DDL its own metadata-only epoch, blocked events
riding the durable pending store across sub-epochs and micro-batches,
ddl watermark durable across restarts."""

from __future__ import annotations

import os
import shutil

import pytest

from canal_spark.plans.table import SnapshotTable
from canal_spark.sources.changelog import generate_ddl_events
from canal_spark.streaming.stream import StreamingUpsert
from tests.test_ddl_stream import _commit_boundaries, assert_state_equals_oracle_frame


@pytest.fixture(scope="module")
def sddl_dir(changelog_dir, tmp_path_factory) -> tuple[str, list[dict]]:
    """Same planting rule as the batch DDL tests: boundaries of three
    partitions plus one DDL at position 0 (before any DML arrives)."""
    b0 = _commit_boundaries(changelog_dir, 0)
    b1 = _commit_boundaries(changelog_dir, 1)
    b2 = _commit_boundaries(changelog_dir, 2)
    ddls = [
        {"lsn": 0, "source_partition": 3, "kind": "ADD_COLUMN",
         "payload": {"name": "pre", "type": "int"}},
        {"lsn": b0[len(b0) // 3] + 1, "source_partition": 0, "kind": "ADD_COLUMN",
         "payload": {"name": "lang", "type": "string"}},
        {"lsn": b1[2 * len(b1) // 3] + 1, "source_partition": 1, "kind": "RENAME_COLUMN",
         "payload": {"from": "source", "to": "origin"}},
        {"lsn": b2[-1] + 1, "source_partition": 2, "kind": "WIDEN_TYPE",
         "payload": {"name": "n_tok", "to": "bigint"}},
    ]
    d = tmp_path_factory.mktemp("sddl")
    return generate_ddl_events(str(d / "ddl_events"), ddls), ddls


def _final_assertions(spark, table, oracle_state, ddls):
    df = table.read(spark, with_bucket=False)
    assert df.columns == ["doc_id", "tokens", "n_tok", "origin", "pre", "lang"]
    assert dict(df.dtypes)["n_tok"] == "bigint"
    assert table.snapshot()["schema_ver"] == 5  # 1 + exactly 4 DDLs
    got = df.select("doc_id", "tokens", "n_tok", df.origin.alias("source")).toPandas()
    assert_state_equals_oracle_frame(got, oracle_state)
    # every DDL: own epoch, metadata-only, applied exactly in position
    snaps = [table.snapshot(e) for e in range(0, table.current_epoch() + 1)]
    ddl_snaps = [
        s for s in snaps if s["parent"] is not None
        and s["schema_ver"] != table.snapshot(s["parent"])["schema_ver"]
    ]
    assert [s["meta"]["ddl_wm"] for s in ddl_snaps] == [
        [d["lsn"], d["source_partition"]] for d in ddls
    ]
    for s, d in zip(ddl_snaps, ddls):
        parent = table.snapshot(s["parent"])
        assert s["files"] == parent["files"], "DDL epoch must rewrite no data"
        # the DDL's partition was drained to exactly the DDL position
        assert int(parent["checkpoints"].get(str(d["source_partition"]), -1)) == d["lsn"] - 1


def test_stream_ddl_in_position(spark, changelog_dir, oracle_state, tmp_path, sddl_dir):
    ddl_path, ddls = sddl_dir
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table, ddl_events_path=ddl_path)
    q = su.start(changelog_dir, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert q.awaitTermination(300)
    _final_assertions(spark, table, oracle_state, ddls)
    # redelivery of an old batch after DDLs is still a no-op
    assert su.apply_batch(spark.read.parquet(changelog_dir), batch_id=0) is False


def test_stream_ddl_restart_preserves_watermark(
    spark, changelog_dir, oracle_state, tmp_path, sddl_dir
):
    """Stop after half the stream (some DDLs applied), restart a FRESH
    query + front-end on the same checkpoint: no DDL re-applies, the
    rest apply in position, final state identical."""
    ddl_path, ddls = sddl_dir
    src = str(tmp_path / "src")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(changelog_dir) if f.endswith(".parquet"))
    for f in files[:2]:
        shutil.copy(os.path.join(changelog_dir, f), os.path.join(src, f))
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    su1 = StreamingUpsert(spark, table, ddl_events_path=ddl_path)
    q = su1.start(src, ckpt, max_files_per_trigger=1)
    assert q.awaitTermination(300)
    ver_mid = table.snapshot()["schema_ver"]
    assert 2 <= ver_mid <= 5  # pre + lang (+ maybe more) already applied
    for f in files[2:]:
        shutil.copy(os.path.join(changelog_dir, f), os.path.join(src, f))
    t2 = SnapshotTable(str(tmp_path / "t"))  # fresh handle, cold resume
    su2 = StreamingUpsert(spark, t2, ddl_events_path=ddl_path)
    q = su2.start(src, ckpt, max_files_per_trigger=1)
    assert q.awaitTermination(300)
    _final_assertions(spark, t2, oracle_state, ddls)


def test_stream_crash_between_sub_epoch_and_final_no_duplicates(
    spark, changelog_dir, oracle_state, tmp_path, sddl_dir, monkeypatch
):
    """THE double-union hazard: a sub-epoch absorbs the micro-batch
    into the pending store, then the run crashes before the final
    numbered epoch. The redelivered batch must NOT be unioned with the
    pending store again (the durable sub-batch mark) — without the
    guard every held event applies twice and duplicate doc_id rows
    reach the table."""
    ddl_path, ddls = sddl_dir
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table, ddl_events_path=ddl_path)
    files = sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.endswith(".parquet")
    )
    batch0 = spark.read.parquet(files[0])
    real = su._apply_ddl
    calls: list[str] = []

    def crashing(d):
        calls.append(d["kind"])
        if len(calls) == 2:  # the in-batch DDL, AFTER the first sub-epoch
            raise RuntimeError("simulated crash after the sub-epoch")
        return real(d)

    monkeypatch.setattr(su, "_apply_ddl", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        su.apply_batch(batch0, batch_id=0)
    monkeypatch.setattr(su, "_apply_ddl", real)
    # the sub-epoch committed and absorbed the batch
    assert table.snapshot()["meta"]["stream_sub_batch_id"] == 0

    assert su.apply_batch(batch0, batch_id=0) is True  # the redelivery
    dups = table.read(spark).groupBy("doc_id").count().filter("count > 1").count()
    assert dups == 0
    for i, f in enumerate(files[1:], start=1):
        su.apply_batch(spark.read.parquet(f), batch_id=i)
    _final_assertions(spark, table, oracle_state, ddls)


def test_stream_lost_commit_race_retries_not_lost(
    spark, changelog_dir, oracle_state, tmp_path, monkeypatch
):
    """A concurrent maintenance commit stealing the epoch number must
    not lose the micro-batch: foreachBatch ignores the callback's
    return value and Spark checkpoints the batch regardless, so the
    streaming DML commit retries on a fresh snapshot exactly like the
    batch-engine paths."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    su = StreamingUpsert(spark, table)
    real_commit = table.commit
    stolen = {"done": False}

    def stealing_commit(epoch, *a, **kw):
        if not stolen["done"]:
            stolen["done"] = True
            # the concurrent writer wins this epoch number first
            assert real_commit(epoch, {}, {}, [], meta={"thief": True})
            return False
        return real_commit(epoch, *a, **kw)

    monkeypatch.setattr(table, "commit", stealing_commit)
    assert su.apply_batch(spark.read.parquet(changelog_dir), batch_id=0) is True
    assert stolen["done"]
    assert table.snapshot()["meta"]["stream_batch_id"] == 0
    from tests.conftest import assert_state_equals_oracle

    assert_state_equals_oracle(table.read(spark), oracle_state)
