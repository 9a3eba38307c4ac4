"""rollback_to: the poisoned-batch recovery path (Iceberg
rollback_to_snapshot analog). The rewind is itself an append-only
epoch carrying the old files + checkpoints verbatim, so a resumed
engine re-reads the changelog from the restored positions and
converges to the same final state as an uninterrupted replay."""

from __future__ import annotations

import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def test_rollback_restores_state_and_checkpoints(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(2):
        eng.run_epoch()
    e_good = table.current_epoch()
    good_rows = sorted(
        table.read(spark, with_bucket=False).select("doc_id", "n_tok").collect()
    )
    for _ in range(2):
        eng.run_epoch()
    assert table.current_epoch() > e_good

    new_epoch = table.rollback_to(e_good)
    assert new_epoch == table.current_epoch()
    snap = table.snapshot()
    assert snap["checkpoints"] == table.snapshot(e_good)["checkpoints"]
    assert snap["meta"]["rollback_to"] == e_good
    rolled = sorted(
        table.read(spark, with_bucket=False).select("doc_id", "n_tok").collect()
    )
    assert rolled == good_rows
    # history is append-only: the undone epochs remain readable
    assert table.read(spark, epoch=e_good + 1, with_bucket=False).count() >= 0


def test_rollback_then_resume_converges(spark, changelog_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(2):
        eng.run_epoch()
    e_good = table.current_epoch()
    for _ in range(2):
        eng.run_epoch()
    table.rollback_to(e_good)
    # fresh handle, as after an operator intervention: re-applies the
    # undone events and finishes the log
    t2 = SnapshotTable(str(tmp_path / "t"))
    CdcEngine(spark, changelog_dir, t2, lsn_budget=400).run_to_completion()
    assert_state_equals_oracle(t2.read(spark, with_bucket=False), oracle_state)


def test_rollback_rejections(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=1000)
    eng.run_epoch()
    cur = table.current_epoch()
    with pytest.raises(ValueError, match="> current"):
        table.rollback_to(cur + 5)
    # rolling back to the current epoch is a no-op, not a new snapshot
    assert table.rollback_to(cur) == cur
    assert table.current_epoch() == cur
    # a rebucket boundary invalidates verbatim file entries
    before_rebucket = table.current_epoch()
    table.rebucket(spark, new_n_buckets=8)
    with pytest.raises(ValueError, match="rebucket"):
        table.rollback_to(before_rebucket)
    # an expired snapshot cannot be restored
    eng2 = CdcEngine(spark, changelog_dir, table, lsn_budget=1000)
    eng2.run_epoch()
    eng2.run_epoch()
    table.expire_snapshots(retain_last=1)
    with pytest.raises(FileNotFoundError):
        table.rollback_to(1)
