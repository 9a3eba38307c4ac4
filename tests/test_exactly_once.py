"""Exactly-once sink semantics (T2/T3): idempotent commits, sequential
epochs, crash-resume without loss or duplication."""

from __future__ import annotations

import os

import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def test_reapply_committed_epoch_is_noop(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=10**9)
    eng.run_to_completion()
    last = table.current_epoch()
    # re-commit of an existing epoch: no-op, state untouched
    snap_before = table.snapshot()
    assert table.commit(last, {0: []}, {0: 10**12}, []) is False
    assert table.snapshot() == snap_before
    # engine has nothing further to do
    assert eng.run_epoch() is None


def test_non_sequential_commit_rejected(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="non-sequential"):
        table.commit(5, {}, {}, [])


def test_crash_between_data_write_and_commit_resumes_exactly(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Kill point: epoch data files written, manifest rename never
    happened. The orphan files are invisible; a fresh engine re-derives
    the identical epoch and the final state matches the oracle."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    assert eng.run_epoch() is not None
    assert eng.run_epoch() is not None
    crash_epoch = table.current_epoch() + 1

    # simulate the crash: run the epoch but drop the commit
    real_commit = table.commit
    table.commit = lambda *a, **k: None  # type: ignore[method-assign]
    assert eng.run_epoch() is not None
    table.commit = real_commit  # type: ignore[method-assign]
    assert table.current_epoch() == crash_epoch - 1  # no manifest published
    assert os.path.isdir(table.epoch_data_dir(crash_epoch))  # orphans exist

    # recovery: a FRESH engine on the same table dir resumes from the
    # committed checkpoints and replays to completion
    eng2 = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    eng2.run_to_completion()
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_resume_from_checkpoint_reads_only_new_lsns(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=1000)
    r1 = eng.run_epoch()
    r2 = eng.run_epoch()
    lin = table.lineage_df(spark).toPandas()
    e1 = lin[lin.epoch == r1.epoch].set_index("source_partition")
    e2 = lin[lin.epoch == r2.epoch].set_index("source_partition")
    for p in set(e1.index) & set(e2.index):
        assert e2.loc[p, "min_lsn"] > e1.loc[p, "max_lsn"]
