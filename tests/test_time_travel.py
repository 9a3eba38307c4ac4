"""Timestamp time travel (Iceberg `TIMESTAMP AS OF`): every published
snapshot carries a wall-clock `committed_at_us`; `epoch_at(ts)` resolves
the largest retained epoch committed at or before ts."""

from __future__ import annotations

import datetime as dt

import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable


def test_epoch_at_resolves_every_boundary(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=600)
    eng.run_to_completion()
    final = table.current_epoch()
    stamps = {e: table.snapshot(e)["committed_at_us"] for e in range(0, final + 1)}
    assert all(stamps.values())
    # sequential commits -> monotone stamps on this machine
    assert list(stamps.values()) == sorted(stamps.values())
    for e, at in stamps.items():
        assert table.epoch_at(at) == e
    # between two commits -> the earlier epoch
    assert table.epoch_at(stamps[final] - 1) == final - 1
    # after everything -> current; as datetime and ISO string too
    now = dt.datetime.now(dt.timezone.utc)
    assert table.epoch_at(now) == final
    assert table.epoch_at(now.isoformat()) == final
    # before the table existed -> error
    with pytest.raises(ValueError, match="no retained snapshot"):
        table.epoch_at(stamps[0] - 1)


def test_timestamp_read_and_rollback(spark, changelog_dir, tmp_path):
    """The operator workflow: note the wall clock at a known-good
    moment, keep ingesting, then read AS OF that time and roll back to
    it — both resolve to the same epoch the clock saw."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=600)
    eng.run_epoch(), eng.run_epoch()
    e_good = table.current_epoch()
    t_good = table.snapshot()["committed_at_us"]
    good = sorted(
        table.read(spark, with_bucket=False).select("doc_id", "n_tok").collect()
    )
    eng.run_to_completion()
    assert table.current_epoch() > e_good

    assert table.epoch_at(t_good) == e_good
    as_of = sorted(
        table.read(spark, epoch=table.epoch_at(t_good), with_bucket=False)
        .select("doc_id", "n_tok")
        .collect()
    )
    assert as_of == good
    table.rollback_to(table.epoch_at(t_good))
    assert (
        sorted(table.read(spark, with_bucket=False).select("doc_id", "n_tok").collect())
        == good
    )
    # expire past the target: it can no longer be resolved by time
    eng2 = CdcEngine(spark, changelog_dir, table, lsn_budget=600)
    eng2.run_to_completion()
    table.expire_snapshots(retain_last=1)
    with pytest.raises(FileNotFoundError):
        table.snapshot(e_good)
    assert table.epoch_at(t_good + 10**9) == table.current_epoch()
