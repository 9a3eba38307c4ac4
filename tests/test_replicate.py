"""Table-to-table replication from the change feed: a replica
SnapshotTable maintained purely from the primary's read_changes output
(captured or diff), never re-reading the changelog."""

from __future__ import annotations

import pytest

from canal_spark.engine import CdcEngine
from canal_spark.operators.replicate import TableReplicator
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def _rows(spark, table):
    return sorted(
        table.read(spark, with_bucket=False)
        .select("doc_id", "n_tok", "source")
        .collect()
    )


def test_replica_converges_incrementally(
    spark, changelog_dir, oracle_state, tmp_path
):
    primary = SnapshotTable.create(str(tmp_path / "p"), n_buckets=8)
    eng = CdcEngine(
        spark, changelog_dir, primary, lsn_budget=600, capture_changes=True
    )
    # replica on a DIFFERENT bucket layout: replication is key-level
    rep = TableReplicator.create_replica(primary, str(tmp_path / "r"), n_buckets=4)

    eng.run_epoch(), eng.run_epoch()
    assert rep.sync(spark) == primary.current_epoch()
    assert _rows(spark, rep.replica) == _rows(spark, primary)

    eng.run_to_completion()
    final = primary.current_epoch()
    assert rep.sync(spark) == final
    assert rep.sync(spark) is None  # up to date -> no-op
    assert rep.replicated_epoch() == final
    # the replica folded a multi-epoch range into ONE epoch per sync
    assert rep.replica.current_epoch() == 2
    assert_state_equals_oracle(rep.replica.read(spark), oracle_state)
    # deletes propagated: same visible key set
    assert _rows(spark, rep.replica) == _rows(spark, primary)


def test_replica_via_snapshot_diff_feed(spark, changelog_dir, tmp_path):
    """No capture on the primary: the feed falls back to the snapshot
    diff and replication still converges."""
    primary = SnapshotTable.create(str(tmp_path / "p"), n_buckets=8)
    CdcEngine(spark, changelog_dir, primary, lsn_budget=900).run_to_completion()
    rep = TableReplicator.create_replica(primary, str(tmp_path / "r"))
    assert rep.sync(spark) == primary.current_epoch()
    assert _rows(spark, rep.replica) == _rows(spark, primary)


def test_replica_guards(spark, changelog_dir, tmp_path):
    primary = SnapshotTable.create(str(tmp_path / "p"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, primary, lsn_budget=600)
    eng.run_epoch(), eng.run_epoch()
    rep = TableReplicator.create_replica(primary, str(tmp_path / "r"))
    rep.sync(spark)
    # primary rolled back BELOW the replica watermark: LWW cannot apply
    # the "downgrade" (restored rows carry older _seq), so sync must
    # refuse loudly rather than silently diverge ...
    primary.rollback_to(1)
    with pytest.raises(ValueError, match="rolled back"):
        rep.sync(spark)
    # ... and the recovery path rewinds the replica to a safe base and
    # converges along the restored timeline
    assert rep.recover_from_rollback(spark) == primary.current_epoch()
    assert _rows(spark, rep.replica) == _rows(spark, primary)
    # schema divergence raises rather than guessing a mapping
    from canal_spark.engine import apply_schema_update

    apply_schema_update(primary, "ADD_COLUMN", {"name": "lang", "type": "string"})
    eng2 = CdcEngine(spark, changelog_dir, primary, lsn_budget=600)
    eng2.run_epoch()
    with pytest.raises(ValueError, match="schemas diverged"):
        rep.sync(spark)
    # applying the same DDL to the replica lets sync resume
    apply_schema_update(rep.replica, "ADD_COLUMN", {"name": "lang", "type": "string"})
    assert rep.sync(spark) == primary.current_epoch()
    assert _rows(spark, rep.replica) == _rows(spark, primary)
