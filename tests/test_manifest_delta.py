"""Delta-form snapshot manifests (Iceberg manifest-reuse analog):
per-epoch metadata written is O(touched buckets), not O(table files);
readers always see the materialized view; expiration and orphan GC
resolve chains correctly."""

from __future__ import annotations

import json
import os

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def _raw(table, epoch):
    with open(table._snap_path(epoch)) as f:
        return json.load(f)


def test_delta_snapshots_written_and_materialized(spark, changelog_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=32)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=150)
    eng.run_to_completion()
    cur = table.current_epoch()
    assert cur >= 4
    # later epochs are delta-form on disk (epoch 1 seeds every bucket,
    # so it materializes; small follow-up epochs delta-encode)
    forms = {e: ("files" in _raw(table, e)) for e in range(1, cur + 1)}
    assert not all(forms.values()), f"expected some delta snapshots, got {forms}"
    # the materialized view is identical to replay truth at HEAD
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # and time travel to a delta epoch still reads (chain resolution)
    delta_epochs = [e for e, mat in forms.items() if not mat]
    mid = delta_epochs[len(delta_epochs) // 2]
    assert table.read(spark, epoch=mid).count() > 0
    # a FRESH handle (cold cache, e.g. another process) sees the same
    t2 = SnapshotTable(str(tmp_path / "t"))
    assert t2.snapshot()["files"] == table.snapshot()["files"]


def test_delta_metadata_is_o_touched_not_o_table(spark, tmp_path):
    """With many buckets and small epochs, a delta snapshot on disk is
    a small fraction of a materialized one."""
    from tests.test_file_skipping import _commit_base, _commit_frag, keys

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=64)
    _commit_base(spark, table, keys("a", 2000))  # seeds all buckets -> materialized
    _commit_frag(spark, table, keys("a", 3), seq0=10_000)  # touches <=3 buckets
    s1 = os.path.getsize(table._snap_path(1))
    s2 = os.path.getsize(table._snap_path(2))
    assert "files" not in _raw(table, 2)
    # the residual is the snapshot's fixed overhead (schemas,
    # checkpoints, lineage scaffolding), not the file map
    assert s2 < s1 / 3, f"delta snapshot {s2}B vs materialized {s1}B"
    raw2 = _raw(table, 2)
    assert len(raw2["files_delta"]) <= 3 and raw2["files_base"] == 1


def test_chain_bounded_by_materialize_every(spark, tmp_path):
    from tests.test_file_skipping import _commit_base, _commit_frag, keys

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    _commit_base(spark, table, keys("a", 500))
    for i in range(SnapshotTable.MATERIALIZE_EVERY + 3):
        _commit_frag(spark, table, keys("a", 3, start=5 * i), seq0=1000 * (i + 1))
    mats = [e for e in range(1, table.current_epoch() + 1) if "files" in _raw(table, e)]
    assert len(mats) >= 2, "a full map must re-materialize within the bound"
    assert table.read(spark).count() == 500


def test_expire_and_orphans_resolve_delta_chains(spark, changelog_dir, oracle_state, tmp_path):
    """Expiring epochs under a delta chain must leave the oldest
    retained snapshot self-contained, and orphan GC must never delete
    a file referenced only through a chain."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=32)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=150)
    eng.run_to_completion()
    cur = table.current_epoch()
    assert "files" not in _raw(table, cur), "head should be delta-form here"
    before = sorted(map(tuple, table.read(spark).collect()))
    expired = table.expire_snapshots(retain_last=2)
    assert expired
    oldest = min(
        e for e in range(cur + 1) if os.path.exists(table._snap_path(e))
    )
    assert "files" in _raw(table, oldest), "oldest retained must be materialized"
    removed = table.remove_orphans()
    assert removed >= 0
    assert sorted(map(tuple, table.read(spark).collect())) == before
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # fresh cold-cache handle agrees post-GC
    t2 = SnapshotTable(str(tmp_path / "t"))
    assert sorted(map(tuple, t2.read(spark).collect())) == before
