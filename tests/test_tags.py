"""Snapshot tags (Iceberg tag analog): a named pin on an epoch that
excludes it from `expire_snapshots` — and, through `remove_orphans`'
reference scan over remaining manifests, keeps its data files live —
until the tag is dropped. Named dataset releases ("v1-train") and
restore points (`rollback_to(tag_epoch(name))`) are the use cases."""

from __future__ import annotations

import json
import os

import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def _replay(spark, changelog_dir, path, budget=400, epochs=None):
    table = SnapshotTable.create(str(path), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=budget)
    if epochs is None:
        eng.run_to_completion()
    else:
        for _ in range(epochs):
            eng.run_epoch()
    return table, eng


def _rows(spark, table, epoch=None):
    return sorted(
        table.read(spark, epoch=epoch, with_bucket=False)
        .select("doc_id", "n_tok")
        .collect()
    )


def test_tag_surface(spark, changelog_dir, tmp_path):
    table, _ = _replay(spark, changelog_dir, tmp_path / "t", epochs=2)
    e1 = table.current_epoch()
    assert table.tag("v1-train") == e1
    assert table.tag("older", epoch=e1 - 1) == e1 - 1
    assert table.tags() == {"older": e1 - 1, "v1-train": e1}
    assert table.tag_epoch("v1-train") == e1
    with pytest.raises(ValueError, match="already exists"):
        table.tag("v1-train")
    with pytest.raises(ValueError, match="invalid tag name"):
        table.tag("../escape")
    with pytest.raises(FileNotFoundError):
        table.tag("ghost-epoch", epoch=99)
    table.drop_tag("older")
    assert table.tags() == {"v1-train": e1}
    with pytest.raises(KeyError):
        table.tag_epoch("older")
    with pytest.raises(KeyError):
        table.drop_tag("older")


def test_tagged_epoch_survives_expire_and_orphan_sweep(
    spark, changelog_dir, tmp_path
):
    table, _ = _replay(spark, changelog_dir, tmp_path / "t", epochs=4)
    pinned = 2
    table.tag("release", epoch=pinned)
    pinned_rows = _rows(spark, table, epoch=pinned)

    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    eng.run_to_completion()
    cur = table.current_epoch()

    expired = table.expire_snapshots(retain_last=1)
    # the pinned epoch is NOT in the expired list and its manifest stays
    assert pinned not in expired
    assert all(e < cur for e in expired)
    assert os.path.exists(table._snap_path(pinned))
    # unpinned older epochs are gone
    assert 1 in expired and not os.path.exists(table._snap_path(1))

    # orphan sweep must keep the pinned snapshot's data files
    table.remove_orphans()
    assert _rows(spark, table, epoch=pinned) == pinned_rows
    # and the current state is untouched
    assert table.current_epoch() == cur


def test_pinned_delta_manifest_rewritten_self_contained(
    spark, changelog_dir, tmp_path
):
    """A pinned manifest in delta form (files_delta over files_base)
    chains through manifests that expiration deletes: expire must
    rewrite it self-contained first, or the pin would dangle."""
    # delta form needs touched-buckets*2 < n_buckets: many buckets,
    # tiny epochs (commit() switch at plans/table.py:714-718)
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=128)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=60)
    for _ in range(6):
        eng.run_epoch()
    pinned = next(
        e
        for e in range(2, table.current_epoch() + 1)
        if "files" not in json.load(open(table._snap_path(e)))
    )
    table.tag("pin", epoch=pinned)
    before = _rows(spark, table, epoch=pinned)
    CdcEngine(spark, changelog_dir, table, lsn_budget=400).run_to_completion()

    table.expire_snapshots(retain_last=1)
    raw = json.load(open(table._snap_path(pinned)))
    assert "files" in raw and raw.get("files_chain") == 0  # materialized
    assert _rows(spark, table, epoch=pinned) == before


def test_drop_tag_releases_the_pin(spark, changelog_dir, tmp_path):
    table, _ = _replay(spark, changelog_dir, tmp_path / "t", epochs=3)
    pinned = 1
    table.tag("temp", epoch=pinned)
    CdcEngine(spark, changelog_dir, table, lsn_budget=400).run_to_completion()
    table.expire_snapshots(retain_last=1)
    assert os.path.exists(table._snap_path(pinned))

    table.drop_tag("temp")
    expired = table.expire_snapshots(retain_last=1)
    assert pinned in expired
    with pytest.raises(FileNotFoundError):
        table.snapshot(pinned)
    table.remove_orphans()
    # current state still reads fine after the full release
    assert table.read(spark, with_bucket=False).count() > 0


def test_rollback_to_tag_is_a_restore_point(
    spark, changelog_dir, oracle_state, tmp_path
):
    """The workflow the two features compose into: tag a known-good
    epoch, keep ingesting, expire aggressively (the tag outlives the
    window), then roll back BY NAME and resume — converging to the
    same final state as an uninterrupted replay."""
    table, eng = _replay(spark, changelog_dir, tmp_path / "t", epochs=2)
    table.tag("known-good")
    eng.run_epoch()
    eng.run_epoch()
    table.expire_snapshots(retain_last=1)

    table.rollback_to(table.tag_epoch("known-good"))
    t2 = SnapshotTable(str(tmp_path / "t"))
    CdcEngine(spark, changelog_dir, t2, lsn_budget=400).run_to_completion()
    assert_state_equals_oracle(t2.read(spark, with_bucket=False), oracle_state)
