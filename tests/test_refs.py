"""Branch refs (Iceberg branch analog) + write-audit-publish.

A ref is a named MUTABLE pin on an epoch: `set_ref` creates or moves
it atomically, `fast_forward` advances it (forward-only), and
`expire_snapshots` never expires a ref'd epoch. The WAP flow this
enables: pin `main` at the published state, keep committing audit
epochs on the chain, serve readers from `read(ref="main")`, then
publish with one pointer move — or abort with `rollback_to`, which
also rewinds the checkpoints so the poisoned batch replays after the
fix."""

from __future__ import annotations

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


def _rows(spark, table, **kw):
    return sorted(
        table.read(spark, with_bucket=False, **kw)
        .select("doc_id", "n_tok")
        .collect()
    )


def test_ref_surface(spark, changelog_dir, tmp_path):
    table, _ = _replay(spark, changelog_dir, tmp_path / "t", epochs=2)
    head = table.current_epoch()
    assert table.set_ref("main") == head
    assert table.set_ref("stage", epoch=head - 1) == head - 1
    assert table.refs() == {"main": head, "stage": head - 1}
    assert table.ref_epoch("stage") == head - 1
    # moving an existing ref is the operation, not an error (vs tags)
    assert table.set_ref("stage", epoch=head) == head
    with pytest.raises(ValueError, match="invalid ref name"):
        table.set_ref("../escape")
    with pytest.raises(FileNotFoundError):
        table.set_ref("ghost", epoch=99)
    table.drop_ref("stage")
    assert table.refs() == {"main": head}
    with pytest.raises(KeyError):
        table.ref_epoch("stage")
    with pytest.raises(KeyError):
        table.drop_ref("stage")
    with pytest.raises(KeyError):
        table.fast_forward("stage")


def test_read_by_ref_and_fast_forward(spark, changelog_dir, tmp_path):
    table, eng = _replay(spark, changelog_dir, tmp_path / "t", epochs=1)
    table.set_ref("main")
    published = _rows(spark, table, ref="main")
    eng.run_epoch()
    eng.run_epoch()
    head = table.current_epoch()
    # the ref'd read is frozen at publication; the chain head moved on
    assert _rows(spark, table, ref="main") == published
    assert _rows(spark, table) != published
    with pytest.raises(ValueError, match="not both"):
        table.read(spark, epoch=head, ref="main")
    with pytest.raises(KeyError):
        table.read(spark, ref="nope")
    # publish: one pointer move, then the ref'd read IS the head read
    assert table.fast_forward("main") == head
    assert _rows(spark, table, ref="main") == _rows(spark, table)
    # forward-only: an explicit rewind must go through set_ref
    with pytest.raises(ValueError, match="cannot move back"):
        table.fast_forward("main", epoch=head - 1)


def test_refd_epoch_survives_expire(spark, changelog_dir, tmp_path):
    table, eng = _replay(spark, changelog_dir, tmp_path / "t", epochs=1)
    pinned = table.current_epoch()
    table.set_ref("main")
    eng.run_to_completion()
    expired = table.expire_snapshots(retain_last=2)
    assert pinned not in expired
    assert _rows(spark, table, ref="main")  # manifest still readable
    # dropping the ref releases the pin on the next expire cycle
    table.drop_ref("main")
    assert pinned in table.expire_snapshots(retain_last=2)
    with pytest.raises(FileNotFoundError):
        table.snapshot(pinned)


def test_wap_publish_and_abort(spark, changelog_dir, tmp_path, oracle_state):
    """The full write-audit-publish loop: stage, audit, publish; then
    stage again, abort via rollback (checkpoints rewind), resume, and
    land byte-exact on the oracle."""
    table, eng = _replay(spark, changelog_dir, tmp_path / "t", epochs=1)
    table.set_ref("main")

    # --- stage two epochs, audit the head, publish
    eng.run_epoch()
    eng.run_epoch()
    head = table.current_epoch()
    audit = table.read(spark, epoch=head)
    assert audit.count() > 0  # the audit gate (anything could run here)
    table.fast_forward("main")
    assert table.ref_epoch("main") == head

    # --- stage the rest, then ABORT: rollback to the published epoch
    eng.run_epoch()
    assert table.current_epoch() > head
    rolled = table.rollback_to(table.ref_epoch("main"))
    table.fast_forward("main", rolled)  # same state, append-only epoch
    assert _rows(spark, table, ref="main") == _rows(spark, table, epoch=head)

    # --- the rollback rewound the checkpoints: a fresh engine replays
    # the aborted events and converges on the oracle
    eng2 = CdcEngine(spark, eng.changelog_path, SnapshotTable(str(tmp_path / "t")),
                     lsn_budget=400)
    eng2.run_to_completion()
    assert_state_equals_oracle(
        eng2.table.read(spark, with_bucket=False), oracle_state
    )
    eng2.table.fast_forward("main")
    assert_state_equals_oracle(
        eng2.table.read(spark, ref="main", with_bucket=False), oracle_state
    )
