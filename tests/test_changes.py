"""Incremental change reads (table-as-a-source, Delta-CDF analog):
read_changes(a, b) emits exactly the net row-level delta between two
snapshots — applying it to state(a) reconstructs state(b); logical
no-ops (compaction, re-deletes) emit nothing."""

from __future__ import annotations

import pyspark.sql.functions as F

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle

COLS = ["doc_id", "tokens", "n_tok", "source"]


def _apply_changes(state_a, changes):
    """The downstream-consumer contract: drop changed keys, add the new
    images of non-deletes."""
    keys = changes.select("doc_id")
    kept = state_a.join(keys, "doc_id", "left_anti")
    new = changes.filter(F.col("op") != "DELETE").select(*COLS)
    return kept.select(*COLS).unionByName(new)


def _frames_equal(x, y) -> bool:
    return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0


def test_changes_reconstruct_later_snapshot(spark, changelog_dir, oracle_state, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(3):
        eng.run_epoch()
    e1 = table.current_epoch()
    eng.run_to_completion()
    final = table.current_epoch()

    changes = table.read_changes(spark, e1, final)
    ops = {r["op"] for r in changes.select("op").distinct().collect()}
    assert "UPDATE" in ops and "INSERT" in ops, f"split must exercise ops, got {ops}"
    state_a = table.read(spark, epoch=e1, with_bucket=False)
    reconstructed = _apply_changes(state_a, changes)
    state_b = table.read(spark, epoch=final, with_bucket=False).select(*COLS)
    assert _frames_equal(reconstructed, state_b)
    assert_state_equals_oracle(reconstructed, oracle_state)


def test_changes_from_empty_are_pure_inserts(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    CdcEngine(spark, changelog_dir, table, lsn_budget=10**9).run_to_completion()
    final = table.current_epoch()
    changes = table.read_changes(spark, 0, final)
    assert changes.filter(F.col("op") != "INSERT").count() == 0
    assert changes.count() == table.read(spark).count()


def test_changes_compose_across_a_split(spark, changelog_dir, tmp_path):
    """Net changes compose: applying changes(0,e1) then changes(e1,f)
    equals applying changes(0,f) — flaps collapse consistently."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(2):
        eng.run_epoch()
    e1 = table.current_epoch()
    eng.run_to_completion()
    final = table.current_epoch()
    empty = table.read(spark, epoch=0, with_bucket=False).select(*COLS)
    via_split = _apply_changes(
        _apply_changes(empty, table.read_changes(spark, 0, e1)),
        table.read_changes(spark, e1, final),
    )
    direct = _apply_changes(empty, table.read_changes(spark, 0, final))
    assert _frames_equal(via_split, direct)


def test_logical_noops_emit_nothing(spark, changelog_dir, tmp_path):
    """Compaction and tombstone GC rewrite files but change no logical
    row: the change feed between those epochs must be EMPTY."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, write_mode="mor")
    eng.run_to_completion()
    pre = table.current_epoch()
    assert table.compact_files(spark, target_bytes=1 << 30)
    post = table.current_epoch()
    assert post == pre + 1
    assert table.read_changes(spark, pre, post).count() == 0
    # tombstone GC: visible state unchanged => no UPDATE/INSERT rows;
    # dropped tombstones were already invisible => no DELETE rows either
    dropped = eng.compact_tombstones()
    assert dropped > 0
    assert table.read_changes(spark, post, table.current_epoch()).count() == 0


def test_changes_include_deletes_with_null_payload(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(3):
        eng.run_epoch()
    e1 = table.current_epoch()
    eng.run_to_completion()
    dels = table.read_changes(spark, e1, None).filter(F.col("op") == "DELETE")
    if dels.count():
        r = dels.first()
        assert r["tokens"] is None and r["n_tok"] is None and r["source"] is None
