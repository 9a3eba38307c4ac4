"""Schema evolution (M5): add / rename / widen as metadata-only commits
(Iceberg-style field ids), interleaved with DML epochs; old data files
are normalized at read time — canal tsdb semantics (SURVEY.md §1.3)."""

from __future__ import annotations

import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable


def _engine(spark, changelog_dir, tmp_path, budget=1200):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    return table, CdcEngine(spark, changelog_dir, table, lsn_budget=budget)


def test_ddl_interleaved_with_dml(spark, changelog_dir, oracle_state, tmp_path):
    table, eng = _engine(spark, changelog_dir, tmp_path)
    eng.run_epoch()
    eng.apply_schema_update("ADD_COLUMN", {"name": "lang", "type": "string"})
    eng.run_epoch()
    eng.apply_schema_update("RENAME_COLUMN", {"from": "source", "to": "origin"})
    eng.run_epoch()
    eng.apply_schema_update("WIDEN_TYPE", {"name": "n_tok", "to": "bigint"})
    eng.run_to_completion()

    df = table.read(spark, with_bucket=False)
    assert df.columns == ["doc_id", "tokens", "n_tok", "origin", "lang"]
    assert dict(df.dtypes)["n_tok"] == "bigint"

    got = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = oracle_state.sort_values("doc_id").reset_index(drop=True)
    # data parity under the evolved schema: origin IS the old source
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.origin) == list(exp.source)
    assert list(got.n_tok) == list(exp.n_tok)
    for g, e in zip(got.tokens, exp.tokens):
        assert list(g) == list(e)
    # added column backfills as NULL for pre-DDL rows
    assert got.lang.isna().all()


def test_ddl_is_own_epoch_and_metadata_only(spark, changelog_dir, tmp_path):
    table, eng = _engine(spark, changelog_dir, tmp_path)
    eng.run_epoch()
    before = table.snapshot()
    e = eng.apply_schema_update("ADD_COLUMN", {"name": "lang", "type": "string"})
    after = table.snapshot()
    assert after["epoch"] == e == before["epoch"] + 1
    assert after["files"] == before["files"]  # no data rewrite
    assert after["schema_ver"] == before["schema_ver"] + 1


def test_illegal_narrowing_rejected(spark, changelog_dir, tmp_path):
    table, eng = _engine(spark, changelog_dir, tmp_path)
    eng.run_epoch()
    eng.apply_schema_update("WIDEN_TYPE", {"name": "n_tok", "to": "bigint"})
    with pytest.raises(ValueError, match="illegal type change"):
        eng.apply_schema_update("WIDEN_TYPE", {"name": "n_tok", "to": "int"})


def test_time_travel_reads_old_snapshot(spark, changelog_dir, tmp_path):
    table, eng = _engine(spark, changelog_dir, tmp_path)
    eng.run_epoch()
    n1 = table.read(spark).count()
    e1 = table.current_epoch()
    eng.run_to_completion()
    assert table.current_epoch() > e1
    assert table.read(spark, epoch=e1).count() == n1


def test_ddl_rejects_key_rename_and_name_collisions(spark, changelog_dir, tmp_path):
    """The key column's name is load-bearing (bucket routing, merge
    alignment, manifest bounds): renaming it, or creating a duplicate
    column name, must be rejected as invalid DDL."""
    import pytest

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=10**9)
    with pytest.raises(ValueError, match="key column"):
        eng.apply_schema_update("RENAME_COLUMN", {"from": "doc_id", "to": "id"})
    with pytest.raises(ValueError, match="already exists"):
        eng.apply_schema_update("RENAME_COLUMN", {"from": "source", "to": "n_tok"})
    with pytest.raises(ValueError, match="already exists"):
        eng.apply_schema_update("ADD_COLUMN", {"name": "tokens", "type": "string"})
    # widening the key column changes xxhash64 bucket routing (hashInt
    # vs hashLong): same load-bearing-key hazard as RENAME — rejected
    with pytest.raises(ValueError, match="key column"):
        eng.apply_schema_update("WIDEN_TYPE", {"name": "doc_id", "to": "bigint"})
    # no epoch was committed by any rejected DDL
    assert table.current_epoch() == 0


def test_ddl_retries_after_lost_commit_race(spark, changelog_dir, tmp_path):
    """A concurrent maintenance commit can steal the epoch number out
    from under a DDL commit; apply_schema_update must detect the lost
    race and re-apply on the fresh snapshot rather than silently
    dropping the schema change."""
    table, eng = _engine(spark, changelog_dir, tmp_path)
    eng.run_epoch()
    base_epoch = table.current_epoch()

    # simulate the race: the first commit attempt loses (a maintenance
    # run published this epoch number first), subsequent attempts win
    real_commit = table.commit
    calls = {"n": 0}

    def racing_commit(epoch, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # the concurrent winner publishes a no-op epoch under the
            # number the DDL wanted, exactly like compact_files would
            real_commit(epoch, rewritten={}, checkpoints={}, lineage=[])
        return real_commit(epoch if calls["n"] > 1 else epoch, **kw)

    table.commit = racing_commit
    try:
        e = eng.apply_schema_update("ADD_COLUMN", {"name": "lang", "type": "string"})
    finally:
        table.commit = real_commit
    assert calls["n"] >= 2  # first attempt lost, retried
    assert e == table.current_epoch() == base_epoch + 2
    snap = table.snapshot()
    names = [f["name"] for f in snap["schemas"][str(snap["schema_ver"])]]
    assert "lang" in names  # the DDL landed despite the lost race


def test_drop_column_metadata_only(spark, changelog_dir, oracle_state, tmp_path):
    """DROP_COLUMN removes the field from the current schema without
    rewriting data; pre-drop files read fine, post-drop epochs simply
    stop storing the column. A later ADD_COLUMN reusing the NAME gets a
    fresh field id, so the dropped data never resurrects."""
    table, eng = _engine(spark, changelog_dir, tmp_path, budget=800)
    eng.run_epoch()
    e = eng.apply_schema_update("DROP_COLUMN", {"name": "source"})
    snap = table.snapshot()
    assert snap["epoch"] == e and snap["files"] == table.snapshot(e - 1)["files"]
    eng.run_epoch()
    df = table.read(spark, with_bucket=False)
    assert df.columns == ["doc_id", "tokens", "n_tok"]

    # reuse the name: fresh field id -> at the ADD epoch (before any
    # further DML) every existing row reads NULL; the dropped values
    # must NOT resurrect under the new column
    e_add = eng.apply_schema_update("ADD_COLUMN", {"name": "source", "type": "string"})
    at_add = table.read(spark, epoch=e_add, with_bucket=False)
    assert at_add.columns == ["doc_id", "tokens", "n_tok", "source"]
    assert at_add.filter(at_add.source.isNotNull()).count() == 0

    # post-add DML repopulates the new column from the stream
    eng.run_to_completion()
    df2 = table.read(spark, with_bucket=False)
    assert df2.filter(df2.source.isNotNull()).count() > 0

    # non-schema parity with the oracle is untouched by the drop cycle
    got = df2.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = oracle_state.sort_values("doc_id").reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.n_tok) == list(exp.n_tok)


def test_drop_column_rejections(spark, changelog_dir, tmp_path):
    table, eng = _engine(spark, changelog_dir, tmp_path)
    with pytest.raises(ValueError, match="key column"):
        eng.apply_schema_update("DROP_COLUMN", {"name": "doc_id"})
    with pytest.raises(ValueError, match="no such column"):
        eng.apply_schema_update("DROP_COLUMN", {"name": "ghost"})
    assert table.current_epoch() == 0
