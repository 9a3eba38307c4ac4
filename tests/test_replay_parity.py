"""North-rule parity: full changelog replay == independent pandas oracle,
row-by-row with token-array equality; invariant under epoch chunking."""

from __future__ import annotations

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def _run(spark, changelog_dir, tmp_path, lsn_budget, name, **kw):
    table = SnapshotTable.create(str(tmp_path / name), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=lsn_budget, **kw)
    eng.run_to_completion()
    return table


def test_single_epoch_replay_parity(spark, changelog_dir, oracle_state, tmp_path):
    table = _run(spark, changelog_dir, tmp_path, lsn_budget=10**9, name="t1")
    assert table.current_epoch() == 1
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_many_epoch_replay_parity_and_chunking_invariance(
    spark, changelog_dir, oracle_state, tmp_path
):
    table = _run(spark, changelog_dir, tmp_path, lsn_budget=500, name="t2")
    assert table.current_epoch() > 3  # genuinely chunked
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_odd_chunk_sizes_same_state(spark, changelog_dir, tmp_path):
    a = _run(spark, changelog_dir, tmp_path, lsn_budget=777, name="t3")
    b = _run(spark, changelog_dir, tmp_path, lsn_budget=1301, name="t4")
    pa = a.read(spark).select("doc_id", "n_tok").toPandas().sort_values("doc_id")
    pb = b.read(spark).select("doc_id", "n_tok").toPandas().sort_values("doc_id")
    assert list(pa.doc_id) == list(pb.doc_id)
    assert list(pa.n_tok) == list(pb.n_tok)


def test_checkpoints_advance_monotonically(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t5"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=800)
    prev: dict[int, int] = {}
    while (res := eng.run_epoch()) is not None:
        for p, lsn in res.checkpoints.items():
            assert lsn >= prev.get(p, -1)
        prev = res.checkpoints
    # final checkpoints reach each partition's last committed lsn
    assert all(v > 0 for v in table.checkpoints().values())


def test_lineage_accounts_for_all_applied_events(spark, changelog_dir, tmp_path):
    table = _run(spark, changelog_dir, tmp_path, lsn_budget=900, name="t6")
    lin = table.lineage_df(spark).toPandas()
    assert (lin.n_events == lin.n_upserts + lin.n_deletes).all()
    assert (lin.max_lsn >= lin.min_lsn).all()
    # heartbeats never reach the apply path: ops counted are row changes
    assert lin.n_events.sum() > 0
