"""Merge-on-read write mode: O(delta) epoch appends + `_seq`-resolved
reads converge to the exact same state as copy-on-write, survive
crash/resume and idempotent re-apply, interoperate with CoW epochs,
and leave the CoW read path resolution-free."""

from __future__ import annotations

import pyspark.sql.functions as F

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def test_mor_replay_matches_oracle_and_fragments(
    spark, changelog_dir, oracle_state, tmp_path
):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, write_mode="mor")
    eng.run_to_completion()
    # fragments accumulated: one delta file per touched bucket per epoch
    snap = table.snapshot()
    assert max(len(fs) for fs in snap["files"].values()) >= 3
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # deleted keys stay deleted through resolution (newer tombstone
    # suppresses older live fragments)
    internal = table.read(spark, internal=True)
    assert internal.filter(F.col("_tombstone")).count() > 0
    visible = table.read(spark)
    assert visible.count() == internal.count() - internal.filter(
        F.col("_tombstone")
    ).count()


def test_mor_state_identical_to_cow_including_metadata(
    spark, changelog_dir, tmp_path
):
    """Same changelog, same slicing: the MoR resolved view must equal
    the CoW materialized state row-for-row INCLUDING `_seq` and
    `_tombstone` (both modes pick the same LWW winners)."""
    tc = SnapshotTable.create(str(tmp_path / "cow"), n_buckets=8)
    CdcEngine(spark, changelog_dir, tc, lsn_budget=400).run_to_completion()
    tm = SnapshotTable.create(str(tmp_path / "mor"), n_buckets=8)
    CdcEngine(
        spark, changelog_dir, tm, lsn_budget=400, write_mode="mor"
    ).run_to_completion()
    cow = sorted(map(tuple, tc.read(spark, internal=True).collect()))
    mor = sorted(map(tuple, tm.read(spark, internal=True).collect()))
    assert cow == mor


def test_mor_resume_and_idempotent_reapply(spark, changelog_dir, oracle_state, tmp_path):
    root = str(tmp_path / "t")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, write_mode="mor")
    for _ in range(3):
        eng.run_epoch()
    files_mid = {b: len(fs) for b, fs in table.snapshot()["files"].items()}
    # fresh engine on the same directory resumes from the checkpoints
    eng2 = CdcEngine(
        spark, changelog_dir, SnapshotTable(root), lsn_budget=10**9, write_mode="mor"
    )
    eng2.run_to_completion()
    assert eng2.run_epoch() is None
    # re-applied epochs never double-append fragments
    snap = SnapshotTable(root).snapshot()
    for b, n_mid in files_mid.items():
        assert len(snap["files"][b]) >= n_mid
    paths = [fe["path"] for fs in snap["files"].values() for fe in fs]
    assert len(paths) == len(set(paths)), "duplicate fragment in manifest"
    assert_state_equals_oracle(SnapshotTable(root).read(spark), oracle_state)


def test_mor_compact_mid_replay_then_resume(spark, changelog_dir, oracle_state, tmp_path):
    """Compaction is safe under load: fold fragments halfway through a
    replay, resume on the compacted base, end oracle-exact."""
    root = str(tmp_path / "t")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, write_mode="mor")
    for _ in range(3):
        eng.run_epoch()
    assert table.compact_files(spark, target_bytes=1 << 30)
    assert all(len(fs) == 1 for fs in table.snapshot()["files"].values())
    eng.run_to_completion()
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_cow_epoch_over_fragmented_table_resolves(spark, changelog_dir, oracle_state, tmp_path):
    """Mode interop: MoR fragments, then a CoW engine finishes the
    replay — the CoW merge reads the resolved view and its rewrites
    collapse the touched buckets back to single files."""
    root = str(tmp_path / "t")
    table = SnapshotTable.create(root, n_buckets=8)
    mor = CdcEngine(spark, changelog_dir, table, lsn_budget=400, write_mode="mor")
    for _ in range(3):
        mor.run_epoch()
    cow = CdcEngine(spark, changelog_dir, SnapshotTable(root), lsn_budget=10**9)
    cow.run_to_completion()
    assert_state_equals_oracle(SnapshotTable(root).read(spark), oracle_state)


def test_mor_with_ddl_stream_and_compaction(spark, changelog_dir, oracle_state, tmp_path):
    """Schema evolution under merge-on-read: fragments written under
    DIFFERENT schema versions coexist in one bucket; the read
    normalizes each by field id before `_seq` resolution, and
    compaction rewrites everything under the current version while
    preserving the resolved state."""
    import pyarrow.parquet as pq

    from canal_spark.sources.changelog import generate_ddl_events

    df = pq.read_table(changelog_dir).to_pandas()
    b0 = sorted(int(x) for x in df[(df.source_partition == 0) & df.tx_commit].lsn)
    ddls = [
        {
            "lsn": b0[len(b0) // 2] + 1,
            "source_partition": 0,
            "kind": "RENAME_COLUMN",
            "payload": {"from": "source", "to": "origin"},
        },
    ]
    ddl_path = generate_ddl_events(str(tmp_path / "ddl"), ddls)
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(
        spark, changelog_dir, table, lsn_budget=400,
        ddl_events_path=ddl_path, write_mode="mor",
    )
    eng.run_to_completion()
    assert eng.run_epoch() is None
    snap = table.snapshot()
    assert snap["schema_ver"] == 2
    # mixed-version fragments actually exist pre-compaction
    vers = {fe["schema_ver"] for fs in snap["files"].values() for fe in fs}
    assert vers == {1, 2}
    out = table.read(spark, with_bucket=False)
    assert out.columns == ["doc_id", "tokens", "n_tok", "origin"]
    got = out.select("doc_id", "tokens", "n_tok", F.col("origin").alias("source"))
    assert_state_equals_oracle(got, oracle_state)

    assert table.compact_files(spark, target_bytes=1 << 30)
    snap2 = table.snapshot()
    vers2 = {fe["schema_ver"] for fs in snap2["files"].values() for fe in fs}
    assert vers2 == {2}, "compaction must rewrite under the current schema"
    got2 = table.read(spark, with_bucket=False).select(
        "doc_id", "tokens", "n_tok", F.col("origin").alias("source")
    )
    assert_state_equals_oracle(got2, oracle_state)


def test_auto_compaction_bounds_fragments(spark, changelog_dir, oracle_state, tmp_path):
    """Long MoR run with auto_compact_fragments=3: fragment counts stay
    bounded THROUGHOUT the replay (checked after every epoch), the
    compactions interleave as their own epochs, and the end state is
    oracle-exact."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(
        spark, changelog_dir, table, lsn_budget=400,
        write_mode="mor", auto_compact_fragments=3,
    )
    max_seen = 0
    while eng.run_epoch() is not None:
        snap = table.snapshot()
        max_seen = max(
            max_seen, max(len(fs) for fs in snap["files"].values()) if snap["files"] else 0
        )
    assert max_seen <= 3, f"auto-compaction failed to bound fragments: {max_seen}"
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # more epochs than a pure-DML replay: compactions interleaved
    n_dml = SnapshotTable.create(str(tmp_path / "ref"), n_buckets=8)
    CdcEngine(spark, changelog_dir, n_dml, lsn_budget=400).run_to_completion()
    assert table.current_epoch() > n_dml.current_epoch()


def test_cow_read_path_stays_resolution_free(spark, changelog_dir, tmp_path):
    """The MoR read tax (a key-partitioned window) must not leak into
    copy-on-write tables: single-file buckets read as a plain scan."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    CdcEngine(spark, changelog_dir, table, lsn_budget=10**9).run_to_completion()
    plan = table.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "CoW read must skip _seq resolution"


def test_mor_write_plan_has_no_merge_joins(spark, changelog_dir, tmp_path):
    """The point of MoR: the epoch write is O(delta) — no old-state
    scan, so the table's existing data files never appear in the write
    job. Evidence: after replay, every committed fragment's rows came
    only from the changelog slice (fragment row counts sum to the
    LWW-collapsed delta sizes, far below a full-bucket rewrite)."""
    root = str(tmp_path / "t")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, write_mode="mor")
    eng.run_to_completion()
    snap = table.snapshot()
    n_keys = table.read(spark, internal=True).count()
    total_fragment_rows = sum(
        spark.read.parquet(*[f"{table.root}/{fe['path']}" for fe in fs]).count()
        for fs in snap["files"].values()
    )
    n_epochs = table.current_epoch()
    # CoW would store ~n_keys rows per bucket-rewrite epoch; MoR stores
    # one row per (epoch, changed key): strictly fewer than replaying
    # the resolved state every epoch
    assert total_fragment_rows < n_keys * n_epochs
