"""Snapshot expiration + orphan GC: metadata/data growth stays bounded
without breaking state, resume, idempotence, or retained time travel."""

from __future__ import annotations

import glob
import os

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle


def _replay_many_epochs(spark, changelog_dir, root, lsn_budget=400, write_mode="cow"):
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=lsn_budget, write_mode=write_mode)
    eng.run_to_completion()
    return table, eng


def test_expire_and_gc_preserve_state(spark, changelog_dir, oracle_state, tmp_path):
    table, _ = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t"))
    cur = table.current_epoch()
    assert cur >= 4, "need several epochs for the test to mean anything"
    before = table.read(spark).toPandas()

    n_snaps_before = len(glob.glob(os.path.join(table.meta_dir, "snapshot-*.json")))
    n_files_before = sum(len(fs) for _, _, fs in os.walk(table.data_dir))

    expired = table.expire_snapshots(retain_last=2)
    removed = table.remove_orphans()

    assert expired and max(expired) == cur - 2
    assert removed > 0, "superseded bucket rewrites must be collectable"
    n_snaps_after = len(glob.glob(os.path.join(table.meta_dir, "snapshot-*.json")))
    assert n_snaps_after == 2 and n_snaps_after < n_snaps_before
    n_files_after = sum(len(fs) for _, _, fs in os.walk(table.data_dir))
    assert n_files_after < n_files_before

    # state identical, and still equal to the independent oracle
    assert_state_equals_oracle(table.read(spark), oracle_state)
    after = table.read(spark).toPandas()
    assert len(after) == len(before)


def test_retained_time_travel_and_expired_raises(spark, changelog_dir, tmp_path):
    table, _ = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t2"))
    cur = table.current_epoch()
    table.expire_snapshots(retain_last=2)
    table.remove_orphans()
    # retained previous epoch still time-travels (files are referenced)
    prev = table.read(spark, epoch=cur - 1)
    assert prev.count() >= 0
    # expired epoch is gone
    try:
        table.read(spark, epoch=cur - 2)
        raise AssertionError("expected FileNotFoundError for expired snapshot")
    except FileNotFoundError:
        pass


def test_resume_and_idempotence_survive_gc(spark, changelog_dir, tmp_path):
    root = str(tmp_path / "t3")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(3):
        eng.run_epoch()
    table.expire_snapshots(retain_last=1)
    table.remove_orphans()
    # fresh engine resumes from the (sole retained) current snapshot
    t2 = SnapshotTable(root)
    eng2 = CdcEngine(spark, changelog_dir, t2, lsn_budget=10**9)
    eng2.run_to_completion()
    assert eng2.run_epoch() is None  # idempotent no-op at the end
    from tests.oracle_replay import replay

    assert_state_equals_oracle(t2.read(spark), replay(changelog_dir))


def test_lineage_archived_across_expiration(spark, changelog_dir, tmp_path):
    table, _ = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t4"))
    total_before = int(table.lineage_df(spark).toPandas().n_events.sum())
    table.expire_snapshots(retain_last=2)
    snap = table.snapshot(table.current_epoch() - 1)
    archived = sum(r["n_events"] for r in snap.get("lineage_archive", []))
    kept = int(table.lineage_df(spark).toPandas().n_events.sum())
    assert archived + kept == total_before


def test_tombstone_compaction_safe_and_effective(spark, changelog_dir, oracle_state, tmp_path):
    table, eng = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t5"))
    import pyspark.sql.functions as F

    from canal_spark.operators.lww import SP_BITS

    tombs = table.read(spark, internal=True).filter(F.col("_tombstone"))
    n_tomb_before = tombs.count()
    assert n_tomb_before > 0, "fixture must produce deletes"
    # the collectable set is bounded by the WEAKEST partition checkpoint
    # (a tombstone above that bound could in principle still be raced
    # by a late lower-_seq event from another partition)
    bound = min((lsn + 1) << SP_BITS for lsn in table.checkpoints().values())
    n_collectable = tombs.filter(F.col("_seq") < bound).count()
    assert n_collectable > 0

    dropped = table.compact_tombstones(spark)
    assert dropped == n_collectable
    remaining = (
        table.read(spark, internal=True).filter(F.col("_tombstone")).count()
    )
    assert remaining == n_tomb_before - n_collectable
    # every survivor is above the safety bound
    assert (
        table.read(spark, internal=True)
        .filter(F.col("_tombstone") & (F.col("_seq") < bound))
        .count()
        == 0
    )
    # visible state unchanged and still oracle-exact
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # re-apply after compaction still a no-op; second compaction is a no-op
    assert eng.run_epoch() is None
    assert table.compact_tombstones(spark) == 0


def test_tombstone_compaction_mid_replay_keeps_live_tombstones(spark, changelog_dir, tmp_path):
    """Mid-replay, tombstones newer than the weakest checkpoint must
    survive compaction (a late lower-_seq event could still arrive)."""
    import pyspark.sql.functions as F

    from canal_spark.operators.lww import SP_BITS

    root = str(tmp_path / "t6")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(2):
        eng.run_epoch()
    ckpts = table.checkpoints()
    bound = min((lsn + 1) << SP_BITS for lsn in ckpts.values())
    live_before = (
        table.read(spark, internal=True)
        .filter(F.col("_tombstone") & (F.col("_seq") >= bound))
        .count()
    )
    table.compact_tombstones(spark)
    live_after = (
        table.read(spark, internal=True)
        .filter(F.col("_tombstone") & (F.col("_seq") >= bound))
        .count()
    )
    assert live_after == live_before
    # and the replay still converges to the oracle afterwards
    eng2 = CdcEngine(spark, changelog_dir, SnapshotTable(root), lsn_budget=10**9)
    eng2.run_to_completion()
    from tests.oracle_replay import replay

    assert_state_equals_oracle(SnapshotTable(root).read(spark), replay(changelog_dir))


def test_lineage_archive_survives_second_expiration(spark, changelog_dir, tmp_path):
    """Two expiration cycles: the first cycle's archive rides on a
    snapshot that the second cycle expires — its totals must be folded
    forward, not dropped (per-partition totals stay auditable)."""
    root = str(tmp_path / "t6")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    total = 0
    for _ in range(3):
        res = eng.run_epoch()
        total += res.n_events
    table.expire_snapshots(retain_last=1)
    for _ in range(2):
        res = eng.run_epoch()
        if res is None:
            break
        total += res.n_events
    table.expire_snapshots(retain_last=1)  # expires the archive-holder
    snap = table.snapshot()
    archived = sum(r["n_events"] for r in snap.get("lineage_archive", []))
    kept = int(table.lineage_df(spark).toPandas().n_events.sum() or 0)
    assert archived + kept == total


def test_compact_waits_for_unchecked_partition(spark, changelog_dir, oracle_state, tmp_path):
    """A source partition with no committed checkpoint forces the
    safety bound to 0: nothing compacts until it commits (a late
    lower-_seq event from it could otherwise resurrect a deleted key)."""
    import pyspark.sql.functions as F

    table, eng = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t7"))
    n_tomb = table.read(spark, internal=True).filter(F.col("_tombstone")).count()
    assert n_tomb > 0
    # partition 99 exists "in the changelog" but never committed
    known = sorted(eng.extents) + [99]
    assert table.compact_tombstones(spark, source_partitions=known) == 0
    assert (
        table.read(spark, internal=True).filter(F.col("_tombstone")).count() == n_tomb
    )
    # with the true full partition set, compaction proceeds
    dropped = table.compact_tombstones(spark, source_partitions=sorted(eng.extents))
    assert dropped > 0
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_remove_orphans_age_guard(spark, changelog_dir, tmp_path):
    """min_age_seconds spares young unreferenced files (the in-flight
    epoch guard); a zero cutoff sweeps them."""
    table, _ = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t8"))
    table.expire_snapshots(retain_last=1)
    assert table.remove_orphans(min_age_seconds=3600) == 0
    assert table.remove_orphans() > 0


def test_engine_compact_wrapper_uses_full_partition_set(spark, changelog_dir, oracle_state, tmp_path):
    table, eng = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "t9"))
    dropped = eng.compact_tombstones()
    assert dropped > 0
    assert_state_equals_oracle(table.read(spark), oracle_state)


def test_compact_files_binpacks_and_preserves_state(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Many small merge-on-read epochs fragment every bucket (one delta
    file per touched bucket per epoch); compact_files bin-packs each
    over-fragmented bucket as ONE commit epoch with read() output
    identical (including merge metadata), file counts at the bin-pack
    bound, and a second compaction a no-op."""
    table, eng = _replay_many_epochs(
        spark, changelog_dir, str(tmp_path / "tc"), write_mode="mor"
    )
    pre_epoch = table.current_epoch()
    snap = table.snapshot()
    frag = {int(b): len(fs) for b, fs in snap["files"].items()}
    assert max(frag.values()) >= 3, "fixture must fragment buckets"
    before = sorted(
        map(tuple, table.read(spark, internal=True).collect())
    )

    result = table.compact_files(spark, target_bytes=1 << 30)
    assert result, "fragmented buckets must be compacted"
    assert table.current_epoch() == pre_epoch + 1
    snap2 = table.snapshot()
    for b, fs in snap2["files"].items():
        assert len(fs) == 1, f"bucket {b} not packed to 1 file: {len(fs)}"
    after = sorted(
        map(tuple, table.read(spark, internal=True).collect())
    )
    assert after == before, "compaction must not change row content"
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # time travel to the pre-compaction snapshot still works
    assert table.read(spark, epoch=pre_epoch).count() == table.read(spark).count()
    # second compaction: everything already at the bin-pack bound
    assert table.compact_files(spark, target_bytes=1 << 30) == {}
    # replay re-apply after compaction is still a no-op
    assert eng.run_epoch() is None


def test_compact_files_respects_target_bytes(spark, changelog_dir, tmp_path):
    """A tiny target splits a bucket into multiple output files: the
    per-bucket count stays within the planned ceil(bytes/target)."""
    import math
    import os as _os

    table, _ = _replay_many_epochs(
        spark, changelog_dir, str(tmp_path / "tt"), write_mode="mor"
    )
    snap = table.snapshot()
    target = 4096
    goals = {}
    for b, fs in snap["files"].items():
        total = sum(
            _os.path.getsize(_os.path.join(table.root, fe["path"])) for fe in fs
        )
        goals[int(b)] = max(1, math.ceil(total / target))
    res = table.compact_files(spark, target_bytes=target)
    snap2 = table.snapshot()
    for b, (n_before, n_after) in res.items():
        assert n_after <= goals[b], f"bucket {b}: {n_after} files > goal {goals[b]}"
        assert len(snap2["files"][str(b)]) == n_after
    # the slice hash must actually SPLIT buckets whose bytes exceed the
    # target (regression: a slice hash correlated with the bucket hash
    # collapses every bucket to one slice at power-of-two bucket counts,
    # silently emitting files far above target_bytes)
    multi = [b for b, (_, n_after) in res.items() if n_after >= 2]
    assert multi, f"tiny target must split some bucket: {res}"
    # and a size-split BASE is not mistaken for fragments: reads stay
    # resolution-free (no key-shuffle window) after compaction
    plan = table.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "bin-packed base must not pay MoR resolution"
    before = {(r["doc_id"], r["n_tok"]) for r in table.read(spark).collect()}
    assert len(before) == table.read(spark).count()


def test_crashed_compaction_is_invisible_and_rerunnable(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Crash between the data write and the snapshot rename: the
    orphaned files are invisible to readers, a fresh run redoes the
    compaction cleanly, and orphan GC collects the leftovers."""
    root = str(tmp_path / "tx")
    table, eng = _replay_many_epochs(spark, changelog_dir, root, write_mode="mor")
    pre_epoch = table.current_epoch()
    before = table.read(spark).toPandas()

    real_commit = SnapshotTable.commit
    try:
        def _boom(self, *a, **k):
            raise RuntimeError("simulated crash before manifest rename")

        SnapshotTable.commit = _boom
        try:
            table.compact_files(spark, target_bytes=1 << 30)
            raise AssertionError("expected simulated crash")
        except RuntimeError:
            pass
    finally:
        SnapshotTable.commit = real_commit

    # nothing visible changed
    assert table.current_epoch() == pre_epoch
    assert len(table.read(spark).toPandas()) == len(before)
    # re-run on a fresh handle completes the compaction
    t2 = SnapshotTable(root)
    assert t2.compact_files(spark, target_bytes=1 << 30)
    assert t2.current_epoch() == pre_epoch + 1
    assert_state_equals_oracle(t2.read(spark), oracle_state)
    # replay continues cleanly after the repaired compaction
    assert eng.run_epoch() is None
    # expire + GC now reclaims the superseded fragments
    t2.expire_snapshots(retain_last=1)
    assert t2.remove_orphans() > 0
    assert_state_equals_oracle(t2.read(spark), oracle_state)


def test_rebucket_mid_replay_preserves_state_and_resume(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Bucket-layout evolution under load: grow 8 -> 32 buckets halfway
    through a replay; the engine resumes against the new layout (bucket
    count is re-read from the snapshot each epoch) and final state
    stays oracle-exact; old snapshots still time-travel."""
    import pyspark.sql.functions as F

    from canal_spark.plans.table import bucket_expr

    root = str(tmp_path / "tr")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(3):
        eng.run_epoch()
    pre_epoch = table.current_epoch()
    pre_rows = table.read(spark).count()

    e = table.rebucket(spark, 32)
    assert e == pre_epoch + 1
    snap = table.snapshot()
    assert snap["n_buckets"] == 32
    assert table.read(spark).count() == pre_rows
    # every row actually lives in its hash bucket of the NEW layout
    misrouted = (
        table.read(spark)
        .filter(F.col("bucket") != bucket_expr("doc_id", 32))
        .count()
    )
    assert misrouted == 0
    # time travel to the pre-rebucket epoch still reads the old layout
    assert table.read(spark, epoch=pre_epoch).count() == pre_rows

    eng.run_to_completion()
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # new epochs wrote only buckets < 32 and pruned reads still work
    some_bucket = int(table.read(spark).select("bucket").first()[0])
    pruned = table.read(spark, buckets=[some_bucket])
    assert 0 < pruned.count() < pre_rows


# ----------------------------------------------------------------------
# predicate DELETE (delete_where) — takedown path
# ----------------------------------------------------------------------
def test_delete_where_matches_filtered_oracle(spark, changelog_dir, oracle_state, tmp_path):
    table, eng = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "dw"))
    n_src2 = int((oracle_state.source == "src2").sum())
    assert n_src2 > 0, "fixture must have src2 rows"
    hits = table.delete_where(spark, "source = 'src2'")
    assert sum(hits.values()) == n_src2
    assert_state_equals_oracle(
        table.read(spark), oracle_state[oracle_state.source != "src2"]
    )
    # no-match second pass commits nothing
    e = table.current_epoch()
    assert table.delete_where(spark, "source = 'src2'") == {}
    assert table.current_epoch() == e
    # time travel: pre-delete snapshot still oracle-exact
    assert_state_equals_oracle(table.read(spark, epoch=e - 1), oracle_state)
    # re-apply of the last engine epoch is still a no-op post-delete
    assert eng.run_epoch() is None


def test_delete_where_predicate_cannot_see_internals(spark, changelog_dir, tmp_path):
    """ADVICE r5: the predicate is scoped to USER columns — referencing
    merge metadata must raise (explicit resolution error), never
    silently delete on `_seq`/`_tombstone`/`bucket`."""
    import pytest

    table, _eng = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "dwi"))
    before = table.current_epoch()
    for pred in ("_seq > 0", "_tombstone", "bucket = 0"):
        with pytest.raises(Exception, match="_seq|_tombstone|bucket|resolve|UNRESOLVED"):
            table.delete_where(spark, pred)
    assert table.current_epoch() == before  # nothing committed


def test_delete_where_null_predicate_keeps_rows(spark, changelog_dir, oracle_state, tmp_path):
    """SQL DELETE semantics: only definite TRUE matches are deleted —
    a predicate evaluating to NULL keeps the row. n_tok IS NULL never
    happens for visible rows, so build a NULL-producing predicate from
    element_at past the array end (NULL for short token arrays)."""
    table, _ = _replay_many_epochs(spark, changelog_dir, str(tmp_path / "dwn"))
    import pyspark.sql.functions as F

    pred = "try_element_at(tokens, 9) > 0"  # NULL where n_tok < 9
    vis = table.read(spark)
    expected = vis.filter(F.expr(pred)).count()
    nulls = vis.filter(F.expr(pred).isNull()).count()
    assert expected > 0 and nulls > 0, "fixture must exercise both sides"
    hits = table.delete_where(spark, pred)
    assert sum(hits.values()) == expected
    after = table.read(spark)
    assert after.filter(F.expr(pred)).count() == 0
    assert after.filter(F.expr(pred).isNull()).count() == nulls


def test_delete_where_physical_removal_allows_reinsert(spark, changelog_dir, tmp_path):
    """delete_where physically removes rows (no tombstone): a LATER
    event for the key re-inserts it — the documented difference from
    an in-band DELETE event, whose tombstone shields the key. Uses a
    PRIVATE copy of the changelog so the session fixture stays clean."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from canal_spark.sources.changelog import SCHEMA as CH_SCHEMA

    log = str(tmp_path / "dwr_log")
    shutil.copytree(changelog_dir, log)
    table, _ = _replay_many_epochs(spark, log, str(tmp_path / "dwr"))
    victim = table.read(spark).select("doc_id").first()["doc_id"]
    hits = table.delete_where(spark, f"doc_id = '{victim}'")
    assert sum(hits.values()) == 1
    assert table.read(spark).filter(f"doc_id = '{victim}'").count() == 0
    # append a new changelog file carrying a later INSERT for the victim
    max_lsn = max(table.checkpoints().values())
    row = {
        "op": ["INSERT"], "doc_id": [victim], "lsn": [max_lsn + 10],
        "source_partition": [0], "tx_id": [10**9], "tx_commit": [True],
        "ts": pa.array([1_767_225_600_000_000 + 10**9], type=pa.timestamp("us")),
        "tokens": [[7, 7, 7]], "n_tok": [3], "source": ["src0"],
        "schema_ver": [1],
    }
    pq.write_table(
        pa.table(row, schema=CH_SCHEMA), os.path.join(log, "part-reinsert.parquet")
    )
    # extents are computed once per engine run (by design): a resumed
    # tail is a FRESH engine against the same table + checkpoints
    CdcEngine(spark, log, table, lsn_budget=400).run_to_completion()
    back = table.read(spark).filter(f"doc_id = '{victim}'").collect()
    assert len(back) == 1 and list(back[0]["tokens"]) == [7, 7, 7]
