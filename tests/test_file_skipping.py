"""Round-4 table-layer upgrades: per-file manifest column bounds
(Iceberg lower/upper_bounds analog) with read-side file skipping,
overlap-aware merge-on-read resolution, manifest-diff pruning in
read_changes, and optimistic-commit compaction that is safe against a
concurrent writer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canal_spark.engine import CdcEngine
from canal_spark.operators.merge import append_epoch, merge_epoch
from canal_spark.plans.table import SnapshotTable


def _delta(spark, keys, seq0=0, op="INSERT"):
    rows = [(k, [i, i + 1], 2, "s0", op, seq0 + i) for i, k in enumerate(keys)]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, op string, _seq long"
    )


def _commit_base(spark, table, keys, seq0=0):
    epoch = (table.current_epoch() or 0) + 1
    files = merge_epoch(spark, table, _delta(spark, keys, seq0), epoch)
    table.commit(epoch, files, {}, [])
    return epoch


def _commit_frag(spark, table, keys, seq0, op="INSERT"):
    epoch = (table.current_epoch() or 0) + 1
    files = append_epoch(spark, table, _delta(spark, keys, seq0, op), epoch)
    table.commit(epoch, files, {}, [], append=True)
    return epoch


def keys(prefix, n, start=0):
    return [f"{prefix}{i:04d}" for i in range(start, start + n)]


# ---------------------------------------------------------------- bounds


def test_manifest_entries_carry_key_and_seq_bounds(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    _commit_base(spark, table, keys("a", 50))
    for fes in table.snapshot()["files"].values():
        for fe in fes:
            assert fe["key_min"].startswith("a") and fe["key_max"].startswith("a")
            assert fe["key_min"] <= fe["key_max"]
            assert 0 <= fe["seq_min"] <= fe["seq_max"] < 50


def test_key_range_read_opens_only_overlapping_files(spark, tmp_path):
    """A key-range read must skip every data file whose manifest bounds
    cannot overlap the range (file-level skipping, not row filtering)."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=1)
    _commit_base(spark, table, keys("a", 40))
    _commit_frag(spark, table, keys("m", 30), seq0=1000)
    _commit_frag(spark, table, keys("z", 20), seq0=2000)
    all_files = {fe["path"] for fes in table.snapshot()["files"].values() for fe in fes}
    assert len(all_files) == 3

    df = table.read(spark, key_range=("z0000", "z9999"))
    opened = {p.split("/data/", 1)[1] for p in df.inputFiles()}
    assert len(opened) == 1 and next(iter(opened)).startswith("epoch=3")
    assert df.count() == 20

    # point lookup: (k, k)
    df1 = table.read(spark, key_range=("m0005", "m0005"))
    assert len(df1.inputFiles()) == 1
    assert [r["doc_id"] for r in df1.collect()] == ["m0005"]

    # unbounded side + residual row trim on the conservatively-kept file
    df2 = table.read(spark, key_range=(None, "a0009"))
    assert len(df2.inputFiles()) == 1
    assert df2.count() == 10


# --------------------------------------------- overlap-aware resolution


def test_disjoint_fragment_bypasses_resolution_window(spark, tmp_path):
    """A fragment whose key range overlaps no other file in the bucket
    cannot conflict — the read must stay a plain scan (no window)."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=1)
    _commit_base(spark, table, keys("a", 40))
    _commit_frag(spark, table, keys("z", 20), seq0=1000)
    df = table.read(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "range-disjoint fragment must scan plain"
    assert df.count() == 60


def test_overlapping_fragment_resolves_only_conflicting_files(spark, tmp_path):
    """With one fragment overlapping the base and one disjoint, the
    window covers exactly the conflicting component; the result equals
    the fully-resolved (compacted) state."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=1)
    _commit_base(spark, table, keys("a", 40))
    _commit_frag(spark, table, keys("z", 20), seq0=1000)
    # overlaps the base: updates a0000..a0009 with higher _seq
    _commit_frag(spark, table, keys("a", 10), seq0=2000)
    df = table.read(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    got = sorted(map(tuple, df.collect()))
    table.compact_files(spark)
    resolved = sorted(map(tuple, table.read(spark).collect()))
    assert got == resolved
    # updated keys carry the fragment's tokens (higher _seq wins)
    upd = dict(
        (r["doc_id"], r["tokens"])
        for r in df.filter(F.col("doc_id") < "a0010").collect()
    )
    assert upd["a0003"] == [3, 4]


def test_resolution_set_conflict_components():
    mk = lambda lo, hi, frag=False: {
        "path": "x", "schema_ver": 1,
        **({"frag": True} if frag else {}),
        "key_min": lo, "key_max": hi,
    }
    # base slices overlap each other but never conflict without a frag
    assert SnapshotTable._resolution_set([mk("a", "m"), mk("b", "z")]) == [False, False]
    # frag overlapping one base pulls exactly that base into the window
    assert SnapshotTable._resolution_set(
        [mk("a", "f"), mk("g", "p"), mk("d", "e", frag=True)]
    ) == [True, False, True]
    # boundless entry = conservative overlap with everything
    no_bounds = {"path": "x", "schema_ver": 1, "frag": True}
    assert SnapshotTable._resolution_set([mk("a", "f"), no_bounds]) == [True, True]
    # two disjoint frags: neither can conflict
    assert SnapshotTable._resolution_set(
        [mk("a", "f", frag=True), mk("g", "p", frag=True)]
    ) == [False, False]


def test_entry_in_range_tolerates_type_mismatch():
    """A query bound unorderable against the stored footer bounds must
    answer 'maybe' (keep the file), never raise — pruning is an
    optimization; the Spark residual filter decides."""
    fe = {"path": "x", "key_min": 100, "key_max": 200}
    assert SnapshotTable._entry_in_range(fe, "100", "100") is True
    assert SnapshotTable._entry_in_range(fe, 201, 300) is False
    assert SnapshotTable._entry_in_range(fe, 150, None) is True


# -------------------------------------------------- read_changes pruning


def test_read_changes_validates_epoch_order(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    _commit_base(spark, table, keys("a", 10))
    with pytest.raises(ValueError, match="from_epoch"):
        table.read_changes(spark, from_epoch=1, to_epoch=0)


def test_read_changes_opens_only_differing_buckets(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(3):
        eng.run_epoch()
    e0 = table.current_epoch()
    eng.lsn_budget = 2  # a handful of events — most buckets untouched
    eng.run_epoch()
    e1 = table.current_epoch()
    sa, sb = table.snapshot(e0), table.snapshot(e1)
    diff = {
        bk
        for bk in set(sa["files"]) | set(sb["files"])
        if sa["files"].get(bk) != sb["files"].get(bk)
    }
    allowed = {
        fe["path"]
        for s in (sa, sb)
        for bk in diff
        for fe in s["files"].get(bk, [])
    }
    ch = table.read_changes(spark, from_epoch=e0, to_epoch=e1)
    opened = {p.split(str(tmp_path / "t") + "/", 1)[1] for p in ch.inputFiles()}
    assert opened and opened <= allowed
    # and the unchanged buckets' files really were excluded
    total = {
        fe["path"] for s in (sa, sb) for fes in s["files"].values() for fe in fes
    }
    assert len(total) > len(allowed)


# ------------------------------------------- optimistic-commit compaction


def test_compact_files_retries_on_concurrent_commit(spark, tmp_path, monkeypatch):
    """A commit landing between compaction's snapshot read and its
    publish must not be clobbered: compaction loses the race, replans
    on the new snapshot, and succeeds on retry."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    _commit_base(spark, table, keys("a", 40))
    for i in range(3):
        _commit_frag(spark, table, keys("a", 5, start=10 * i), seq0=1000 * (i + 1))
    pre_epoch = table.current_epoch()
    before = sorted(map(tuple, table.read(spark).collect()))
    raced = _race_once(monkeypatch)
    folded = table.compact_files(spark)
    assert raced["done"] and folded, "compaction must succeed after the conflict"
    # conflict epoch + compaction epoch
    assert table.current_epoch() == pre_epoch + 2
    assert sorted(map(tuple, table.read(spark).collect())) == before
    assert not any(
        fe.get("frag") for fes in table.snapshot()["files"].values() for fe in fes
    )


def test_compact_files_rejects_nonpositive_target(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="target_bytes"):
        table.compact_files(spark, target_bytes=0)


def test_compact_files_bucket_subset_folds_only_requested(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    _commit_base(spark, table, keys("a", 200))
    _commit_frag(spark, table, keys("a", 30), seq0=1000)
    snap = table.snapshot()
    fragged = sorted(
        int(b) for b, fes in snap["files"].items() if any(fe.get("frag") for fe in fes)
    )
    assert len(fragged) == 2
    target = fragged[0]
    res = table.compact_files(spark, buckets=[target])
    assert set(res) == {target}
    snap2 = table.snapshot()
    assert not any(fe.get("frag") for fe in snap2["files"][str(target)])
    assert any(fe.get("frag") for fe in snap2["files"][str(fragged[1])])


def _race_once(monkeypatch):
    """Patch _write_snapshot so the FIRST publish is preceded by a
    concurrent carry-forward commit stealing the epoch number."""
    real_write = SnapshotTable._write_snapshot
    raced = {"done": False}

    def racing_write(self, snap):
        if not raced["done"]:
            raced["done"] = True
            parent = self.snapshot(snap["epoch"] - 1)
            stolen = {**parent, "epoch": snap["epoch"], "parent": snap["epoch"] - 1}
            real_write(self, stolen)
        return real_write(self, snap)

    monkeypatch.setattr(SnapshotTable, "_write_snapshot", racing_write)
    return raced


def test_compact_tombstones_retries_on_concurrent_commit(
    spark, changelog_dir, oracle_state, tmp_path, monkeypatch
):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=10**9)
    eng.run_to_completion()
    pre = table.current_epoch()
    before = sorted(map(tuple, table.read(spark).collect()))
    raced = _race_once(monkeypatch)
    dropped = eng.compact_tombstones()
    assert raced["done"] and dropped > 0
    assert table.current_epoch() == pre + 2  # conflict epoch + gc epoch
    assert sorted(map(tuple, table.read(spark).collect())) == before
    # fixpoint: every COLLECTABLE tombstone went (those above the
    # weakest-partition bound legitimately remain)
    assert eng.compact_tombstones() == 0


def test_rebucket_retries_on_concurrent_commit(spark, tmp_path, monkeypatch):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    _commit_base(spark, table, keys("a", 60))
    before = sorted(map(tuple, table.read(spark, with_bucket=False).collect()))
    raced = _race_once(monkeypatch)
    epoch = table.rebucket(spark, 8)
    assert raced["done"]
    snap = table.snapshot()
    assert snap["epoch"] == epoch and snap["n_buckets"] == 8
    assert sorted(map(tuple, table.read(spark, with_bucket=False).collect())) == before


def test_pipelined_replay_survives_lost_commit_race(
    spark, changelog_dir, oracle_state, tmp_path, monkeypatch
):
    """A maintenance commit stealing an epoch number mid-replay must
    not lose that epoch's slice: the engine discards the speculative
    next-epoch prep and replans from the durable state, and the final
    table still matches the oracle replay exactly."""
    from tests.conftest import assert_state_equals_oracle

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    raced = _race_once(monkeypatch)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    eng.run_to_completion()
    assert raced["done"], "the race must have fired"
    assert_state_equals_oracle(table.read(spark), oracle_state)
    # checkpoints cover the whole log: nothing was skipped
    assert eng.run_epoch() is None


def test_point_lookup_prunes_to_key_bucket(spark, tmp_path):
    """Hash bucketing scatters every key range across all buckets, so
    manifest bounds alone cannot exclude other buckets' files for a
    point key — the bucket function can: a point lookup must open only
    files of the key's own bucket."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    _commit_base(spark, table, keys("a", 200))
    target = "a0042"
    df = table.read(spark, key_range=(target, target))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == target
    b = rows[0]["bucket"]
    opened = df.inputFiles()
    assert len(opened) == 1 and f"bucket={b}/" in opened[0]
    # range lookups (lo != hi) still scan all overlapping buckets
    rng = table.read(spark, key_range=("a0000", "a0099"))
    assert rng.count() == 100
