"""CDF before-images + incremental materialized-aggregate maintenance.

before_<col> columns are the canal FlatMessage `old` / Delta CDF
update_preimage analog; MaterializedAggregate applies the classic
+after/-before algebra, so its state after N incremental refreshes must
equal the from-scratch aggregate of the final snapshot — including rows
that MIGRATE groups when an update changes the group column."""

from __future__ import annotations

import pyspark.sql.functions as F

from canal_spark.engine import CdcEngine
from canal_spark.operators.mv import MaterializedAggregate
from canal_spark.plans.table import SnapshotTable

COLS = ["doc_id", "tokens", "n_tok", "source"]


def _frames_equal(x, y) -> bool:
    return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0


def _full_recompute(spark, table):
    return (
        table.read(spark, with_bucket=False)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("n_tok").cast("long")).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------- CDF
def test_before_images_match_prior_snapshot(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    for _ in range(3):
        eng.run_epoch()
    e1 = table.current_epoch()
    eng.run_to_completion()
    final = table.current_epoch()

    changes = table.read_changes(spark, e1, final, with_before=True)
    assert {f"before_{c}" for c in COLS if c != "doc_id"} <= set(changes.columns)

    # INSERT rows carry no before-image; UPDATE/DELETE carry exactly
    # the visible old image (join back against snapshot a)
    assert (
        changes.filter(
            (F.col("op") == "INSERT") & F.col("before_n_tok").isNotNull()
        ).count()
        == 0
    )
    state_a = table.read(spark, epoch=e1, with_bucket=False).select(
        "doc_id",
        F.col("tokens").alias("a_tokens"),
        F.col("n_tok").alias("a_n_tok"),
        F.col("source").alias("a_source"),
    )
    old_sides = changes.filter(F.col("op") != "INSERT")
    joined = old_sides.join(state_a, "doc_id", "inner")
    assert joined.count() == old_sides.count(), "every before-image row is in state(a)"
    mismatched = joined.filter(
        (F.col("before_n_tok") != F.col("a_n_tok"))
        | (F.col("before_source") != F.col("a_source"))
        | (F.col("before_tokens") != F.col("a_tokens"))
    )
    assert mismatched.count() == 0


def test_before_images_without_flag_absent(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    CdcEngine(spark, changelog_dir, table, lsn_budget=10**9).run_to_completion()
    changes = table.read_changes(spark, 0, table.current_epoch())
    assert not [c for c in changes.columns if c.startswith("before_")]


# ----------------------------------------------------------------- MV
def test_mv_incremental_equals_recompute(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    mv = MaterializedAggregate(table, str(tmp_path / "mv"))
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400)
    refreshes = 0
    while eng.run_epoch() is not None:
        if mv.refresh(spark) is not None:
            refreshes += 1
    assert refreshes >= 3, "the replay must actually split into epochs"
    assert mv.current_epoch() == table.current_epoch()
    assert _frames_equal(mv.read(spark), _full_recompute(spark, table))


def test_mv_raw_captured_feed_multi_epoch_gap(spark, changelog_dir, tmp_path):
    """r6 raw-capture fast path: a capture-fed MV refreshed LAZILY
    (every third epoch, so read_changes_raw unions several epochs'
    capture files, including cross-epoch insert→update→delete chains)
    must equal both the per-epoch diff-fed MV and the from-scratch
    aggregate — the additive algebra telescopes across epochs."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    mv_cap = MaterializedAggregate(
        table, str(tmp_path / "mvc"), feed_source="captured"
    )
    mv_diff = MaterializedAggregate(
        table, str(tmp_path / "mvd"), feed_source="diff"
    )
    eng = CdcEngine(
        spark, changelog_dir, table, lsn_budget=400, capture_changes=True
    )
    epochs = 0
    while eng.run_epoch() is not None:
        epochs += 1
        mv_diff.refresh(spark)
        if epochs % 3 == 0:
            mv_cap.refresh(spark)
    mv_cap.refresh(spark)  # catch up the tail
    assert epochs >= 3
    assert _frames_equal(mv_cap.read(spark), mv_diff.read(spark))
    assert _frames_equal(mv_cap.read(spark), _full_recompute(spark, table))


def test_mv_handles_group_migration(spark, tmp_path):
    """An UPDATE that changes the group column must retract from the
    old group and add to the new one — the before-image is what makes
    this possible without per-key consumer state."""
    import datetime

    log = str(tmp_path / "log")
    ts = datetime.datetime(2026, 1, 1)
    rows = [
        # key a: insert in g1, then migrate to g2
        ("INSERT", "a", 1, 0, 1, True, ts, [1], 10, "g1", 1),
        ("INSERT", "b", 2, 0, 2, True, ts, [2], 20, "g1", 1),
        ("UPDATE", "a", 3, 0, 3, True, ts, [3], 11, "g2", 1),
        # key c: insert then delete -> retract entirely
        ("INSERT", "c", 4, 0, 4, True, ts, [4], 40, "g3", 1),
        ("DELETE", "c", 5, 0, 5, True, ts, None, None, None, 1),
    ]
    sdf = spark.createDataFrame(
        rows,
        "op string, doc_id string, lsn long, source_partition int, "
        "tx_id long, tx_commit boolean, ts timestamp, tokens array<int>, "
        "n_tok int, source string, schema_ver int",
    )
    sdf.coalesce(1).write.parquet(log)

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=2)
    mv = MaterializedAggregate(table, str(tmp_path / "mv"))
    eng = CdcEngine(spark, log, table, lsn_budget=2)  # several epochs
    while eng.run_epoch() is not None:
        mv.refresh(spark)

    got = {r["source"]: (r["cnt"], r["sum_value"]) for r in mv.read(spark).collect()}
    assert got == {"g1": (1, 20), "g2": (1, 11)}, got


def test_mv_refresh_idempotent_and_compaction_noop(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    mv = MaterializedAggregate(table, str(tmp_path / "mv"))
    CdcEngine(
        spark, changelog_dir, table, lsn_budget=400, write_mode="mor"
    ).run_to_completion()
    assert mv.refresh(spark) == table.current_epoch()
    before = mv.read(spark)
    # already current -> no-op
    assert mv.refresh(spark) is None
    # a compaction epoch changes no logical rows: the refresh advances
    # the pointer but the aggregate values are unchanged
    pre_compact = table.current_epoch()
    table.compact_files(spark, target_bytes=1 << 30)
    assert table.current_epoch() > pre_compact, "fixture must actually compact"
    assert mv.refresh(spark) == table.current_epoch()
    assert _frames_equal(mv.read(spark), before)
    assert _frames_equal(mv.read(spark), _full_recompute(spark, table))


def test_mv_crash_before_pointer_recovers(spark, changelog_dir, tmp_path, monkeypatch):
    """Crash between the state parquet write and the pointer rename:
    the next refresh recomputes the same delta and publishes — no
    double-count, no loss."""
    import os as _os

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    mv = MaterializedAggregate(table, str(tmp_path / "mv"))
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=1200)
    eng.run_epoch()
    assert mv.refresh(spark) is not None
    eng.run_to_completion()

    real_replace = _os.replace

    def boom(src, dst):
        raise RuntimeError("simulated crash before pointer publish")

    monkeypatch.setattr("canal_spark.operators.mv.os.replace", boom)
    try:
        mv.refresh(spark)
    except RuntimeError:
        pass
    monkeypatch.setattr("canal_spark.operators.mv.os.replace", real_replace)
    # pointer still at the first refresh; re-refresh applies the same
    # delta once
    assert mv.refresh(spark) == table.current_epoch()
    assert _frames_equal(mv.read(spark), _full_recompute(spark, table))
