"""IncrementalDeduper semantics: first arrival wins regardless of id,
within-batch dedup stays canonical-min, components containing any
retained doc drop ALL their new members, and state accumulates across
batches (the streaming-corpus counterpart of refine_corpus' near-dup
stage; the driver's dedup_incremental oracle replays the same rule in
SQL)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from canal_spark.operators.dedup import IncrementalDeduper

T = " ".join(f"alpha{i}" for i in range(30))
U = " ".join(f"omega{i}" for i in range(30))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df) -> set[int]:
    return {int(r["doc_id"]) for r in df.collect()}


def test_first_arrival_wins_over_smaller_id(spark):
    """A doc retained in an earlier batch beats a LATER near-identical
    doc with a SMALLER id — arrival order, not id order, decides."""
    dd = IncrementalDeduper()
    assert _ids(dd.observe(_df(spark, [(9, T)]))) == {9}
    assert _ids(dd.observe(_df(spark, [(1, T)]))) == set()
    assert _ids(dd.retained) == {9}


def test_within_batch_keeps_min_id(spark):
    dd = IncrementalDeduper()
    got = _ids(dd.observe(_df(spark, [(3, T), (7, T), (5, U)])))
    assert got == {3, 5}


def test_unrelated_docs_pass_through(spark):
    dd = IncrementalDeduper()
    assert _ids(dd.observe(_df(spark, [(1, T)]))) == {1}
    assert _ids(dd.observe(_df(spark, [(2, U)]))) == {2}
    assert _ids(dd.retained) == {1, 2}


def test_component_with_retained_member_drops_all(spark):
    """Transitive chain to a retained doc: 4~10 (J≈0.90) and 6~4
    (J≈0.84) but 6!~10 directly (J≈0.76 < 0.8) — the whole new
    component {4, 6} drops because it contains a path to retained 10,
    even though 6 has no direct edge to it."""
    dd = IncrementalDeduper()
    assert _ids(dd.observe(_df(spark, [(10, T)]))) == {10}
    mid = T + " x1 x2 x3"
    far = T + " x1 x2 x3 x4 x5 x6 x7 x8 x9"
    got = _ids(dd.observe(_df(spark, [(4, mid), (6, far), (8, U)])))
    assert got == {8}
    assert _ids(dd.retained) == {10, 8}


def test_persistent_state_survives_cold_restart(spark, tmp_path):
    """A FRESH deduper instance on the same state_dir must keep
    deduplicating against what the previous instance retained."""
    d = str(tmp_path / "st")
    dd1 = IncrementalDeduper(state_dir=d)
    assert _ids(dd1.observe(_df(spark, [(9, T)]), batch_id=0)) == {9}
    dd2 = IncrementalDeduper(state_dir=d)
    assert _ids(dd2.observe(_df(spark, [(1, T), (2, U)]), batch_id=1)) == {2}
    assert _ids(dd2.retained_ids(spark)) == {9, 2}


def test_persistent_replay_of_committed_batch_is_noop(spark, tmp_path):
    """Re-observing an already-committed batch id returns the recorded
    survivors and must not duplicate state (exactly-once per batch)."""
    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    first = _ids(dd.observe(_df(spark, [(3, T), (7, T)]), batch_id=0))
    assert first == {3}
    again = _ids(dd.observe(_df(spark, [(3, T), (7, T)]), batch_id=0))
    assert again == {3}
    assert dd.retained_ids(spark).count() == 1


def test_persistent_out_of_order_batch_raises(spark, tmp_path):
    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    dd.observe(_df(spark, [(1, T)]), batch_id=5)
    with pytest.raises(ValueError, match="out of order"):
        dd.observe(_df(spark, [(2, U)]), batch_id=3)
    with pytest.raises(ValueError, match="batch_id is required"):
        dd.observe(_df(spark, [(2, U)]))


def test_persistent_crash_before_marker_is_invisible(spark, tmp_path):
    """Kill between the batch-dir write and the marker publish: the
    unmarked dir must be invisible to a new instance, and re-observing
    the batch recomputes it against the pre-crash state."""
    import os

    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    dd.observe(_df(spark, [(9, T)]), batch_id=0)
    dd.observe(_df(spark, [(4, U)]), batch_id=1)
    os.unlink(os.path.join(d, "_batch_1.done"))  # simulate the crash
    dd2 = IncrementalDeduper(state_dir=d)
    assert _ids(dd2.retained_ids(spark)) == {9}
    assert _ids(dd2.observe(_df(spark, [(4, U)]), batch_id=1)) == {4}
    assert _ids(dd2.retained_ids(spark)) == {9, 4}


def test_persistent_all_dropped_batch_round_trips(spark, tmp_path):
    """A batch whose every doc is a near-dup of retained docs commits
    EMPTY survivor relations — the empty parquet dirs must read back
    (explicit schema, no inference) and later batches must still
    dedup correctly."""
    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    assert _ids(dd.observe(_df(spark, [(1, T)]), batch_id=0)) == {1}
    assert _ids(dd.observe(_df(spark, [(5, T)]), batch_id=1)) == set()
    dd2 = IncrementalDeduper(state_dir=d)
    assert _ids(dd2.observe(_df(spark, [(6, T + " x"), (7, U)]), batch_id=2)) == {7}
    assert _ids(dd2.retained_ids(spark)) == {1, 7}


def test_state_accumulates_across_three_batches(spark):
    dd = IncrementalDeduper()
    dd.observe(_df(spark, [(1, T)]))
    dd.observe(_df(spark, [(2, U)]))
    got = _ids(dd.observe(_df(spark, [(3, T + " x"), (4, U + " y"), (5, "zeta " * 20)])))
    assert got == {5}
    assert _ids(dd.retained) == {1, 2, 5}


def test_compact_state_is_semantically_invisible(spark, tmp_path):
    """compact_state between batches must not change any outcome: a
    paired run without compaction pins the expected survivors, the
    covered per-batch dirs are gone, and later batches dedup against
    the base exactly as against the log."""
    import os

    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    assert _ids(dd.observe(_df(spark, [(9, T)]), batch_id=0)) == {9}
    assert _ids(dd.observe(_df(spark, [(11, U)]), batch_id=1)) == {11}
    assert dd.compact_state(spark) == 1
    import glob

    assert not glob.glob(os.path.join(d, "batch=0*"))
    assert os.path.isdir(dd._base_dir(1))
    dd2 = IncrementalDeduper(state_dir=d)
    # 1 dups retained 9 (cross-base probe), 2 dups retained 11, 3 is new
    got = _ids(dd2.observe(_df(spark, [(1, T), (2, U), (3, "gamma " * 20)]), batch_id=2))
    assert got == {3}
    assert _ids(dd2.retained_ids(spark)) == {9, 11, 3}


def test_compact_state_preserves_batch_replay_and_order_guard(spark, tmp_path):
    """Replaying a batch id whose dir was folded into the base returns
    its recorded survivors via the _src_batch tag; the high-water-mark
    guard still raises; compacting twice is a no-op; a second
    compaction folds base + tail into a new base."""
    import os

    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    dd.observe(_df(spark, [(3, T), (7, T)]), batch_id=0)
    dd.observe(_df(spark, [(5, U)]), batch_id=2)
    assert dd.compact_state(spark) == 2
    assert dd.compact_state(spark) == 2  # idempotent no-op
    assert _ids(dd.observe(_df(spark, [(3, T), (7, T)]), batch_id=0)) == {3}
    assert _ids(dd.observe(_df(spark, [(5, U)]), batch_id=2)) == {5}
    with pytest.raises(ValueError, match="out of order"):
        dd.observe(_df(spark, [(8, U)]), batch_id=1)
    dd.observe(_df(spark, [(12, "delta " * 20)]), batch_id=3)
    assert dd.compact_state(spark) == 3
    import glob

    assert not glob.glob(os.path.join(d, "base=2*"))
    assert _ids(dd.observe(_df(spark, [(3, T), (7, T)]), batch_id=0)) == {3}
    assert _ids(dd.retained_ids(spark)) == {3, 5, 12}


def test_compact_crash_before_marker_is_invisible(spark, tmp_path):
    """Kill between the base-dir write and the marker publish: the
    unmarked base must be invisible (state resolves from the intact
    per-batch log) and re-running compaction completes."""
    import os

    d = str(tmp_path / "st")
    dd = IncrementalDeduper(state_dir=d)
    dd.observe(_df(spark, [(9, T)]), batch_id=0)
    dd.observe(_df(spark, [(11, U)]), batch_id=1)
    dd.compact_state(spark, remove_compacted=False)
    os.unlink(os.path.join(d, "_base_1.done"))  # simulate the crash
    dd2 = IncrementalDeduper(state_dir=d)
    assert _ids(dd2.retained_ids(spark)) == {9, 11}
    assert _ids(dd2.observe(_df(spark, [(1, T)]), batch_id=2)) == set()
    assert dd2.compact_state(spark) == 2
    dd3 = IncrementalDeduper(state_dir=d)
    assert _ids(dd3.retained_ids(spark)) == {9, 11}


def test_lost_publish_race_discards_own_dir_only(spark, tmp_path, monkeypatch):
    """A writer that loses the marker election must discard ONLY its
    own unique dir and replay the winner's committed result — the
    winner's published files are never overwritten or torn."""
    import os

    d = str(tmp_path / "st")
    dd_a = IncrementalDeduper(state_dir=d)
    dd_a.observe(_df(spark, [(9, T)]), batch_id=0)

    dd_b = IncrementalDeduper(state_dir=d)
    real_publish = dd_b._publish
    raced = {}

    def contended_publish(marker_name, payload):
        # a concurrent writer commits the same batch between our data
        # write and our marker link
        winner = IncrementalDeduper(state_dir=d)
        assert _ids(winner.observe(_df(spark, [(4, U)]), batch_id=1)) == {4}
        raced["loser_dir"] = os.path.join(d, payload["dir"])
        raced["winner_dir"] = winner._batch_dir(1)
        won = real_publish(marker_name, payload)
        assert not won  # the election must have been lost
        return won

    monkeypatch.setattr(dd_b, "_publish", contended_publish)
    assert _ids(dd_b.observe(_df(spark, [(4, U)]), batch_id=1)) == {4}
    assert not os.path.isdir(raced["loser_dir"])  # ours discarded
    assert os.path.isdir(raced["winner_dir"])  # winner's intact
    assert raced["loser_dir"] != raced["winner_dir"]
    dd2 = IncrementalDeduper(state_dir=d)
    assert _ids(dd2.retained_ids(spark)) == {9, 4}


def test_cdc_epochs_feed_incremental_dedup(spark, changelog_dir, tmp_path):
    """Axes A+B composed end-to-end: the CDC engine replays epochs into
    the table, each epoch's INSERT slice of read_changes feeds the
    PERSISTENT deduper (a fresh instance per epoch = cold resume, the
    epoch number as batch_id) with text = the token array. At
    min_jaccard=1.0 the near-dup components are exactly the groups
    with equal shingle SETS, so an independent pandas replay of the
    arrival-order rule pins the expected retained set."""
    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=1500)
    state = str(tmp_path / "dedup_state")
    arrivals: list[tuple[int, int, str]] = []
    got: set[int] = set()
    prev = 0
    while eng.run_epoch() is not None:
        e = table.current_epoch()
        ins = table.read_changes(spark, prev, e).filter(F.col("op") == "INSERT")
        # the table's doc_id is a string ('d0000018'); the deduper's
        # retained-below-new id encoding needs numeric ids, so strip
        # the prefix (exact, collision-free — unlike hashing the id)
        docs = ins.select(
            F.substring("doc_id", 2, 18).cast("long").alias("doc_id"),
            F.array_join("tokens", " ").alias("text"),
        )
        dd = IncrementalDeduper(min_jaccard=1.0, state_dir=state)
        got |= _ids(dd.observe(docs, batch_id=e))
        arrivals += [(e, int(r["doc_id"]), r["text"]) for r in docs.collect()]
        prev = e
    assert len({a[0] for a in arrivals}) >= 2, "need multiple CDC epochs"

    def shset(text: str) -> frozenset:
        w = text.split(" ")
        if len(w) < 3:
            return frozenset({text})
        return frozenset(" ".join(w[i : i + 3]) for i in range(len(w) - 2))

    retained_sets: dict[frozenset, int] = {}
    expected: set[int] = set()
    for e in sorted({a[0] for a in arrivals}):
        by_set: dict[frozenset, int] = {}
        for _, i, t in (a for a in arrivals if a[0] == e):
            s = shset(t)
            if s in retained_sets:
                continue
            by_set[s] = min(by_set.get(s, i), i)
        retained_sets.update(by_set)
        expected |= set(by_set.values())
    assert got == expected and len(expected) > 0
