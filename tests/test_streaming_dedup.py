"""StreamingDeduper: the persistent IncrementalDeduper under
foreachBatch — arriving document files are near-dup-deduplicated
against the whole retained corpus exactly-once, restart from
checkpoint continues against the same state, redelivery is a no-op,
and inline compaction keeps the state log bounded."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from canal_spark.operators.dedup import IncrementalDeduper
from canal_spark.streaming.stream import StreamingDeduper

T = " ".join(f"alpha{i}" for i in range(30))
U = " ".join(f"omega{i}" for i in range(30))
V = " ".join(f"sigma{i}" for i in range(30))
SCHEMA_DDL = "doc_id long, text string, source string"


def _write_doc_file(d: str, name: str, rows, mtime: int) -> None:
    """One flat parquet file per micro-batch; explicit ascending mtimes
    so the file source's oldest-first ordering is deterministic."""
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def _run(sd: StreamingDeduper, src: str, ckpt: str) -> None:
    q = sd.start(src, ckpt, SCHEMA_DDL, max_files_per_trigger=1)
    assert q.awaitTermination(300)


def _admitted(sd: StreamingDeduper, spark) -> dict[int, tuple[int, str]]:
    rows = sd.admitted(spark, SCHEMA_DDL).collect()
    return {int(r["doc_id"]): (int(r["admitted_batch"]), r["source"]) for r in rows}


def test_stream_dedup_first_arrival_wins(spark, tmp_path):
    """Three micro-batches: a later near-identical doc with a SMALLER
    id drops against the retained corpus; admitted keeps the full
    payload row tagged with the admitting batch."""
    src, st = str(tmp_path / "src"), str(tmp_path / "state")
    _write_doc_file(src, "f0.parquet", [(9, T, "web"), (5, U, "web")], 1000)
    _write_doc_file(src, "f1.parquet", [(1, T + " x", "pdf"), (2, V, "pdf")], 1001)
    _write_doc_file(src, "f2.parquet", [(7, U, "web")], 1002)
    sd = StreamingDeduper(spark, st, str(tmp_path / "out"))
    _run(sd, src, str(tmp_path / "ckpt"))
    got = _admitted(sd, spark)
    assert got == {9: (0, "web"), 5: (0, "web"), 2: (1, "pdf")}
    dd = IncrementalDeduper(state_dir=st)
    assert {int(r["doc_id"]) for r in dd.retained_ids(spark).collect()} == {9, 5, 2}


def test_stream_dedup_restart_resumes_against_state(spark, tmp_path):
    """Drain two files, stop, land a third, start a FRESH query on the
    same checkpoint + state dirs: only the new file is processed and it
    still dedups against what the first run retained."""
    src, st, out = str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_doc_file(src, "f0.parquet", [(9, T, "a")], 1000)
    _write_doc_file(src, "f1.parquet", [(5, U, "a")], 1001)
    sd1 = StreamingDeduper(spark, st, out)
    _run(sd1, src, ckpt)
    assert set(_admitted(sd1, spark)) == {9, 5}
    _write_doc_file(src, "f2.parquet", [(3, T, "b"), (8, V, "b")], 1002)
    sd2 = StreamingDeduper(spark, st, out)
    _run(sd2, src, ckpt)
    got = _admitted(sd2, spark)
    assert got == {9: (0, "a"), 5: (1, "a"), 8: (2, "b")}  # 3 dups retained 9


def test_stream_dedup_redelivery_is_noop(spark, tmp_path):
    """Manually replaying an already-committed foreachBatch id (the
    crash-between-state-and-checkpoint case) must not change state or
    output."""
    src, st, out = str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "out")
    _write_doc_file(src, "f0.parquet", [(3, T, "a"), (7, T, "a")], 1000)
    _write_doc_file(src, "f1.parquet", [(5, U, "a")], 1001)
    sd = StreamingDeduper(spark, st, out)
    _run(sd, src, str(tmp_path / "ckpt"))
    before = _admitted(sd, spark)
    assert set(before) == {3, 5}  # within-batch dup 7 dropped
    sd.apply_batch(spark.read.schema(SCHEMA_DDL).parquet(os.path.join(src, "f0.parquet")), 0)
    assert _admitted(sd, spark) == before
    dd = IncrementalDeduper(state_dir=st)
    assert dd.retained_ids(spark).count() == 2


def test_stream_dedup_inline_compaction_bounds_state(spark, tmp_path):
    """compact_every=2 over four micro-batches folds the per-batch log
    into a base twice; outcomes are identical to the uncompacted rule
    and the final state dir holds no stale batch dirs below the base."""
    src, st, out = str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "out")
    _write_doc_file(src, "f0.parquet", [(9, T, "a")], 1000)
    _write_doc_file(src, "f1.parquet", [(5, U, "a")], 1001)
    _write_doc_file(src, "f2.parquet", [(1, T, "a"), (6, V, "a")], 1002)
    _write_doc_file(src, "f3.parquet", [(4, V + " y", "a")], 1003)
    sd = StreamingDeduper(spark, st, out, compact_every=2)
    _run(sd, src, str(tmp_path / "ckpt"))
    assert set(_admitted(sd, spark)) == {9, 5, 6}  # 1 dups 9, 4 dups 6
    assert glob.glob(os.path.join(st, "base=*"))
    assert not glob.glob(os.path.join(st, "batch=*"))
    dd = IncrementalDeduper(state_dir=st)
    assert {int(r["doc_id"]) for r in dd.retained_ids(spark).collect()} == {9, 5, 6}
