"""Event-time windowed aggregation: streaming (watermark, append mode)
result must equal the batch aggregation over the same data, and a
too-late event must be dropped by the watermark.

Structured Streaming semantics under test: the watermark advances at
the END of a trigger, so a window finalizes (and emits, in append
mode) only on a LATER trigger whose incoming watermark has passed the
window end — each batch file below is one trigger."""

from __future__ import annotations

import datetime as dt
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from canal_spark.streaming.windows import windowed_change_counts

SCHEMA = "doc_id string, lsn long, source_partition int, op string, ts timestamp"
T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["doc_id", "lsn", "source_partition", "op", "ts"])
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("lsn", pa.int64()),
            ("source_partition", pa.int32()),
            ("op", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), path)


def _traffic():
    # two 1-minute windows of INSERT/UPDATE traffic
    out = []
    for i in range(10):
        out.append((f"d{i}", i, 0, "INSERT", T0 + dt.timedelta(seconds=5 * i)))
    for i in range(6):
        out.append((f"d{i}", 100 + i, 0, "UPDATE", T0 + dt.timedelta(seconds=65 + 5 * i)))
    return out


ADVANCER = [("adv", 1000, 0, "INSERT", T0 + dt.timedelta(minutes=10))]


def _run(spark, src, name, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        windowed_change_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["win_start"], r["op"]): r["n_events"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_stream_windows_match_batch(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    _write(f"{src}/b0.parquet", _traffic())
    time.sleep(1.1)
    _write(f"{src}/b1.parquet", ADVANCER)  # advances watermark past both windows
    got = _run(spark, src, "win_out", str(tmp_path / "ckpt"))

    batch = {
        (r["win_start"], r["op"]): r["n_events"]
        for r in windowed_change_counts(spark.read.parquet(src)).collect()
    }
    assert got, "no finalized windows emitted"
    for k, v in got.items():
        assert batch[k] == v
    assert got[(T0, "INSERT")] == 10
    assert got[(T0 + dt.timedelta(minutes=1), "UPDATE")] == 6


def test_watermark_drops_too_late_event(spark, tmp_path):
    src = str(tmp_path / "wsrc2")
    _write(f"{src}/b0.parquet", _traffic())
    time.sleep(1.1)
    _write(f"{src}/b1.parquet", ADVANCER)
    time.sleep(1.1)
    # one event 10 minutes BEFORE T0: below the watermark from the very
    # first trigger's data onward (wm >= T0+95s-2min > T0-10min), so it
    # is dropped regardless of which later trigger its file lands in
    late_ts = T0 - dt.timedelta(minutes=10)
    _write(f"{src}/b2.parquet", [("late", 2000, 0, "INSERT", late_ts)])
    got = _run(spark, src, "win_out2", str(tmp_path / "ckpt2"))
    assert got[(T0, "INSERT")] == 10
    # the dropped event's own window never materializes
    assert (late_ts, "INSERT") not in got