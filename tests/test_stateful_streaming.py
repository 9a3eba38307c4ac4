"""applyInPandasWithState LWW gate: cross-batch duplicate/stale
suppression with per-key state."""

from __future__ import annotations

import datetime as dt
import time

import pandas as pd

from canal_spark.streaming.stateful import OUTPUT_SCHEMA, stateful_lww_gate

COLS = ["doc_id", "lsn", "source_partition", "op", "tokens", "n_tok", "source"]


def _write_batch(spark, path, rows):
    """One flat parquet FILE per batch (the file stream source does not
    recurse into subdirectories)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf = pd.DataFrame(rows, columns=COLS)
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("lsn", pa.int64()),
            ("source_partition", pa.int32()),
            ("op", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), path)


def _row(doc, lsn, sp=0, op="UPDATE"):
    return (doc, lsn, sp, op, [lsn], 1, f"src{sp}")


def _run_gate(spark, src, name, ckpt):
    stream = (
        spark.readStream.schema(OUTPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_lww_gate(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_gate_suppresses_stale_events_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    # files are picked up oldest-first with maxFilesPerTrigger=1 ->
    # deterministic batch sequence
    _write_batch(spark, f"{src}/b0.parquet", [_row("a", 5), _row("b", 2)])
    time.sleep(1.1)
    _write_batch(spark, f"{src}/b1.parquet", [_row("a", 3), _row("a", 7), _row("b", 2)])
    _run_gate(spark, src, "gate_out", str(tmp_path / "ckpt"))
    got = {
        (r["doc_id"], r["lsn"])
        for r in spark.sql("SELECT doc_id, lsn FROM gate_out").collect()
    }
    # a@3 is stale after a@5; b@2 duplicate suppressed on redelivery
    assert got == {("a", 5), ("b", 2), ("a", 7)}


def test_gate_within_batch_out_of_order(spark, tmp_path):
    src = str(tmp_path / "stream_src2")
    _write_batch(
        spark, f"{src}/b0.parquet", [_row("k", 9), _row("k", 4), _row("k", 11), _row("k", 9, sp=0)]
    )
    _run_gate(spark, src, "gate_out2", str(tmp_path / "ckpt2"))
    got = sorted(r["lsn"] for r in spark.sql("SELECT lsn FROM gate_out2").collect())
    # ascending-ord gate: 4 forwarded (first), then 9, then 11; dup 9 dropped
    assert got == [4, 9, 11]


def test_gate_state_survives_restart(spark, tmp_path):
    """The per-key max-ord state lives in the streaming state store:
    a NEW query run from the same checkpoint must still suppress
    events older than what the previous run forwarded. (File sink —
    the memory sink does not support checkpoint recovery.)"""
    from canal_spark.streaming.stateful import OUTPUT_SCHEMA, stateful_lww_gate

    src = str(tmp_path / "stream_src3")
    ckpt = str(tmp_path / "ckpt3")
    out = str(tmp_path / "gate_out3")

    def run_once():
        stream = (
            spark.readStream.schema(OUTPUT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful_lww_gate(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["doc_id"], r["lsn"])
            for r in spark.read.schema(OUTPUT_SCHEMA).parquet(out).collect()
        }

    _write_batch(spark, f"{src}/b0.parquet", [_row("a", 50), _row("b", 10)])
    assert run_once() == {("a", 50), ("b", 10)}

    # restart: new file with one stale (a@20 < a@50) and one fresh event
    time.sleep(1.1)
    _write_batch(spark, f"{src}/b1.parquet", [_row("a", 20), _row("b", 99)])
    got = run_once()
    # a@20 suppressed by state recovered from the checkpoint
    assert got == {("a", 50), ("b", 10), ("b", 99)}
