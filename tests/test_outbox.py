"""FlatMessage outbox (the MQ-producer half of canal's server): each
committed epoch's NET change feed published as FlatMessage JSON lines
with canal's exact before-image semantics, exactly-once via a durable
published-watermark pointer. The consumer loop (parse_flat_messages →
LWW apply) must reconstruct the table byte-exact."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from canal_spark.sinks import FlatMessageOutbox
from canal_spark.sources.flat_message import parse_flat_messages


def _published_df(spark, outbox):
    files = sorted(glob.glob(os.path.join(outbox.out_dir, "epoch=*", "part-*")))
    nonempty = [f for f in files if os.path.getsize(f) > 0]
    if not nonempty:
        return None
    return spark.read.text(nonempty).withColumnRenamed("value", "msg")


def _reconstruct(spark, outbox):
    """Consumer loop: parse every published message, LWW by the wire
    `ts` (the winner's _seq), drop DELETE winners, re-type."""
    parsed = parse_flat_messages(_published_df(spark, outbox))
    latest = (
        parsed.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.col("row")["doc_id"]).orderBy(
                    F.col("es").desc(), F.col("msg_id").desc()
                )
            ),
        )
        .filter("rn = 1 AND op <> 'DELETE'")
    )
    return latest.select(
        F.col("row")["doc_id"].alias("doc_id"),
        F.from_json(F.col("row")["tokens"], "array<int>").alias("tokens"),
        F.col("row")["n_tok"].cast("int").alias("n_tok"),
        F.col("row")["source"].alias("source"),
    )


def _same(x, y):
    return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0


def test_outbox_roundtrip_and_exactly_once(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=600)
    outbox = FlatMessageOutbox(table, str(tmp_path / "mq"))
    while eng.run_epoch() is not None:
        outbox.publish(spark)  # steady-state: publish per epoch
    assert outbox.published_epoch() == table.current_epoch()
    assert outbox.publish(spark) == []  # up to date -> no-op

    cols = ["doc_id", "tokens", "n_tok", "source"]
    got = _reconstruct(spark, outbox).select(*cols)
    want = table.read(spark, with_bucket=False).select(*cols)
    assert _same(got, want)

    # crash between epoch-dir write and pointer advance: rewind the
    # pointer one epoch — re-publish must rewrite the SAME content set
    final = outbox.published_epoch()
    before = set()
    for f in glob.glob(os.path.join(outbox.epoch_dir(final), "part-*")):
        before.update(open(f).read().splitlines())
    with open(outbox._pointer_path, "w") as f:
        json.dump({"epoch": final - 1}, f)
    assert outbox.publish(spark) == [final]
    after = set()
    for f in glob.glob(os.path.join(outbox.epoch_dir(final), "part-*")):
        after.update(open(f).read().splitlines())
    assert after == before
    assert outbox.published_epoch() == final


def test_outbox_before_image_semantics(spark, changelog_dir, tmp_path):
    """Canal's FlatMessage contract: UPDATE old = changed columns'
    pre-images only; DELETE data = the full deleted image, old null;
    INSERT old null."""
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    CdcEngine(spark, changelog_dir, table, lsn_budget=600).run_to_completion()
    outbox = FlatMessageOutbox(table, str(tmp_path / "mq"))
    outbox.publish(spark)

    raw = _published_df(spark, outbox)
    m = raw.select(F.from_json("msg", (
        "id BIGINT, type STRING, pkNames ARRAY<STRING>, isDdl BOOLEAN, "
        "data ARRAY<MAP<STRING,STRING>>, old ARRAY<MAP<STRING,STRING>>"
    )).alias("m")).select("m.*")
    rows = m.collect()
    ops = {r["type"] for r in rows}
    assert {"INSERT", "UPDATE", "DELETE"} <= ops
    for r in rows:
        assert r["pkNames"] == ["doc_id"] and r["isDdl"] is False
        data = r["data"][0]
        assert data["doc_id"] is not None  # DELETE carries the old image
        if r["type"] == "UPDATE":
            old = r["old"][0]
            # only genuinely-changed columns, each differing from data
            assert "doc_id" not in old
            for k, v in old.items():
                assert v != data[k], (k, v, data[k])
        else:
            assert r["old"] is None

    # at least one UPDATE must carry a non-empty old map on this corpus
    assert any(r["type"] == "UPDATE" and r["old"][0] for r in rows)


def test_outbox_publishes_empty_epoch_for_compaction(
    spark, changelog_dir, tmp_path
):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=800, write_mode="mor")
    eng.run_epoch()
    eng.run_epoch()
    outbox = FlatMessageOutbox(table, str(tmp_path / "mq"))
    outbox.publish(spark)
    e_before = table.current_epoch()
    table.compact_files(spark, target_bytes=1 << 30)
    assert table.current_epoch() == e_before + 1
    assert outbox.publish(spark) == [e_before + 1]
    # the compaction epoch's net feed is empty: dir exists, zero rows
    files = glob.glob(os.path.join(outbox.epoch_dir(e_before + 1), "part-*"))
    assert sum(os.path.getsize(f) for f in files) == 0
    assert outbox.published_epoch() == e_before + 1
