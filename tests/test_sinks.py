"""Sink adapters: FlatMessage fan-out is lossless (encode -> parse
roundtrip) and the engine's per-epoch sink delivery is exactly-once
per epoch location under re-runs."""

from __future__ import annotations

import pyspark.sql.functions as F

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from canal_spark.sinks import FlatMessageDirSink, flat_messages_from_delta
from canal_spark.sources.flat_message import parse_flat_messages


def _delta(spark):
    return spark.createDataFrame(
        [
            ("a", "INSERT", [1, 2, 3], 3, "src0", (7 << 12) | 1),
            ("b", "UPDATE", [9], 1, "src1", (9 << 12) | 0),
            ("c", "DELETE", None, None, "src2", (11 << 12) | 2),
        ],
        "doc_id string, op string, tokens array<int>, n_tok int, source string, _seq long",
    )


def test_flat_message_roundtrip_lossless(spark):
    delta = _delta(spark)
    msgs = flat_messages_from_delta(delta, database="db1", table="t1")
    parsed = parse_flat_messages(msgs, json_col="value")
    back = parsed.select(
        F.col("row.doc_id").alias("doc_id"),
        F.col("op"),
        F.from_json(F.col("row.tokens"), "array<int>").alias("tokens"),
        F.col("row.n_tok").cast("int").alias("n_tok"),
        F.col("row.source").alias("source"),
        F.col("msg_id").alias("_seq"),
        F.col("es"),
        F.col("database"),
        F.col("table"),
    )
    rows = {r["doc_id"]: r for r in back.collect()}
    exp = {r["doc_id"]: r for r in delta.collect()}
    assert set(rows) == set(exp)
    for k, e in exp.items():
        g = rows[k]
        assert (g["op"], g["tokens"], g["n_tok"], g["source"], g["_seq"]) == (
            e["op"], e["tokens"], e["n_tok"], e["source"], e["_seq"]
        )
        assert g["es"] == e["_seq"] >> 12
        assert (g["database"], g["table"]) == ("db1", "t1")


def test_engine_sink_fanout_per_epoch_and_rerun_identical(spark, changelog_dir, tmp_path):
    out = str(tmp_path / "topic")
    sink = FlatMessageDirSink(out)
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=900, sinks=(sink,))
    final = eng.run_to_completion()
    assert final >= 2
    # one message per delta row per epoch; epoch message keys == that
    # epoch's winner keys (spot-check via the table's lineage)
    for e in range(1, final + 1):
        msgs = spark.read.text(sink.epoch_dir(e))
        parsed = parse_flat_messages(msgs, json_col="value")
        n_keys = parsed.select("row.doc_id").distinct().count()
        assert parsed.count() == n_keys > 0
    # simulate crash-after-sink-before-commit re-run: re-emitting the
    # last epoch's delta overwrites byte-identically
    before = sorted(
        r["value"] for r in spark.read.text(sink.epoch_dir(final)).collect()
    )
    # recompute the same epoch delta through a fresh engine on a COPY
    # of the pre-final table state is equivalent to rerunning the same
    # write; here we just re-apply the sink with the recorded delta
    msgs = spark.read.text(sink.epoch_dir(final))
    parsed = parse_flat_messages(msgs, json_col="value")
    redelta = parsed.select(
        F.col("row.doc_id").alias("doc_id"),
        F.col("op"),
        F.from_json(F.col("row.tokens"), "array<int>").alias("tokens"),
        F.col("row.n_tok").cast("int").alias("n_tok"),
        F.col("row.source").alias("source"),
        F.col("msg_id").alias("_seq"),
    )
    # materialize before re-applying: overwrite would otherwise delete
    # its own input mid-read
    redelta = spark.createDataFrame(redelta.collect(), redelta.schema)
    sink.apply(spark, redelta, final)
    after = sorted(
        r["value"] for r in spark.read.text(sink.epoch_dir(final)).collect()
    )
    assert after == before


def test_two_sinks_with_different_mappings_from_one_delta(
    spark, changelog_dir, tmp_path
):
    """Canal adapter analog: one epoch delta fans out to two stores
    with DIFFERENT declarative mappings — a renamed projection with a
    routing filter, and a broadcast dim-enriched shape. The enrichment
    join must be the broadcast J1 path (no shuffle of the delta)."""
    from canal_spark.sinks import MappedParquetSink, SinkMapping

    dim = spark.createDataFrame(
        [(f"src{i}", f"tier-{i % 3}") for i in range(10)],
        "src string, tier string",
    )
    s1 = MappedParquetSink(
        str(tmp_path / "narrow"),
        SinkMapping(
            columns={"pk": "doc_id", "token_count": "n_tok", "kind": "op"},
            where="op <> 'DELETE'",
        ),
    )
    s2 = MappedParquetSink(
        str(tmp_path / "enriched"),
        SinkMapping(
            columns={"pk": "doc_id", "tier": "tier", "seq": "_seq"},
            dim=dim,
            on=("source", "src"),
        ),
    )
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=10**9, sinks=(s1, s2))
    eng.run_to_completion()

    narrow = spark.read.parquet(s1.epoch_dir(1))
    assert narrow.columns == ["pk", "token_count", "kind"]
    assert narrow.filter(F.col("kind") == "DELETE").count() == 0
    enriched = spark.read.parquet(s2.epoch_dir(1))
    assert enriched.columns == ["pk", "tier", "seq"]
    assert enriched.filter(F.col("tier").isNull()).count() == 0
    # same delta, different shapes: DELETE winners appear only in s2
    assert enriched.count() > narrow.count()
    # the enrichment is the broadcast J1 path
    plan = (
        SinkMapping(dim=dim, on=("source", "src"))
        .apply(_delta(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_mapping_same_name_join_key_is_unambiguous(spark):
    """The natural same-name join (on=('source','source')) must not
    leave a duplicate column behind — the dim's key is dropped after
    the join so writes and `columns` references stay unambiguous."""
    from canal_spark.sinks import SinkMapping

    dim = spark.createDataFrame(
        [(f"src{i}", f"tier-{i}") for i in range(3)], "source string, tier string"
    )
    out = SinkMapping(dim=dim, on=("source", "source")).apply(_delta(spark))
    assert out.columns.count("source") == 1
    assert "tier" in out.columns
    mapped = SinkMapping(
        columns={"pk": "doc_id", "src": "source", "tier": "tier"},
        dim=dim,
        on=("source", "source"),
    ).apply(_delta(spark))
    rows = {r["pk"]: r for r in mapped.collect()}
    assert rows["a"]["tier"] == "tier-0" and rows["c"]["tier"] == "tier-2"


def test_streaming_sink_fanout(spark, changelog_dir, tmp_path):
    from canal_spark.streaming.stream import StreamingUpsert

    sink = FlatMessageDirSink(str(tmp_path / "topic"))
    table = SnapshotTable.create(str(tmp_path / "t2"), n_buckets=4)
    su = StreamingUpsert(spark, table, sinks=(sink,))
    assert su.apply_batch(spark.read.parquet(changelog_dir), 0) is True
    msgs = parse_flat_messages(spark.read.text(sink.epoch_dir(1)), json_col="value")
    assert msgs.count() == msgs.select("row.doc_id").distinct().count() > 0


def test_mapping_rejects_dim_column_collision(spark):
    """A dim column (beyond the join key) shadowing a delta column
    would survive the join as a duplicate name — rejected upfront with
    the collision list."""
    import pytest

    from canal_spark.sinks import SinkMapping

    dim = spark.createDataFrame(
        [("src0", 9, "x")], "source string, n_tok int, tier string"
    )
    with pytest.raises(ValueError, match=r"n_tok"):
        SinkMapping(dim=dim, on=("source", "source")).apply(_delta(spark))


# ----------------------------------------------------------- DuckDBSink


def test_duckdb_sink_end_to_end_matches_oracle(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Full replay through the engine with the RDB driver attached:
    the DuckDB table's final state must equal the pandas oracle's
    final state — MERGE-by-pk semantics at a real ACID store."""
    import duckdb

    from canal_spark.sinks import DuckDBSink

    db = str(tmp_path / "sink.duckdb")
    sink = DuckDBSink(db, table="docs")
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    CdcEngine(
        spark, changelog_dir, table, lsn_budget=900, sinks=(sink,)
    ).run_to_completion()
    con = duckdb.connect(db)
    got = (
        con.execute("SELECT doc_id, n_tok, source, tokens FROM docs ORDER BY doc_id")
        .df()
        .reset_index(drop=True)
    )
    exp = oracle_state.sort_values("doc_id").reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.n_tok) == list(exp.n_tok)
    assert list(got.source) == list(exp.source)
    bad = sum(1 for g, e in zip(got.tokens, exp.tokens) if list(g) != list(e))
    assert bad == 0, f"{bad} token-array mismatches"
    # the store's state must also equal the engine's own table
    assert len(got) == table.read(spark).count()
    n_epochs = con.execute("SELECT COUNT(*) FROM __canal_epochs").fetchone()[0]
    assert n_epochs == table.current_epoch()
    con.close()


def _sink_delta(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, op string, tokens array<long>, n_tok long, "
        "source string, _seq long",
    )


def test_duckdb_sink_epoch_reapply_and_lww_guard(spark, tmp_path):
    import duckdb

    from canal_spark.sinks import DuckDBSink

    db = str(tmp_path / "sink.duckdb")
    sink = DuckDBSink(db)
    d1 = _sink_delta(spark, [("a", "INSERT", [1, 2], 2, "src0", 100)])
    sink.apply(spark, d1, 1)
    # exactly-once: re-applying the SAME epoch is a no-op before any
    # data touch, even with different content
    sink.apply(spark, _sink_delta(spark, [("a", "UPDATE", [9], 1, "srcX", 999)]), 1)
    con = duckdb.connect(db)
    assert con.execute("SELECT n_tok FROM target").fetchall() == [(2,)]
    con.close()
    # LWW guard: a NEW epoch carrying an OLDER _seq for the key must
    # not roll the row backward (replayed/reordered delivery)
    sink.apply(spark, _sink_delta(spark, [("a", "UPDATE", [7], 1, "src1", 50)]), 2)
    con = duckdb.connect(db)
    assert con.execute("SELECT n_tok, _seq FROM target").fetchall() == [(2, 100)]
    con.close()
    # a genuinely newer _seq updates; DELETE removes the row
    sink.apply(spark, _sink_delta(spark, [("a", "UPDATE", [7, 8, 9], 3, "src1", 200)]), 3)
    sink.apply(spark, _sink_delta(spark, [("a", "DELETE", None, None, "src1", 300)]), 4)
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM target").fetchone()[0] == 0
    assert con.execute("SELECT COUNT(*) FROM __canal_epochs").fetchone()[0] == 4
    con.close()


def test_duckdb_sink_reordered_deletes_are_lww_guarded(spark, tmp_path):
    """Out-of-order delivery in BOTH directions: an old delete must
    not kill a newer row, and an old upsert must not resurrect a
    newer delete (tombstone retention)."""
    import duckdb

    from canal_spark.sinks import DuckDBSink

    db = str(tmp_path / "sink.duckdb")
    sink = DuckDBSink(db)
    sink.apply(spark, _sink_delta(spark, [("a", "INSERT", [1, 2], 2, "s", 200)]), 1)
    # a reordered OLDER delete must not remove the newer row
    sink.apply(spark, _sink_delta(spark, [("a", "DELETE", None, None, "s", 100)]), 2)
    con = duckdb.connect(db)
    assert con.execute("SELECT _seq FROM target").fetchall() == [(200,)]
    con.close()
    # a genuinely newer delete wins and leaves a tombstone...
    sink.apply(spark, _sink_delta(spark, [("a", "DELETE", None, None, "s", 300)]), 3)
    # ...so a reordered OLDER upsert cannot resurrect the key
    sink.apply(spark, _sink_delta(spark, [("a", "UPDATE", [9], 1, "s", 250)]), 4)
    con = duckdb.connect(db)
    assert con.execute("SELECT COUNT(*) FROM target").fetchone()[0] == 0
    assert con.execute(
        "SELECT _seq FROM __canal_tombstones"
    ).fetchall() == [(300,)]
    con.close()
    # a genuinely newer insert resurrects the key and clears the stone
    sink.apply(spark, _sink_delta(spark, [("a", "INSERT", [7], 1, "s", 400)]), 5)
    con = duckdb.connect(db)
    assert con.execute("SELECT _seq FROM target").fetchall() == [(400,)]
    assert con.execute("SELECT COUNT(*) FROM __canal_tombstones").fetchone()[0] == 0
    con.close()


def test_duckdb_sink_mapping_must_keep_protocol_cols(spark, tmp_path):
    import pytest

    from canal_spark.sinks import DuckDBSink, SinkMapping

    sink = DuckDBSink(
        str(tmp_path / "s.duckdb"),
        mapping=SinkMapping(columns={"doc_id": "doc_id", "n_tok": "n_tok"}),
    )
    with pytest.raises(ValueError, match="must preserve"):
        sink.apply(spark, _sink_delta(spark, [("a", "INSERT", [1], 1, "s", 1)]), 1)
