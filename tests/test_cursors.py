"""Multi-client cursors: independent positions over one changelog,
get/ack/rollback protocol, durable resume, subscription filters
(canal's per-(destination, clientId) meta + subscribe)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.cursors import ChangelogConsumer, CursorRegistry
from canal_spark.plans.table import SnapshotTable


@pytest.fixture()
def registry(tmp_path) -> CursorRegistry:
    return CursorRegistry(str(tmp_path / "meta"))


def _consumer(spark, changelog_dir, registry, client, **kw) -> ChangelogConsumer:
    return ChangelogConsumer(spark, changelog_dir, registry, client, **kw)


def test_two_clients_independent_positions(spark, changelog_dir, registry):
    a = _consumer(spark, changelog_dir, registry, "a", lsn_budget=300)
    b = _consumer(spark, changelog_dir, registry, "b", lsn_budget=700)
    bid, _ = a.get()
    a.ack(bid)
    bid, _ = a.get()
    a.ack(bid)
    bid, _ = b.get()
    b.ack(bid)
    pa, pb = a.positions(), b.positions()
    assert pa and pb and pa != pb
    for p in pa:
        assert pa[p] == min(599, a.extents[p])  # -1 + 2*300
        assert pb[p] == min(699, b.extents[p])  # -1 + 1*700


def test_each_client_sees_every_event_exactly_once(spark, changelog_dir, registry):
    total = spark.read.parquet(changelog_dir).count()
    c = _consumer(spark, changelog_dir, registry, "c", lsn_budget=377)
    seen = 0
    while (got := c.get()) is not None:
        bid, df = got
        seen += df.count()
        c.ack(bid)
    assert seen == total
    assert c.get() is None  # exhausted stays exhausted


def test_rollback_redelivers_identical_slice(spark, changelog_dir, registry):
    c = _consumer(spark, changelog_dir, registry, "r", lsn_budget=500)
    bid1, df1 = c.get()
    rows1 = df1.count()
    c.rollback()
    bid2, df2 = c.get()
    assert bid2 == bid1  # same batch id: nothing was acked
    assert df2.count() == rows1
    assert df2.exceptAll(df1).count() == 0
    c.ack(bid2)


def test_sequential_ack_enforced(spark, changelog_dir, registry):
    c = _consumer(spark, changelog_dir, registry, "s", lsn_budget=500)
    bid, _ = c.get()
    with pytest.raises(RuntimeError, match="not acked"):
        c.get()  # second outstanding batch refused
    with pytest.raises(ValueError, match="non-sequential"):
        c.ack(bid + 1)
    c.ack(bid)
    with pytest.raises(ValueError, match="non-sequential"):
        c.ack(bid)  # double-ack refused


def test_cursor_durable_across_consumer_restart(spark, changelog_dir, registry):
    c = _consumer(spark, changelog_dir, registry, "d", lsn_budget=400)
    bid, _ = c.get()
    c.ack(bid)
    pos = c.positions()
    # fresh consumer object (cold restart) resumes exactly
    c2 = _consumer(spark, changelog_dir, registry, "d", lsn_budget=400)
    assert c2.positions() == pos
    bid2, df2 = c2.get()
    assert bid2 == bid + 1
    assert df2.agg(F.min("lsn")).first()[0] > min(pos.values())


def test_subscription_filter_applies_but_cursor_covers_all(spark, changelog_dir, registry):
    w = _consumer(
        spark, changelog_dir, registry, "w", lsn_budget=10**9, source_whitelist="^src[01]$"
    )
    bid, df = w.get()
    srcs = {r["source"] for r in df.select("source").distinct().collect()}
    assert srcs and srcs <= {"src0", "src1"}
    w.ack(bid)
    # cursor covers the full range despite the filter: client is done
    assert w.get() is None
    for p, ext in w.extents.items():
        assert w.positions()[p] == ext


def test_engine_subscribe_shares_table_meta_dir(spark, changelog_dir, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=10**9)
    c1 = eng.subscribe("etl", lsn_budget=600)
    c2 = eng.subscribe("audit", lsn_budget=900)
    bid, _ = c1.get()
    c1.ack(bid)
    bid, _ = c2.get()
    c2.ack(bid)
    # the table's own write checkpoints are untouched by read clients
    assert table.checkpoints() == {}
    reg = CursorRegistry(table.meta_dir)
    assert reg.clients() == ["audit", "etl"]
    rows = reg.state_rows()
    assert {r[0] for r in rows} == {"audit", "etl"}
    # replay still works with cursor files present in meta/
    eng.run_to_completion()
    assert table.read(spark).count() > 0


def test_property_any_budget_covers_changelog_exactly_once(spark, changelog_dir, tmp_path):
    """∀ lsn budgets: the concatenation of a client's batches delivers
    every changelog event exactly once, in cursor order, regardless of
    slice size or how acks interleave with other clients."""
    from canal_spark.plans.cursors import CursorRegistry

    total = spark.read.parquet(changelog_dir).count()
    reg = CursorRegistry(str(tmp_path / "meta"))
    # budget=1 would mean one Spark job per lsn (minutes of pure
    # scheduling overhead); 37 already exercises hundreds of batches
    for budget in (37, 500, 10**9):
        c = _consumer(spark, changelog_dir, reg, f"b{budget}", lsn_budget=budget)
        seen = 0
        batches = 0
        while (got := c.get()) is not None:
            bid, df = got
            seen += df.count()
            c.ack(bid)
            batches += 1
            assert batches < 20_000, "no forward progress"
        assert seen == total, f"budget={budget}: {seen} != {total}"


def test_multi_destination_pattern_two_tables_one_changelog(
    spark, changelog_dir, oracle_state, tmp_path
):
    """Canal's multi-destination deployment (one source, N filtered
    destinations) is N engines with subscription whitelists over the
    same changelog — each table keeps its own checkpoints; the union of
    two complementary destinations equals the unfiltered oracle state."""
    ta = SnapshotTable.create(str(tmp_path / "ta"), n_buckets=4)
    tb = SnapshotTable.create(str(tmp_path / "tb"), n_buckets=4)
    CdcEngine(
        spark, changelog_dir, ta, lsn_budget=10**9, source_whitelist="^src[0-4]$"
    ).run_to_completion()
    CdcEngine(
        spark, changelog_dir, tb, lsn_budget=10**9, source_blacklist="^src[0-4]$"
    ).run_to_completion()
    import pandas as pd

    got = pd.concat(
        [
            ta.read(spark).select("doc_id", "tokens", "n_tok", "source").toPandas(),
            tb.read(spark).select("doc_id", "tokens", "n_tok", "source").toPandas(),
        ]
    )
    exp = oracle_state
    # complementary filters partition the key space by source
    assert len(got) == len(exp)
    assert sorted(got.doc_id) == sorted(exp.doc_id)
    assert ta.checkpoints() and tb.checkpoints()
