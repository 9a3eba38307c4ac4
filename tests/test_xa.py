"""XA / GTID event classes (VERDICT r1 'missing' #4): a transaction
terminated by XAROLLBACK is discarded wholesale but still advances the
cursor; GTID marker rows are positional metadata that behave like
heartbeats. Canal analog: XACOMMIT/XAROLLBACK/GTIDLOG entry types
[C: protocol/.../EntryProtocol.proto]."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from canal_spark.sources.changelog import SCHEMA
from canal_spark.streaming.stream import StreamingUpsert
from tests.conftest import assert_state_equals_oracle
from tests.oracle_replay import replay

TS0 = 1_767_225_600_000_000


def _row(op, doc, lsn, p, tx, commit, toks):
    return {
        "op": op,
        "doc_id": doc,
        "lsn": lsn,
        "source_partition": p,
        "tx_id": p * 1_000_000_000 + tx,
        "tx_commit": commit,
        "ts": TS0 + lsn * 1000,
        "tokens": toks,
        "n_tok": None if toks is None else len(toks),
        "source": "src0",
        "schema_ver": 1,
    }


@pytest.fixture(scope="module")
def xa_log(tmp_path_factory) -> str:
    """Hand-built log: committed txs, an XA-rolled-back tx whose doc
    would otherwise survive, a rolled-back DELETE (the victim key must
    STAY alive), GTID markers between txs, and a trailing incomplete
    tx."""
    p0 = [
        _row("INSERT", "a", 1, 0, 0, False, [1, 2]),
        _row("INSERT", "b", 2, 0, 0, True, [3]),
        _row("GTID", "", 3, 0, 1, True, None),
        # aborted tx: inserts doc "x", updates "a" — none may apply
        _row("INSERT", "x", 4, 0, 2, False, [9, 9]),
        _row("UPDATE", "a", 5, 0, 2, False, [8, 8, 8]),
        _row("XAROLLBACK", "", 6, 0, 2, True, None),
        _row("UPDATE", "b", 7, 0, 3, True, [4, 5]),
        # trailing incomplete tx: held back, not applied
        _row("UPDATE", "a", 8, 0, 4, False, [7]),
    ]
    p1 = [
        _row("INSERT", "c", 1, 1, 0, True, [10]),
        _row("GTID", "", 2, 1, 1, True, None),
        # aborted tx deleting "c": c must remain
        _row("DELETE", "c", 3, 1, 2, False, None),
        _row("XAROLLBACK", "", 4, 1, 2, True, None),
        _row("INSERT", "d", 5, 1, 3, True, [11, 12]),
    ]
    d = tmp_path_factory.mktemp("xa")
    out = str(d / "log")
    import os

    os.makedirs(out, exist_ok=True)
    for p, rows in [(0, p0), (1, p1)]:
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        cols["ts"] = pa.array(cols["ts"], type=pa.timestamp("us"))
        pq.write_table(pa.table(cols, schema=SCHEMA), f"{out}/part-p{p:04d}.parquet")
    return out


def test_xa_rollback_discarded_cursor_advances(spark, xa_log, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)
    eng = CdcEngine(spark, xa_log, table, lsn_budget=10**9, xa_mode=True)
    eng.run_to_completion()

    state = {r["doc_id"]: list(r["tokens"]) for r in table.read(spark).collect()}
    # aborted insert never lands; aborted update/delete leave originals
    assert "x" not in state
    assert state["a"] == [1, 2]  # update in rolled-back tx ignored
    assert state["b"] == [4, 5]
    assert state["c"] == [10]  # rolled-back DELETE must not kill c
    assert state["d"] == [11, 12]
    # cursor advanced past the rollback markers and GTID rows
    assert table.checkpoints() == {0: 7, 1: 5}
    # lineage counts only applied row events (no markers, no aborted)
    lin = table.lineage_df(spark).toPandas()
    assert int(lin.n_events.sum()) == 5
    # independent oracle agrees
    assert_state_equals_oracle(table.read(spark), replay(xa_log))


def test_xa_without_xa_mode_would_misapply(spark, xa_log, tmp_path):
    """Control: with xa_mode off the aborted events leak through —
    proves the test actually exercises the rollback path."""
    table = SnapshotTable.create(str(tmp_path / "t2"), n_buckets=4)
    CdcEngine(spark, xa_log, table, lsn_budget=10**9, xa_mode=False).run_to_completion()
    docs = {r["doc_id"] for r in table.read(spark).collect()}
    assert "x" in docs


def test_xa_streaming_batch(spark, xa_log, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t3"), n_buckets=4)
    su = StreamingUpsert(spark, table, xa_mode=True)
    assert su.apply_batch(spark.read.parquet(xa_log), 0) is True
    assert_state_equals_oracle(table.read(spark), replay(xa_log))
