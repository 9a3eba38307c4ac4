"""DDL-from-stream bridge (SURVEY.md §1.5): schema updates consumed
from a ddl_events side-table and applied IN POSITION during replay —
DML before the DDL runs under the old schema, DML at/after it under
the new one, each DDL its own epoch (ddlIsolation), durable watermark
so crash/resume never re-applies. Canal analog: QUERY-event DDL parse
[C: parse/.../ddl/DruidDdlParser.java] + schema-as-of-position
[C: parse/.../tsdb/DatabaseTableMeta.java :: #apply]."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from canal_spark.engine import CdcEngine
from canal_spark.plans.table import SnapshotTable
from canal_spark.sources.changelog import generate_ddl_events
from tests.conftest import assert_state_equals_oracle


def _commit_boundaries(changelog_dir: str, partition: int) -> list[int]:
    df = pq.read_table(changelog_dir).to_pandas()
    df = df[(df.source_partition == partition) & df.tx_commit]
    return sorted(int(x) for x in df.lsn)


@pytest.fixture(scope="module")
def ddl_dir(changelog_dir, tmp_path_factory) -> tuple[str, list[dict]]:
    """Three DDLs planted at committed-tx boundaries of three different
    partitions (a DDL never sits inside a transaction), plus one at
    position 0 (before any DML in its partition)."""
    b0 = _commit_boundaries(changelog_dir, 0)
    b1 = _commit_boundaries(changelog_dir, 1)
    b2 = _commit_boundaries(changelog_dir, 2)
    ddls = [
        {
            "lsn": 0,
            "source_partition": 3,
            "kind": "ADD_COLUMN",
            "payload": {"name": "pre", "type": "int"},
        },
        {
            "lsn": b0[len(b0) // 3] + 1,
            "source_partition": 0,
            "kind": "ADD_COLUMN",
            "payload": {"name": "lang", "type": "string"},
        },
        {
            "lsn": b1[2 * len(b1) // 3] + 1,
            "source_partition": 1,
            "kind": "RENAME_COLUMN",
            "payload": {"from": "source", "to": "origin"},
        },
        {
            "lsn": b2[-1] + 1,
            "source_partition": 2,
            "kind": "WIDEN_TYPE",
            "payload": {"name": "n_tok", "to": "bigint"},
        },
    ]
    d = tmp_path_factory.mktemp("ddl")
    return generate_ddl_events(str(d / "ddl_events"), ddls), ddls


def test_golden_dml_ddl_dml_replay(spark, changelog_dir, oracle_state, tmp_path, ddl_dir):
    ddl_path, ddls = ddl_dir
    table = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, ddl_events_path=ddl_path)
    eng.run_to_completion()
    assert eng.run_epoch() is None  # idempotent end state

    df = table.read(spark, with_bucket=False)
    assert df.columns == ["doc_id", "tokens", "n_tok", "origin", "pre", "lang"]
    assert dict(df.dtypes)["n_tok"] == "bigint"

    got = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = oracle_state.sort_values("doc_id").reset_index(drop=True)
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.origin) == list(exp.source)
    assert list(got.n_tok) == list(exp.n_tok)
    for g, e in zip(got.tokens, exp.tokens):
        assert list(g) == list(e)
    assert got.lang.isna().all() and got.pre.isna().all()

    # every DDL: own epoch, metadata-only, applied exactly in position
    snaps = [table.snapshot(e) for e in range(0, table.current_epoch() + 1)]
    ddl_snaps = [
        s for s in snaps if s["parent"] is not None
        and s["schema_ver"] != table.snapshot(s["parent"])["schema_ver"]
    ]
    assert len(ddl_snaps) == 4
    assert [s["meta"]["ddl_wm"] for s in ddl_snaps] == [
        [d["lsn"], d["source_partition"]] for d in ddls
    ]
    for s, d in zip(ddl_snaps, ddls):
        parent = table.snapshot(s["parent"])
        assert s["files"] == parent["files"], "DDL epoch must rewrite no data"
        p = d["source_partition"]
        target = min(d["lsn"] - 1, eng.extents[p])
        # partition drained exactly to the DDL position before it applied
        assert int(parent["checkpoints"].get(str(p), -1)) == target


def test_ddl_stream_resume_no_double_apply(spark, changelog_dir, oracle_state, tmp_path, ddl_dir):
    ddl_path, _ = ddl_dir
    root = str(tmp_path / "t2")
    table = SnapshotTable.create(root, n_buckets=8)
    eng = CdcEngine(spark, changelog_dir, table, lsn_budget=400, ddl_events_path=ddl_path)
    for _ in range(4):  # crash mid-replay (past the first DDLs)
        eng.run_epoch()
    ver_mid = table.snapshot()["schema_ver"]
    # cold resume: fresh handles on the same directory
    t2 = SnapshotTable(root)
    eng2 = CdcEngine(spark, changelog_dir, t2, lsn_budget=400, ddl_events_path=ddl_path)
    eng2.run_to_completion()
    assert t2.snapshot()["schema_ver"] == 5  # 1 + exactly 4 DDLs, no re-apply
    assert ver_mid <= 5
    df = t2.read(spark, with_bucket=False)
    assert df.columns == ["doc_id", "tokens", "n_tok", "origin", "pre", "lang"]
    got = df.select("doc_id", "tokens", "n_tok", df.origin.alias("source")).toPandas()
    assert_state_equals_oracle_frame(got, oracle_state)


def assert_state_equals_oracle_frame(got, oracle_pdf):
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = oracle_pdf.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.n_tok) == list(exp.n_tok)
    assert list(got.source) == list(exp.source)
    for g, e in zip(got.tokens, exp.tokens):
        assert list(g) == list(e)
