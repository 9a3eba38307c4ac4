"""StreamingMultiUpsert: one changelog STREAM -> N routed tables under
the shared atomic group epoch — per-route oracle parity, exactly-once
under redelivery, roll-forward after a crash between member commits,
restart from checkpoint, and the group-level durable pending store for
transactions spanning micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest

from canal_spark.multi import TableRoute
from canal_spark.plans.table import SnapshotTable
from canal_spark.streaming.stream import StreamingMultiUpsert
from tests.conftest import assert_state_equals_oracle
from tests.oracle_replay import replay

PATS = ("src[0-4]", "src[5-9]")


def _routes(tmp_path, n_buckets=8):
    a = SnapshotTable.create(str(tmp_path / "ta"), n_buckets=n_buckets)
    b = SnapshotTable.create(str(tmp_path / "tb"), n_buckets=n_buckets)
    return [
        TableRoute("low", a, source_whitelist=PATS[0]),
        TableRoute("high", b, source_whitelist=PATS[1]),
    ]


def _run(smu: StreamingMultiUpsert, src: str, ckpt: str, max_files=1) -> None:
    q = smu.start(src, ckpt, max_files_per_trigger=max_files)
    assert q.awaitTermination(300)


def test_stream_multi_replay_parity(spark, changelog_dir, oracle_state, tmp_path):
    """4 source files, 1 per trigger -> 4 group epochs; each routed
    table's final state equals the pandas oracle of ITS subscription
    view; member tables share the marker's cursor; superseded pending
    stores are reclaimed."""
    routes = _routes(tmp_path)
    smu = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    _run(smu, changelog_dir, str(tmp_path / "ckpt"))
    assert smu.group.current_epoch() == 4
    for route, pat in zip(routes, PATS):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )
    assert sum(r.table.read(spark).count() for r in routes) == len(oracle_state)
    g_ck = smu.group.checkpoints()
    for r in routes:
        assert r.table.checkpoints() == g_ck
    # trailing incomplete txs are durably pending at the GROUP level
    marker = smu.group.marker(4)
    pend = [os.path.join(smu.group.root, p) for p in marker["pending"]]
    held = spark.read.parquet(*pend)
    assert held.count() > 0 and held.filter("tx_commit").count() == 0
    # pending GC: only the live epoch's store remains
    assert os.listdir(os.path.join(smu.group.root, "pending")) == ["epoch=4"]


def test_stream_multi_redelivery_is_noop(spark, changelog_dir, tmp_path):
    routes = _routes(tmp_path)
    smu = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    _run(smu, changelog_dir, str(tmp_path / "ckpt"))
    epochs = [r.table.current_epoch() for r in routes]
    batch = spark.read.parquet(changelog_dir)
    assert smu.apply_batch(batch, batch_id=0) is False
    assert [r.table.current_epoch() for r in routes] == epochs
    for route, pat in zip(routes, PATS):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )


def test_stream_multi_crash_between_commits_rolls_forward(
    spark, changelog_dir, tmp_path, monkeypatch
):
    """Crash after route A committed group epoch 1 but before route B
    and the marker: redelivering the micro-batch (what Spark does with
    an un-checkpointed batch) must adopt A's RECORDED watermarks, skip
    A, apply the identical slice to B, and publish the marker."""
    import canal_spark.multi as multi

    routes = _routes(tmp_path)
    smu = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    files = sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.endswith(".parquet")
    )
    batch0 = spark.read.parquet(files[0])

    real = multi.apply_route
    calls: list[str] = []

    def crashing(spark_, route, routed, g, wms, **kw):
        calls.append(route.name)
        if route.name == "high":
            raise RuntimeError("simulated crash before route B")
        return real(spark_, route, routed, g, wms, **kw)

    monkeypatch.setattr(multi, "apply_route", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        smu.apply_batch(batch0, batch_id=0)
    monkeypatch.setattr(multi, "apply_route", real)
    assert smu.group.current_epoch() is None  # marker never published
    assert routes[0].table.snapshot()["meta"]["group_epoch"] == 1
    assert calls == ["low", "high"]

    assert smu.apply_batch(batch0, batch_id=0) is True  # the redelivery
    marker = smu.group.marker(1)
    rec = routes[0].table.snapshot()["meta"]["group_wms"]
    assert marker["checkpoints"] == rec  # recorded slice adopted
    assert routes[0].table.current_epoch() == 1  # roll-forward skipped A
    # drain the rest of the stream normally; end-state parity holds
    smu2 = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    for i, f in enumerate(files[1:], start=1):
        smu2.apply_batch(spark.read.parquet(f), batch_id=i)
    for route, pat in zip(routes, PATS):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )


def test_stream_multi_restart_resumes_from_checkpoint(spark, changelog_dir, tmp_path):
    """Drain two files, stop, land the other two, start a FRESH query
    on the same checkpoint: only the remainder is processed and the
    cross-batch pending (txs spanning the stop) resolves correctly."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(changelog_dir) if f.endswith(".parquet"))
    for f in files[:2]:
        shutil.copy(os.path.join(changelog_dir, f), os.path.join(src, f))
    routes = _routes(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    smu1 = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    _run(smu1, src, ckpt)
    assert smu1.group.current_epoch() == 2
    for f in files[2:]:
        shutil.copy(os.path.join(changelog_dir, f), os.path.join(src, f))
    smu2 = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"))
    _run(smu2, src, ckpt)
    assert smu2.group.current_epoch() == 4
    for route, pat in zip(routes, PATS):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )


def test_stream_multi_mor_mode(spark, changelog_dir, tmp_path):
    """MoR streaming multi: every micro-batch appends fragments per
    route; resolved reads match the per-route oracles and compaction
    preserves them."""
    routes = _routes(tmp_path, n_buckets=4)
    smu = StreamingMultiUpsert(spark, routes, str(tmp_path / "grp"), write_mode="mor")
    _run(smu, changelog_dir, str(tmp_path / "ckpt"))
    for route, pat in zip(routes, PATS):
        exp = replay(changelog_dir, source_pattern=pat)
        assert_state_equals_oracle(route.table.read(spark), exp)
        assert route.table.compact_files(spark, target_bytes=1 << 30)
        assert_state_equals_oracle(route.table.read(spark), exp)


@pytest.fixture(scope="module")
def smddl_dir(changelog_dir, tmp_path_factory):
    from canal_spark.sources.changelog import generate_ddl_events
    from tests.test_ddl_stream import _commit_boundaries

    b0 = _commit_boundaries(changelog_dir, 0)
    b1 = _commit_boundaries(changelog_dir, 1)
    ddls = [
        {"lsn": 0, "source_partition": 3, "kind": "ADD_COLUMN",
         "payload": {"name": "pre", "type": "int"}},
        {"lsn": b0[len(b0) // 2] + 1, "source_partition": 0, "kind": "RENAME_COLUMN",
         "payload": {"from": "source", "to": "origin"}},
        {"lsn": b1[-1] + 1, "source_partition": 1, "kind": "WIDEN_TYPE",
         "payload": {"name": "n_tok", "to": "bigint"}},
    ]
    d = tmp_path_factory.mktemp("smddl")
    return generate_ddl_events(str(d / "ddl_events"), ddls), ddls


def test_stream_multi_ddl_replicates_in_position(spark, changelog_dir, tmp_path, smddl_dir):
    """The one DDL stream replicates to every routed table between the
    right micro-batch events; final states match the per-route oracles
    under the evolved schema; redelivery after DDLs is still a no-op."""
    from tests.test_multi_table import _assert_multi_ddl_final

    ddl_path, ddls = smddl_dir
    routes = _routes(tmp_path)
    smu = StreamingMultiUpsert(
        spark, routes, str(tmp_path / "grp"), ddl_events_path=ddl_path
    )
    _run(smu, changelog_dir, str(tmp_path / "ckpt"))
    _assert_multi_ddl_final(spark, smu, changelog_dir, ddls)
    assert smu.apply_batch(spark.read.parquet(changelog_dir), batch_id=0) is False


def test_stream_multi_ddl_crash_mid_replication_rolls_forward(
    spark, changelog_dir, tmp_path, smddl_dir, monkeypatch
):
    """Crash after the DDL applied to route A but before route B: the
    REDELIVERED micro-batch must skip A, apply B, then run the batch's
    DML — no member sees the DDL twice, states stay consistent."""
    import canal_spark.engine as engmod

    ddl_path, ddls = smddl_dir
    routes = _routes(tmp_path)
    smu = StreamingMultiUpsert(
        spark, routes, str(tmp_path / "grp"), ddl_events_path=ddl_path
    )
    files = sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.endswith(".parquet")
    )
    batch0 = spark.read.parquet(files[0])
    real = engmod.apply_schema_update
    calls: list[str] = []

    def crashing(table, kind, payload, meta=None):
        calls.append(table.root)
        if len(calls) == 2:
            raise RuntimeError("simulated crash mid-replication")
        return real(table, kind, payload, meta)

    monkeypatch.setattr(engmod, "apply_schema_update", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        smu.apply_batch(batch0, batch_id=0)  # first DDL (lsn 0) fires first
    monkeypatch.setattr(engmod, "apply_schema_update", real)
    assert routes[0].table.snapshot()["schema_ver"] == 2
    assert routes[1].table.snapshot()["schema_ver"] == 1
    assert smu.group.current_epoch() is None  # no marker published

    assert smu.apply_batch(batch0, batch_id=0) is True  # the redelivery
    assert routes[0].table.snapshot()["schema_ver"] == routes[1].table.snapshot()["schema_ver"]
    for i, f in enumerate(files[1:], start=1):
        smu.apply_batch(spark.read.parquet(f), batch_id=i)
    from tests.test_multi_table import _assert_multi_ddl_final

    _assert_multi_ddl_final(spark, smu, changelog_dir, ddls)


def test_stream_multi_crash_between_sub_epoch_and_final_no_duplicates(
    spark, changelog_dir, tmp_path, smddl_dir, monkeypatch
):
    """The group-level double-union hazard: a sub-epoch marker absorbs
    the micro-batch into the GROUP pending store, then the run crashes
    before the final numbered marker. The redelivered batch must come
    from the pending store only (the marker's sub-batch mark), never
    unioned with batch_df again."""
    from tests.test_multi_table import _assert_multi_ddl_final

    ddl_path, ddls = smddl_dir
    routes = _routes(tmp_path)
    smu = StreamingMultiUpsert(
        spark, routes, str(tmp_path / "grp"), ddl_events_path=ddl_path
    )
    files = sorted(
        os.path.join(changelog_dir, f)
        for f in os.listdir(changelog_dir)
        if f.endswith(".parquet")
    )
    batch0 = spark.read.parquet(files[0])
    real = smu._apply_group_ddl
    calls: list[str] = []

    def crashing(d, g, ckpts):
        calls.append(d["kind"])
        if len(calls) == 2:  # rename, AFTER the first sub-epoch absorbed
            raise RuntimeError("simulated crash after the sub-epoch")
        return real(d, g, ckpts)

    monkeypatch.setattr(smu, "_apply_group_ddl", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        smu.apply_batch(batch0, batch_id=0)
    monkeypatch.setattr(smu, "_apply_group_ddl", real)
    marker = smu.group.marker(smu.group.current_epoch())
    assert marker["stream_sub_batch_id"] == 0  # the sub-epoch published

    assert smu.apply_batch(batch0, batch_id=0) is True  # the redelivery
    for route in routes:
        dups = (
            route.table.read(spark).groupBy("doc_id").count().filter("count > 1").count()
        )
        assert dups == 0, route.name
    for i, f in enumerate(files[1:], start=1):
        smu.apply_batch(spark.read.parquet(f), batch_id=i)
    _assert_multi_ddl_final(spark, smu, changelog_dir, ddls)
