"""Multi-table routing (SURVEY.md §2 multi-table gap / VERDICT r4 #1):
one interleaved changelog -> N routed tables under a SHARED atomic
group epoch, crash-consistent across tables."""

from __future__ import annotations

import pytest

from canal_spark.multi import GroupLog, MultiTableEngine, TableRoute
from canal_spark.plans.table import SnapshotTable
from tests.conftest import assert_state_equals_oracle
from tests.oracle_replay import replay


def _routes(tmp_path, n_buckets=8):
    a = SnapshotTable.create(str(tmp_path / "ta"), n_buckets=n_buckets)
    b = SnapshotTable.create(str(tmp_path / "tb"), n_buckets=n_buckets)
    return [
        TableRoute("low", a, source_whitelist="src[0-4]"),
        TableRoute("high", b, source_whitelist="src[5-9]"),
    ]


def test_multi_table_replay_parity(spark, changelog_dir, tmp_path):
    """Each routed table's final state equals the pandas oracle replay
    of ITS subscription view; the routes partition the key space, so
    together they cover the full single-table state."""
    routes = _routes(tmp_path)
    eng = MultiTableEngine(
        spark, changelog_dir, routes, str(tmp_path / "grp"), lsn_budget=700
    )
    eng.run_to_completion()
    assert (eng.group.current_epoch() or 0) >= 3  # genuinely chunked
    for route, pat in zip(routes, ("src[0-4]", "src[5-9]")):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )
    # disjoint routes cover the whole table: row counts add up
    full = len(replay(changelog_dir))
    got = sum(r.table.read(spark).count() for r in routes)
    assert got == full
    # shared cursor: every member table carries the SAME final
    # checkpoints as the group marker
    g_ck = eng.group.checkpoints()
    for r in routes:
        assert r.table.checkpoints() == g_ck


def test_multi_table_overlapping_routes(spark, changelog_dir, tmp_path):
    """Routes may overlap (two adapters subscribing the same tables):
    an event matching both lands in both tables."""
    a = SnapshotTable.create(str(tmp_path / "ta"), n_buckets=4)
    b = SnapshotTable.create(str(tmp_path / "tb"), n_buckets=4)
    eng = MultiTableEngine(
        spark,
        changelog_dir,
        [
            TableRoute("all", a),  # no filter: everything
            TableRoute("s3", b, source_whitelist="src3"),
        ],
        str(tmp_path / "grp"),
        lsn_budget=10**9,
    )
    eng.run_to_completion()
    assert_state_equals_oracle(a.read(spark), replay(changelog_dir))
    assert_state_equals_oracle(
        b.read(spark), replay(changelog_dir, source_pattern="src3")
    )


def test_crash_between_table_commits_rolls_forward(
    spark, changelog_dir, tmp_path
):
    """THE atomicity property: crash after table A committed group
    epoch g but before table B / the marker. A fresh engine must
    roll the group forward — replaying the RECORDED slice into B,
    skipping A — and end with both tables consistent."""
    routes = _routes(tmp_path)
    eng = MultiTableEngine(
        spark, changelog_dir, routes, str(tmp_path / "grp"), lsn_budget=600
    )
    assert eng.run_epoch() is not None  # epoch 1 lands cleanly

    # crash simulation: route B's commit dies during group epoch 2
    real_commit = routes[1].table.commit

    def dying_commit(*a, **kw):
        raise RuntimeError("injected crash before table B's commit")

    routes[1].table.commit = dying_commit
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.run_epoch()
    routes[1].table.commit = real_commit

    # torn state: A is at group epoch 2, B at 1, marker at 1
    assert routes[0].table.snapshot()["meta"]["group_epoch"] == 2
    assert routes[1].table.snapshot()["meta"]["group_epoch"] == 1
    assert GroupLog(str(tmp_path / "grp")).current_epoch() == 1

    # a FRESH engine (cold resume) must roll epoch 2 forward
    routes2 = [
        TableRoute("low", SnapshotTable(str(tmp_path / "ta")), "src[0-4]"),
        TableRoute("high", SnapshotTable(str(tmp_path / "tb")), "src[5-9]"),
    ]
    eng2 = MultiTableEngine(
        spark, changelog_dir, routes2, str(tmp_path / "grp"), lsn_budget=600
    )
    res = eng2.run_epoch()
    assert res is not None and res.epoch == 2 and res.rolled_forward
    assert res.n_events["low"] == 0  # A skipped — already applied
    assert res.n_events["high"] > 0  # B replayed the recorded slice
    eng2.run_to_completion()
    for route, pat in zip(routes2, ("src[0-4]", "src[5-9]")):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )


def test_roll_forward_survives_budget_change(spark, changelog_dir, tmp_path):
    """The roll-forward slice comes from the RECORDED watermarks, not a
    re-plan — so resuming a torn group with a different lsn_budget
    still replays the identical slice into the lagging table."""
    routes = _routes(tmp_path)
    eng = MultiTableEngine(
        spark, changelog_dir, routes, str(tmp_path / "grp"), lsn_budget=600
    )
    real_commit = routes[1].table.commit
    routes[1].table.commit = lambda *a, **kw: (_ for _ in ()).throw(
        RuntimeError("injected")
    )
    with pytest.raises(RuntimeError, match="injected"):
        eng.run_epoch()
    routes[1].table.commit = real_commit

    routes2 = [
        TableRoute("low", SnapshotTable(str(tmp_path / "ta")), "src[0-4]"),
        TableRoute("high", SnapshotTable(str(tmp_path / "tb")), "src[5-9]"),
    ]
    # resume with a 5x budget: epoch 1 must still be the torn run's slice
    eng2 = MultiTableEngine(
        spark, changelog_dir, routes2, str(tmp_path / "grp"), lsn_budget=3000
    )
    res = eng2.run_epoch()
    assert res.rolled_forward
    # both tables agree on the group-1 checkpoints (the recorded slice)
    assert routes2[0].table.checkpoints() == routes2[1].table.checkpoints()
    eng2.run_to_completion()
    for route, pat in zip(routes2, ("src[0-4]", "src[5-9]")):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )


def test_multi_table_mor_mode(spark, changelog_dir, tmp_path):
    """Merge-on-read applies per route too; final resolved states match
    the oracle."""
    routes = _routes(tmp_path, n_buckets=4)
    eng = MultiTableEngine(
        spark,
        changelog_dir,
        routes,
        str(tmp_path / "grp"),
        lsn_budget=900,
        write_mode="mor",
    )
    eng.run_to_completion()
    for route, pat in zip(routes, ("src[0-4]", "src[5-9]")):
        assert_state_equals_oracle(
            route.table.read(spark), replay(changelog_dir, source_pattern=pat)
        )


def test_duplicate_route_names_rejected(spark, changelog_dir, tmp_path):
    a = SnapshotTable.create(str(tmp_path / "ta"), n_buckets=2)
    b = SnapshotTable.create(str(tmp_path / "tb"), n_buckets=2)
    with pytest.raises(ValueError, match="duplicate route names"):
        MultiTableEngine(
            spark,
            changelog_dir,
            [TableRoute("x", a), TableRoute("x", b)],
            str(tmp_path / "grp"),
        )


def test_group_rerun_is_noop(spark, changelog_dir, tmp_path):
    """Exactly-once at the group level: a second run_to_completion
    applies nothing and changes no table."""
    routes = _routes(tmp_path)
    eng = MultiTableEngine(
        spark, changelog_dir, routes, str(tmp_path / "grp"), lsn_budget=10**9
    )
    eng.run_to_completion()
    g1 = eng.group.current_epoch()
    epochs1 = [r.table.current_epoch() for r in routes]
    assert eng.run_epoch() is None
    assert eng.group.current_epoch() == g1
    assert [r.table.current_epoch() for r in routes] == epochs1


@pytest.fixture(scope="module")
def mddl_dir(changelog_dir, tmp_path_factory):
    """DDLs planted at committed-tx boundaries (same rule as the
    single-table DDL tests): the instance's one DDL stream replicates
    to every routed table regardless of its source subscription."""
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
    d = tmp_path_factory.mktemp("mddl")
    return generate_ddl_events(str(d / "ddl_events"), ddls), ddls


def _assert_multi_ddl_final(spark, eng, changelog_dir, ddls):
    from tests.test_ddl_stream import assert_state_equals_oracle_frame

    assert eng.group.marker(eng.group.current_epoch())["ddl_wm"] == [
        ddls[-1]["lsn"], ddls[-1]["source_partition"]
    ]
    for route, pat in zip(eng.routes, ("src[0-4]", "src[5-9]")):
        t = route.table
        assert t.snapshot()["schema_ver"] == 4, route.name  # 1 + 3 DDLs
        df = t.read(spark, with_bucket=False)
        assert df.columns == ["doc_id", "tokens", "n_tok", "origin", "pre"], route.name
        assert dict(df.dtypes)["n_tok"] == "bigint", route.name
        got = df.select("doc_id", "tokens", "n_tok", df.origin.alias("source")).toPandas()
        exp = replay(changelog_dir, source_pattern=pat)
        assert_state_equals_oracle_frame(got, exp)
        # every DDL epoch on every member: metadata-only, watermarked
        snaps = [t.snapshot(e) for e in range(0, t.current_epoch() + 1)]
        ddl_snaps = [
            s for s in snaps if s["parent"] is not None
            and s["schema_ver"] != t.snapshot(s["parent"])["schema_ver"]
        ]
        assert [s["meta"]["ddl_wm"] for s in ddl_snaps] == [
            [d["lsn"], d["source_partition"]] for d in ddls
        ], route.name
        for s in ddl_snaps:
            assert s["files"] == t.snapshot(s["parent"])["files"], route.name


def test_multi_table_ddl_replicates_to_all_routes(spark, changelog_dir, tmp_path, mddl_dir):
    ddl_path, ddls = mddl_dir
    routes = _routes(tmp_path)
    eng = MultiTableEngine(
        spark, changelog_dir, routes, str(tmp_path / "grp"),
        lsn_budget=600, ddl_events_path=ddl_path,
    )
    eng.run_to_completion()
    assert eng.run_epoch() is None  # idempotent end state
    _assert_multi_ddl_final(spark, eng, changelog_dir, ddls)


def test_multi_table_ddl_crash_mid_replication_rolls_forward(
    spark, changelog_dir, tmp_path, mddl_dir, monkeypatch
):
    """Crash after the DDL applied to route A but before route B and
    the marker: the next run must re-elect the same DDL group epoch,
    skip A (its ddl_wm covers the position), apply B, and proceed —
    no member ever sees the DDL twice."""
    import canal_spark.engine as engmod

    ddl_path, ddls = mddl_dir
    routes = _routes(tmp_path)
    eng = MultiTableEngine(
        spark, changelog_dir, routes, str(tmp_path / "grp"),
        lsn_budget=600, ddl_events_path=ddl_path,
    )
    real = engmod.apply_schema_update
    applied: list[str] = []

    def crashing(table, kind, payload, meta=None):
        applied.append(table.root)
        if len(applied) == 2:  # second member of the FIRST ddl epoch
            raise RuntimeError("simulated crash mid-replication")
        return real(table, kind, payload, meta)

    monkeypatch.setattr(engmod, "apply_schema_update", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.run_to_completion()
    monkeypatch.setattr(engmod, "apply_schema_update", real)
    assert routes[0].table.snapshot()["schema_ver"] == 2
    assert routes[1].table.snapshot()["schema_ver"] == 1  # B never saw it

    eng2 = MultiTableEngine(
        spark, changelog_dir, _routes_reopen(tmp_path), str(tmp_path / "grp"),
        lsn_budget=600, ddl_events_path=ddl_path,
    )
    eng2.run_to_completion()
    _assert_multi_ddl_final(spark, eng2, changelog_dir, ddls)


def _routes_reopen(tmp_path):
    return [
        TableRoute("low", SnapshotTable(str(tmp_path / "ta")), source_whitelist="src[0-4]"),
        TableRoute("high", SnapshotTable(str(tmp_path / "tb")), source_whitelist="src[5-9]"),
    ]
