"""End-to-end drive for spark-submit verification (see
.claude/skills/verify): gen | replay-some | resume | rerun | parity | partial |
rollback | multi | stream | stream-multi (CoW phases also take a -mor
suffix). Each phase runs in its own JVM so resume is a real cold
start."""

from __future__ import annotations

import os
import sys

WORK = "/tmp/canal_verify"
LOG = f"{WORK}/log"
TABLE = f"{WORK}/table"


def get_spark():
    from canal_spark.session import get_spark as gs

    return gs(app="verify_drive", master="local[8]", shuffle_partitions=16)


def main(phase: str) -> None:
    if phase == "gen":
        import shutil

        from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

        shutil.rmtree(WORK, ignore_errors=True)
        generate_changelog(LOG, ChangelogSpec(n_events=100_000, n_partitions=8, n_keys=5000))
        print("VERIFY gen: ok")
        return

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    spark = get_spark()
    mor = phase.endswith("-mor")
    table_path = TABLE + ("_mor" if mor else "")
    kw = (
        {"write_mode": "mor", "auto_compact_fragments": 4} if mor else {}
    )
    phase = phase.removesuffix("-mor")
    if phase == "replay-some":
        table = SnapshotTable.create(table_path, n_buckets=16)
        # capture_changes on: the drive doubles as the end-to-end check
        # that write-time CDF capture never disturbs replay parity
        eng = CdcEngine(spark, LOG, table, lsn_budget=8000, capture_changes=True, **kw)
        for _ in range(3):
            eng.run_epoch()
        print(f"VERIFY replay-some: epoch={table.current_epoch()} rows={table.read(spark).count()}")
    elif phase == "resume":
        table = SnapshotTable(table_path)  # fresh handle, cold JVM
        eng = CdcEngine(spark, LOG, table, lsn_budget=8000, capture_changes=True, **kw)
        final = eng.run_to_completion()
        print(f"VERIFY resume: final_epoch={final} rows={table.read(spark).count()}")
    elif phase == "rerun":
        table = SnapshotTable(table_path)
        eng = CdcEngine(spark, LOG, table, lsn_budget=8000, **kw)
        res = eng.run_epoch()
        assert res is None, f"re-apply must be a no-op, got {res}"
        print("VERIFY rerun: no-op ok")
    elif phase == "parity":
        sys.path.insert(0, "/root/repo")
        from tests.oracle_replay import replay

        table = SnapshotTable(table_path)
        got = (
            table.read(spark)
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = replay(LOG).sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(exp), (len(got), len(exp))
        assert list(got.doc_id) == list(exp.doc_id)
        assert list(got.n_tok) == list(exp.n_tok)
        assert list(got.source) == list(exp.source)
        bad = sum(1 for g, e in zip(got.tokens, exp.tokens) if list(g) != list(e))
        assert bad == 0, f"{bad} token-array mismatches"
        # the whole replay was capture-enabled: the captured change feed
        # must agree with the snapshot diff over the full history
        final = table.current_epoch()
        cap = table.read_changes(spark, 0, final, source="captured")
        diff = table.read_changes(spark, 0, final, source="diff")
        assert cap.exceptAll(diff).count() == 0 and diff.exceptAll(cap).count() == 0
        print(
            f"VERIFY parity: {len(got)} rows byte-exact vs pandas oracle; "
            f"captured CDF == snapshot diff over (0, {final}]"
        )
    elif phase == "partial":
        # sparse-row-image drive (self-contained: own log + table):
        # generate a partial_updates changelog, replay it in several
        # epochs with a mid-way fresh-handle resume, oracle parity on
        # every column including the NULLs sparse writes leave behind
        import math

        sys.path.insert(0, "/root/repo")
        from canal_spark.sources.changelog import ChangelogSpec, generate_changelog
        from tests.oracle_replay import replay

        plog = f"{WORK}/plog"
        if not os.path.isdir(plog):
            generate_changelog(
                plog,
                ChangelogSpec(
                    n_events=20_000, n_partitions=4, n_keys=800, partial_updates=True
                ),
            )
        pt_path = f"{WORK}/ptable"
        table = SnapshotTable.create(pt_path, n_buckets=8)
        eng = CdcEngine(spark, plog, table, lsn_budget=3000, partial_updates=True)
        eng.run_epoch()
        eng.run_epoch()
        resumed = SnapshotTable(pt_path)  # fresh handle mid-way
        CdcEngine(
            spark, plog, resumed, lsn_budget=3000, partial_updates=True
        ).run_to_completion()

        def norm(v):
            return None if v is None or (isinstance(v, float) and math.isnan(v)) else int(v)

        got = {
            r.doc_id: (
                None if r.tokens is None else list(r.tokens),
                norm(r.n_tok),
                r.source if isinstance(r.source, str) else None,
            )
            for r in resumed.read(spark)
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas()
            .itertuples(index=False)
        }
        exp = {
            r.doc_id: (
                r.tokens,
                norm(r.n_tok),
                r.source if isinstance(r.source, str) else None,
            )
            for r in replay(plog).itertuples(index=False)
        }
        assert got == exp
        sparse = sum(1 for v in got.values() if (v[0] is None) != (v[2] is None))
        print(
            f"VERIFY partial: {len(got)} rows per-column-exact vs pandas oracle "
            f"after resume ({sparse} rows carry a sparse NULL)"
        )
    elif phase == "rollback":
        # poisoned-batch recovery drive (run after parity): rewind the
        # fully-replayed table two epochs, verify the checkpoints moved
        # back with it, then a FRESH handle re-applies the undone
        # events and must land byte-exact on the oracle again
        sys.path.insert(0, "/root/repo")
        from tests.oracle_replay import replay

        table = SnapshotTable(table_path)
        final_epoch = table.current_epoch()
        target = final_epoch - 2
        new_epoch = table.rollback_to(target)
        assert new_epoch == final_epoch + 1
        assert table.snapshot()["checkpoints"] == table.snapshot(target)["checkpoints"]
        rolled_rows = table.read(spark).count()
        t2 = SnapshotTable(table_path)
        CdcEngine(spark, LOG, t2, lsn_budget=8000, **kw).run_to_completion()
        got = (
            t2.read(spark)
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        exp = replay(LOG).sort_values("doc_id").reset_index(drop=True)
        assert list(got.doc_id) == list(exp.doc_id)
        assert list(got.n_tok) == list(exp.n_tok)
        bad = sum(1 for g, e in zip(got.tokens, exp.tokens) if list(g) != list(e))
        assert bad == 0, f"{bad} token-array mismatches after rollback+resume"
        print(
            f"VERIFY rollback: rewound {final_epoch}->{target} "
            f"({rolled_rows} rows), resumed to byte-exact parity ({len(got)} rows)"
        )
    elif phase == "replicate":
        # downstream-sync drive (run after rollback): a fresh replica on
        # a DIFFERENT bucket layout syncs from the primary's change feed
        # (which here spans capture-enabled, rollback and resumed
        # epochs) and must land byte-exact on the same pandas oracle;
        # a second sync must be a no-op
        sys.path.insert(0, "/root/repo")
        from canal_spark.operators.replicate import TableReplicator
        from tests.oracle_replay import replay

        primary = SnapshotTable(table_path)
        rep_path = table_path + "_replica"
        if os.path.isdir(os.path.join(rep_path, "meta")):
            rep = TableReplicator(primary, SnapshotTable(rep_path))
        else:
            rep = TableReplicator.create_replica(primary, rep_path, n_buckets=8)
        synced = rep.sync(spark)
        assert synced == primary.current_epoch(), synced
        assert rep.sync(spark) is None
        got = (
            rep.replica.read(spark)
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        exp = replay(LOG).sort_values("doc_id").reset_index(drop=True)
        assert list(got.doc_id) == list(exp.doc_id)
        assert list(got.n_tok) == list(exp.n_tok)
        bad = sum(1 for g, e in zip(got.tokens, exp.tokens) if list(g) != list(e))
        assert bad == 0, f"{bad} token-array mismatches on the replica"
        print(
            f"VERIFY replicate: replica synced to primary epoch {synced}, "
            f"{len(got)} rows byte-exact vs pandas oracle, resync no-op"
        )
    elif phase == "multi":
        # multi-table routing drive: partial replay, fresh-handle
        # resume, per-route parity vs the pandas oracle's subscription
        # views (tests/oracle_replay.replay(source_pattern=...))
        from canal_spark.multi import MultiTableEngine, TableRoute

        sys.path.insert(0, "/root/repo")
        from tests.oracle_replay import replay

        def routes():
            return [
                TableRoute("low", SnapshotTable.create(f"{WORK}/mt_low", n_buckets=8),
                           source_whitelist="src[0-4]"),
                TableRoute("high", SnapshotTable.create(f"{WORK}/mt_high", n_buckets=8),
                           source_whitelist="src[5-9]"),
            ]

        eng = MultiTableEngine(spark, LOG, routes(), f"{WORK}/mt_grp", lsn_budget=8000)
        for _ in range(2):
            eng.run_epoch()
        eng2 = MultiTableEngine(spark, LOG, routes(), f"{WORK}/mt_grp", lsn_budget=8000)
        eng2.run_to_completion()
        total = 0
        for route, pat in zip(eng2.routes, ("src[0-4]", "src[5-9]")):
            got = (
                route.table.read(spark)
                .select("doc_id", "n_tok", "source")
                .toPandas().sort_values("doc_id").reset_index(drop=True)
            )
            exp = replay(LOG, source_pattern=pat).sort_values("doc_id").reset_index(drop=True)
            assert list(got.doc_id) == list(exp.doc_id), route.name
            assert list(got.n_tok) == list(exp.n_tok), route.name
            total += len(got)
        assert eng2.run_epoch() is None  # group-level exactly-once
        print(f"VERIFY multi: {total} rows across 2 routed tables match per-route oracles")
    elif phase == "stream":
        # streaming front-end drive: availableNow file-tail in one JVM,
        # then a FRESH JVM run on the same checkpoint must be a no-op
        # and the state must match the pandas oracle (exactly-once from
        # an at-least-once source)
        sys.path.insert(0, "/root/repo")
        from canal_spark.streaming.stream import StreamingUpsert

        from tests.oracle_replay import replay

        st_path = f"{WORK}/stream_table"
        fresh = not os.path.isdir(st_path)
        table = (
            SnapshotTable.create(st_path, n_buckets=16)
            if fresh
            else SnapshotTable(st_path)
        )
        su = StreamingUpsert(spark, table)
        q = su.start(LOG, f"{WORK}/stream_ckpt", max_files_per_trigger=1)
        assert q.awaitTermination(600)
        epoch = table.current_epoch()
        # gen writes one file per source partition (8): the fresh run
        # commits exactly 8 stream epochs; the rerun-on-same-checkpoint
        # must re-deliver nothing and leave the epoch untouched
        assert epoch == 8, epoch
        got = (
            table.read(spark)
            .select("doc_id", "tokens", "n_tok", "source")
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        exp = replay(LOG).sort_values("doc_id").reset_index(drop=True)
        assert list(got.doc_id) == list(exp.doc_id)
        assert list(got.n_tok) == list(exp.n_tok)
        bad = sum(1 for g, e in zip(got.tokens, exp.tokens) if list(g) != list(e))
        assert bad == 0, f"{bad} token-array mismatches"
        print(
            f"VERIFY stream({'fresh' if fresh else 'rerun-noop'}): "
            f"epoch={epoch} {len(got)} rows byte-exact vs pandas oracle"
        )
    elif phase == "stream-multi":
        # streaming multi-table drive: one stream, two routed tables,
        # per-route oracle parity; a second run is a group-level no-op
        sys.path.insert(0, "/root/repo")
        from canal_spark.multi import TableRoute
        from canal_spark.streaming.stream import StreamingMultiUpsert

        from tests.oracle_replay import replay

        fresh = not os.path.isdir(f"{WORK}/smt_low")
        if fresh:
            ta = SnapshotTable.create(f"{WORK}/smt_low", n_buckets=8)
            tb = SnapshotTable.create(f"{WORK}/smt_high", n_buckets=8)
        else:
            ta, tb = SnapshotTable(f"{WORK}/smt_low"), SnapshotTable(f"{WORK}/smt_high")
        routes = [
            TableRoute("low", ta, source_whitelist="src[0-4]"),
            TableRoute("high", tb, source_whitelist="src[5-9]"),
        ]
        smu = StreamingMultiUpsert(spark, routes, f"{WORK}/smt_grp")
        q = smu.start(LOG, f"{WORK}/smt_ckpt", max_files_per_trigger=1)
        assert q.awaitTermination(600)
        total = 0
        for route, pat in zip(routes, ("src[0-4]", "src[5-9]")):
            got = (
                route.table.read(spark)
                .select("doc_id", "n_tok", "source")
                .toPandas().sort_values("doc_id").reset_index(drop=True)
            )
            exp = replay(LOG, source_pattern=pat).sort_values("doc_id").reset_index(drop=True)
            assert list(got.doc_id) == list(exp.doc_id), route.name
            assert list(got.n_tok) == list(exp.n_tok), route.name
            total += len(got)
        print(
            f"VERIFY stream-multi({'fresh' if fresh else 'rerun-noop'}): "
            f"group_epoch={smu.group.current_epoch()} {total} rows across "
            "2 routed tables match per-route oracles"
        )
    else:
        raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main(sys.argv[1])
