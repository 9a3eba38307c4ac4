"""Deployment CLI — the `canal.deployer` analog for the Spark engine
[C: deployer/.../CanalLauncher.java :: #main]: one entry point a user
runs via `python -m canal_spark …` or ships with
`spark-submit --py-files canal_spark.zip` (the north-rule deployment
mode; the driver script just calls these same functions).

Commands:
  replay    full or budgeted changelog replay into a snapshot table
            (resumes from the committed checkpoints automatically)
  status    table position: epoch, schema version, per-partition
            checkpoints, per-client cursors, lineage totals
  maintain  expire-snapshots / remove-orphans / compact-tombstones /
            compact-files (bin-pack + merge-on-read fragment fold) /
            delete-where (predicate DELETE — the takedown path)

Every command is idempotent and crash-safe by construction (the engine
commits atomically; re-running `replay` after completion is a no-op).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(master: str | None, cpus: int | None):
    from canal_spark.session import get_spark

    master = master or os.environ.get("CANAL_SPARK_MASTER", "local[*]")
    shuffle = cpus or os.cpu_count() or 8
    return get_spark(app="canal_spark_cli", master=master, shuffle_partitions=max(8, shuffle))


def cmd_replay(args) -> int:
    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    spark = _spark(args.master, args.cpus)
    table = (
        SnapshotTable.create(
            args.table,
            n_buckets=args.buckets,
            target_file_rows=args.target_file_rows,
        )
        if not os.path.isdir(os.path.join(args.table, "meta"))
        else SnapshotTable(args.table)
    )
    eng = CdcEngine(
        spark,
        args.changelog,
        table,
        lsn_budget=args.lsn_budget,
        source_whitelist=args.whitelist,
        source_blacklist=args.blacklist,
        ddl_events_path=args.ddl_events,
        xa_mode=args.xa,
        write_mode=args.write_mode,
        auto_compact_fragments=args.auto_compact_fragments,
        capture_changes=args.capture_changes,
    )
    if args.epochs_budget:
        eng.lsn_budget = eng.budget_for_epochs(args.epochs_budget)
    final = eng.run_to_completion(max_epochs=args.max_epochs)
    out = {
        "final_epoch": final,
        "rows": table.read(spark).count(),
        "checkpoints": table.checkpoints(),
    }
    print(json.dumps(out))
    return 0


def cmd_stream(args) -> int:
    """Tail a changelog directory into a snapshot table via Structured
    Streaming (availableNow: drain everything currently there, one
    commit epoch per micro-batch, stop). Re-run as new files land —
    the checkpoint + recorded stream batch id make every run
    exactly-once; a DDL side-stream applies in position."""
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.streaming.stream import StreamingUpsert

    spark = _spark(args.master, args.cpus)
    table = (
        SnapshotTable.create(
            args.table,
            n_buckets=args.buckets,
            target_file_rows=args.target_file_rows,
        )
        if not os.path.isdir(os.path.join(args.table, "meta"))
        else SnapshotTable(args.table)
    )
    su = StreamingUpsert(
        spark,
        table,
        xa_mode=args.xa,
        write_mode=args.write_mode,
        ddl_events_path=args.ddl_events,
        capture_changes=args.capture_changes,
    )
    q = su.start(
        args.changelog, args.checkpoint, max_files_per_trigger=args.max_files_per_trigger
    )
    q.awaitTermination()
    out = {
        "epoch": table.current_epoch(),
        "rows": table.read(spark).count(),
        "checkpoints": table.checkpoints(),
    }
    print(json.dumps(out))
    return 0


def _parse_routes(specs: list[str], buckets: int):
    """--route NAME=TABLE_DIR[::SOURCE_REGEX] -> TableRoute (the
    adapter-instance config: one destination per route, optional
    schema.table-style subscription regex on `source`)."""
    from canal_spark.multi import TableRoute
    from canal_spark.plans.table import SnapshotTable

    routes = []
    for s in specs:
        name, _, rest = s.partition("=")
        if not rest:
            raise SystemExit(f"--route must be NAME=TABLE_DIR[::SOURCE_REGEX], got {s!r}")
        path, _, wl = rest.partition("::")
        table = (
            SnapshotTable.create(path, n_buckets=buckets)
            if not os.path.isdir(os.path.join(path, "meta"))
            else SnapshotTable(path)
        )
        routes.append(TableRoute(name, table, source_whitelist=wl or None))
    return routes


def cmd_multi_replay(args) -> int:
    """Instance-level replay: one changelog into N routed tables under
    the shared atomic group epoch (resumes from the group marker)."""
    from canal_spark.multi import MultiTableEngine

    spark = _spark(args.master, args.cpus)
    routes = _parse_routes(args.route, args.buckets)
    eng = MultiTableEngine(
        spark,
        args.changelog,
        routes,
        args.group_dir,
        lsn_budget=args.lsn_budget,
        write_mode=args.write_mode,
        ddl_events_path=args.ddl_events,
    )
    final = eng.run_to_completion(max_epochs=args.max_epochs)
    out = {
        "group_epoch": final,
        "rows": {r.name: r.table.read(spark).count() for r in routes},
        "checkpoints": eng.group.checkpoints(),
    }
    print(json.dumps(out))
    return 0


def cmd_multi_stream(args) -> int:
    """Instance-level streaming drain: one changelog directory tailed
    into N routed tables, exactly-once per micro-batch across reruns."""
    from canal_spark.streaming.stream import StreamingMultiUpsert

    spark = _spark(args.master, args.cpus)
    routes = _parse_routes(args.route, args.buckets)
    smu = StreamingMultiUpsert(
        spark,
        routes,
        args.group_dir,
        write_mode=args.write_mode,
        ddl_events_path=args.ddl_events,
    )
    q = smu.start(
        args.changelog, args.checkpoint, max_files_per_trigger=args.max_files_per_trigger
    )
    q.awaitTermination()
    out = {
        "group_epoch": smu.group.current_epoch(),
        "rows": {r.name: r.table.read(spark).count() for r in routes},
        "checkpoints": smu.group.checkpoints(),
    }
    print(json.dumps(out))
    return 0


def cmd_replicate(args) -> int:
    """Sync a replica table from the primary's change feed (creates
    the replica on first run with the primary's key/schema)."""
    from canal_spark.operators.replicate import TableReplicator
    from canal_spark.plans.table import SnapshotTable

    spark = _spark(args.master, args.cpus)
    primary = SnapshotTable(args.primary)
    if not os.path.isdir(os.path.join(args.replica, "meta")):
        rep = TableReplicator.create_replica(
            primary, args.replica, n_buckets=args.buckets
        )
    else:
        rep = TableReplicator(primary, SnapshotTable(args.replica))
    synced = rep.sync(spark)
    print(
        json.dumps(
            {
                "synced_to": synced if synced is not None else rep.replicated_epoch(),
                "noop": synced is None,
                "replica_epoch": rep.replica.current_epoch(),
                "rows": rep.replica.read(spark).count(),
            }
        )
    )
    return 0


def cmd_group_status(args) -> int:
    """Instance-level position: the authoritative group marker (shared
    cursor, member table epochs, stream batch id, ddl watermark).
    Driver-side file read — no Spark session."""
    from canal_spark.multi import GroupLog

    g = GroupLog(args.group_dir)
    cur = g.current_epoch()
    out = {"group_epoch": cur}
    if cur is not None:
        m = g.marker(cur)
        out.update(
            {
                "checkpoints": m.get("checkpoints", {}),
                "tables": m.get("tables", {}),
                "stream_batch_id": m.get("stream_batch_id"),
                "ddl_wm": m.get("ddl_wm"),
                "pending_files": len(m.get("pending", [])),
            }
        )
    print(json.dumps(out))
    return 0


def cmd_rollback(args) -> int:
    """Roll the table back to an earlier epoch (new snapshot carrying
    the old state + checkpoints verbatim): the poisoned-batch recovery
    path. Pure metadata — no Spark session."""
    from canal_spark.plans.table import SnapshotTable

    if (args.epoch is None) == (args.at is None):
        raise SystemExit("rollback: exactly one of --epoch / --at is required")
    table = SnapshotTable(args.table)
    target = table.epoch_at(args.at) if args.at else args.epoch
    new_epoch = table.rollback_to(target)
    print(
        json.dumps(
            {
                "epoch": new_epoch,
                "restored": target,
                "checkpoints": table.snapshot()["checkpoints"],
            }
        )
    )
    return 0


def cmd_tag(args) -> int:
    """Pin (or release / list) named snapshots — tag --name pins, --drop
    releases, neither lists. Pure metadata, no Spark session; a pinned
    epoch survives expire_snapshots + remove_orphans until dropped."""
    from canal_spark.plans.table import SnapshotTable

    table = SnapshotTable(args.table)
    if args.drop:
        table.drop_tag(args.drop)
        print(json.dumps({"dropped": args.drop, "tags": table.tags()}))
    elif args.name:
        epoch = table.tag(args.name, epoch=args.epoch)
        print(json.dumps({"tag": args.name, "epoch": epoch}))
    else:
        print(json.dumps({"tags": table.tags()}))
    return 0


def cmd_ref(args) -> int:
    """Branch refs (mutable pins — the WAP surface): --name sets/moves,
    --fast-forward advances to the chain head (or --epoch), --drop
    releases, neither lists. Pure metadata, no Spark session."""
    from canal_spark.plans.table import SnapshotTable

    table = SnapshotTable(args.table)
    if args.drop:
        table.drop_ref(args.drop)
        print(json.dumps({"dropped": args.drop, "refs": table.refs()}))
    elif args.fast_forward:
        epoch = table.fast_forward(args.fast_forward, epoch=args.epoch)
        print(json.dumps({"ref": args.fast_forward, "epoch": epoch}))
    elif args.name:
        epoch = table.set_ref(args.name, epoch=args.epoch)
        print(json.dumps({"ref": args.name, "epoch": epoch}))
    else:
        print(json.dumps({"refs": table.refs()}))
    return 0


def cmd_status(args) -> int:
    from canal_spark.plans.cursors import CursorRegistry
    from canal_spark.plans.table import SnapshotTable

    table = SnapshotTable(args.table)
    snap = table.snapshot()
    lineage_events = sum(r["n_events"] for r in snap.get("lineage", []))
    reg = CursorRegistry(table.meta_dir)
    out = {
        "epoch": snap["epoch"],
        "committed_at_us": snap.get("committed_at_us"),
        "schema_ver": snap["schema_ver"],
        "n_buckets": snap["n_buckets"],
        "checkpoints": snap["checkpoints"],
        "last_epoch_events": lineage_events,
        "clients": {c: reg.get(c)["positions"] for c in reg.clients()},
        "pending_files": len(snap.get("pending", [])),
    }
    print(json.dumps(out))
    return 0


def cmd_lookup(args) -> int:
    """Point lookup by key — the operational 'what is this row now':
    bucket derived from the key, files pruned by manifest bounds, so
    the answer costs O(matching files), never a table scan."""
    from canal_spark.plans.table import SnapshotTable

    spark = _spark(args.master, args.cpus)
    table = SnapshotTable(args.table)
    # the CLI hands us a string; a numeric key column compares
    # unorderably against parquet-footer bounds and coerces the Spark
    # residual filter to double (precision loss past 2^53) — cast to
    # the snapshot's declared key type first
    snap = table.snapshot(args.epoch)
    key_type = next(
        f["type"]
        for f in snap["schemas"][str(snap["schema_ver"])]
        if f["name"] == snap["key_col"]
    )
    casts = {"int": int, "bigint": int, "long": int, "float": float, "double": float}
    try:
        key = casts.get(key_type, str)(args.key)
    except ValueError:
        print(
            f"--key: {args.key!r} is not a valid {key_type} "
            f"(key column {snap['key_col']!r})",
            file=sys.stderr,
        )
        return 2
    df = table.read(
        spark, epoch=args.epoch, key_range=(key, key), with_bucket=False
    )
    rows = [r.asDict(recursive=True) for r in df.collect()]
    print(
        json.dumps(
            {
                "key": key,
                "epoch": args.epoch if args.epoch is not None else table.current_epoch(),
                "rows": rows,
                "files_opened": len(df.inputFiles()),
            },
            default=str,
        )
    )
    return 0


def cmd_maintain(args) -> int:
    from canal_spark.plans.table import SnapshotTable

    # validate EVERY argument before running ANY action: a maintenance
    # invocation must not half-execute (e.g. commit a tombstone-GC
    # epoch) and then die on a later flag's validation, discarding the
    # JSON record of what it already did
    if args.compact_files is not None and args.compact_files <= 0:
        print(
            f"--compact-files: TARGET_BYTES must be positive, got {args.compact_files}",
            file=sys.stderr,
        )
        return 2
    table = SnapshotTable(args.table)
    out: dict = {}
    if args.rebucket is not None:
        spark = _spark(args.master, args.cpus)
        out["rebucket_epoch"] = table.rebucket(spark, args.rebucket)
    if args.expire_retain is not None:
        out["expired_snapshots"] = table.expire_snapshots(retain_last=args.expire_retain)
    if args.compact:
        from canal_spark.engine import CdcEngine

        spark = _spark(args.master, args.cpus)
        eng = CdcEngine(spark, args.changelog, table)
        out["tombstones_dropped"] = eng.compact_tombstones()
    if args.compact_files is not None:
        spark = _spark(args.master, args.cpus)
        packed = table.compact_files(spark, target_bytes=args.compact_files)
        out["compacted_buckets"] = {
            str(b): {"files_before": nb, "files_after": na}
            for b, (nb, na) in packed.items()
        }
    if args.delete_where is not None:
        spark = _spark(args.master, args.cpus)
        hits = table.delete_where(spark, args.delete_where)
        out["deleted_rows"] = sum(hits.values())
        out["deleted_buckets"] = {str(b): n for b, n in sorted(hits.items())}
    if args.gc:
        out["orphans_removed"] = table.remove_orphans(min_age_seconds=args.gc_min_age)
    print(json.dumps(out))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="canal_spark")
    ap.add_argument("--master", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("replay", help="replay a changelog into a snapshot table")
    rp.add_argument("--changelog", required=True)
    rp.add_argument("--table", required=True)
    rp.add_argument("--buckets", type=int, default=32)
    rp.add_argument("--capture-changes", action="store_true",
                    help="write per-epoch CDF capture files (Delta "
                         "change-data-files analog); read_changes serves "
                         "captured ranges without a table scan")
    rp.add_argument("--target-file-rows", type=int, default=None,
                    help="opt the table into the key-sorted split layout: "
                    "replace-mode writes roll a new range-disjoint file "
                    "every N rows (tight manifest bounds for update-shaped "
                    "workloads; ~5%% replay cost)")
    rp.add_argument("--lsn-budget", type=int, default=1_000_000)
    rp.add_argument("--epochs-budget", type=int, default=None,
                    help="derive lsn budget to finish in N epochs")
    rp.add_argument("--max-epochs", type=int, default=10_000)
    rp.add_argument("--whitelist", default=None)
    rp.add_argument("--blacklist", default=None)
    rp.add_argument("--ddl-events", default=None)
    rp.add_argument("--xa", action="store_true")
    rp.add_argument("--write-mode", choices=("cow", "mor"), default="cow",
                    help="cow: bucket-pruned copy-on-write merge per epoch; "
                    "mor: merge-on-read — O(delta) fragment appends, resolve "
                    "on read, fold with maintain --compact-files")
    rp.add_argument("--auto-compact-fragments", type=int, default=None,
                    help="with --write-mode mor: fold a bucket's fragments "
                    "(compact_files) whenever it accumulates N fragment "
                    "files BEYOND its bin-pack goal (ceil(bucket_bytes / "
                    "target)); only the triggering buckets are folded")
    rp.set_defaults(fn=cmd_replay)

    sm = sub.add_parser(
        "stream",
        help="tail a changelog directory into a snapshot table "
        "(Structured Streaming, availableNow drain)",
    )
    sm.add_argument("--changelog", required=True)
    sm.add_argument("--table", required=True)
    sm.add_argument("--checkpoint", required=True)
    sm.add_argument("--buckets", type=int, default=32)
    sm.add_argument("--target-file-rows", type=int, default=None)
    sm.add_argument("--max-files-per-trigger", type=int, default=1)
    sm.add_argument("--ddl-events", default=None)
    sm.add_argument("--xa", action="store_true")
    sm.add_argument("--write-mode", choices=("cow", "mor"), default="cow")
    sm.add_argument("--capture-changes", action="store_true",
                    help="write per-epoch CDF capture files (see replay)")
    sm.set_defaults(fn=cmd_stream)

    for nm, fn, streaming in (
        ("multi-replay", cmd_multi_replay, False),
        ("multi-stream", cmd_multi_stream, True),
    ):
        mp = sub.add_parser(
            nm,
            help=f"{'stream' if streaming else 'replay'} one changelog into N "
            "routed tables under a shared atomic group epoch",
        )
        mp.add_argument("--changelog", required=True)
        mp.add_argument("--group-dir", required=True)
        mp.add_argument(
            "--route", action="append", required=True,
            metavar="NAME=TABLE_DIR[::SOURCE_REGEX]",
            help="repeatable; one destination table per route with an "
            "optional source-subscription regex",
        )
        mp.add_argument("--buckets", type=int, default=32)
        mp.add_argument("--write-mode", choices=("cow", "mor"), default="cow")
        mp.add_argument("--ddl-events", default=None)
        if streaming:
            mp.add_argument("--checkpoint", required=True)
            mp.add_argument("--max-files-per-trigger", type=int, default=1)
        else:
            mp.add_argument("--lsn-budget", type=int, default=1_000_000)
            mp.add_argument("--max-epochs", type=int, default=10_000)
        mp.set_defaults(fn=fn)

    rc = sub.add_parser(
        "replicate",
        help="sync a replica table from the primary's change feed",
    )
    rc.add_argument("--primary", required=True)
    rc.add_argument("--replica", required=True)
    rc.add_argument("--buckets", type=int, default=None,
                    help="replica bucket count on first create (default: primary's)")
    rc.set_defaults(fn=cmd_replicate)

    gs = sub.add_parser(
        "group-status", help="print the group marker (multi-table position) as JSON"
    )
    gs.add_argument("--group-dir", required=True)
    gs.set_defaults(fn=cmd_group_status)

    rb = sub.add_parser(
        "rollback", help="roll the table back to an earlier epoch (metadata-only)"
    )
    rb.add_argument("--table", required=True)
    rb.add_argument("--epoch", type=int, default=None)
    rb.add_argument("--at", default=None,
                    help="restore to the snapshot current at this ISO "
                         "timestamp (TIMESTAMP AS OF; alternative to --epoch)")
    rb.set_defaults(fn=cmd_rollback)

    tg = sub.add_parser(
        "tag", help="pin/release/list named snapshots (metadata-only)"
    )
    tg.add_argument("--table", required=True)
    tg.add_argument("--name", help="tag to create (default: list tags)")
    tg.add_argument("--epoch", type=int, default=None, help="epoch to pin (default: current)")
    tg.add_argument("--drop", help="tag name to release")
    tg.set_defaults(fn=cmd_tag)

    rf = sub.add_parser(
        "ref", help="set/move/fast-forward/drop/list branch refs (WAP publish)"
    )
    rf.add_argument("--table", required=True)
    rf.add_argument("--name", help="ref to set or move (default: list refs)")
    rf.add_argument("--epoch", type=int, default=None,
                    help="epoch to point at (default: current)")
    rf.add_argument("--fast-forward", metavar="NAME",
                    help="advance NAME to --epoch or the chain head (forward-only)")
    rf.add_argument("--drop", help="ref name to release")
    rf.set_defaults(fn=cmd_ref)

    st = sub.add_parser("status", help="print table position/meta as JSON")
    st.add_argument("--table", required=True)
    st.set_defaults(fn=cmd_status)

    lk = sub.add_parser(
        "lookup", help="point lookup by key (bucket + manifest-bounds pruned)"
    )
    lk.add_argument("--table", required=True)
    lk.add_argument("--key", required=True)
    lk.add_argument("--epoch", type=int, default=None,
                    help="time-travel to a retained snapshot (default: current)")
    lk.set_defaults(fn=cmd_lookup)

    mt = sub.add_parser("maintain", help="snapshot/tombstone/orphan maintenance")
    mt.add_argument("--table", required=True)
    mt.add_argument("--rebucket", type=int, default=None,
                    help="rewrite the table into N hash buckets (full rewrite)")
    mt.add_argument("--expire-retain", type=int, default=None)
    mt.add_argument("--compact", action="store_true")
    mt.add_argument("--compact-files", type=int, default=None, metavar="TARGET_BYTES",
                    help="bin-pack fragmented buckets into ~TARGET_BYTES files "
                    "(one commit epoch; resolves merge-on-read fragments). "
                    "Superseded fragments stay referenced by older snapshots "
                    "until --expire-retain/--gc reclaim them (same min-age "
                    "guard as --gc applies to concurrent writers).")
    mt.add_argument("--changelog", default=None,
                    help="required with --compact (partition extents)")
    mt.add_argument("--delete-where", default=None, metavar="PREDICATE",
                    help="predicate DELETE (takedown path): remove every row "
                    "matching this SQL boolean as one CoW commit epoch; "
                    "deleted rows stay time-travel-readable until expired")
    mt.add_argument("--gc", action="store_true")
    mt.add_argument("--gc-min-age", type=float, default=300.0)
    mt.set_defaults(fn=cmd_maintain)

    args = ap.parse_args(argv)
    if args.cmd == "maintain" and args.compact and not args.changelog:
        ap.error("--compact requires --changelog")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
