"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: the north-rule CDC replay — sustained change-events/sec
through the full pipeline (scan -> tx barrier -> LWW -> bucket-pruned
MERGE -> atomic commit) over a synthetic changelog (seed=42, cached in
/tmp keyed by spec), plus per-operator timings over the driver testdata.

Scaling evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from canal_spark.engine import CdcEngine  # noqa: E402
from canal_spark.plans.table import SnapshotTable  # noqa: E402
from canal_spark.queries import QUERIES  # noqa: E402
from canal_spark.session import get_spark  # noqa: E402
from canal_spark.sources.changelog import ChangelogSpec, generate_changelog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("CANAL_BENCH_EVENTS", "8000000"))
N_EPOCHS = int(os.environ.get("CANAL_BENCH_EPOCHS", "2"))
# run-until-converged at full scale (r4, was fixed best-of-4):
# JIT/codegen profiles are stage- and scale-specific, so a small warmup
# does NOT bring the first full-run to steady state; tiered compilation
# converges only after several full-scale replays (measured: 41s, 33s,
# 33s / 25s, 26s, 31s, 13.6s — and the r3 driver window's cdc_replay
# series 27.3 → 10.8 → 10.0 → 9.3 was STILL descending at the 4-run
# cap). The scaling harness's plateau criterion is now the bench's
# too: stop once the best wall stops improving >2% for 2 consecutive
# runs, floor N_RUNS, cap N_RUNS_MAX.
N_RUNS = int(os.environ.get("CANAL_BENCH_RUNS", "4"))
N_RUNS_MAX = int(os.environ.get("CANAL_BENCH_RUNS_MAX", "10"))


def run_until_converged(fn, min_runs: int, max_runs: int, wall_of=lambda r: r):
    """Repeat `fn` until its best wall time plateaus (no >2%
    improvement for 2 consecutive runs), bounded by [min_runs,
    max_runs]. Returns every run's result, in order."""
    max_runs = max(min_runs, max_runs)  # CANAL_BENCH_RUNS > _RUNS_MAX must not silently truncate
    results, best, stale = [], float("inf"), 0
    while len(results) < max_runs:
        r = fn()
        results.append(r)
        w = wall_of(r)
        if w < best * 0.98:
            best, stale = w, 0
        else:
            stale += 1
        if len(results) >= min_runs and stale >= 2:
            break
    return results

HEADLINE = [
    "lww_dedup_last_event",
    "partial_update_collapse",
    "merge_upsert_final_state",
    "join_enrich_broadcast",
    "topk_hot_keys",
    "union_multi_source",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "asof_join_last_click",
    "range_join_ship_window",
    "flatmessage_roundtrip",
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "winnowing_fingerprints",
    "pack_sequences",
    "refine_corpus",
]

#: update-heavy A/B shape: seed ~90% of the log as one bulk epoch,
#: then apply the tail as N small update epochs — the regime where
#: copy-on-write pays a full-bucket rewrite per epoch to change a few
#: rows and merge-on-read pays O(delta)
N_EPOCHS_UPDATE = int(os.environ.get("CANAL_BENCH_EPOCHS_UPDATE", "8"))


#: tmpfs when available — the VM's virtio disk serializes concurrent
#: shuffle writers and would measure the disk (BENCH/BASELINE.md)
WORK_ROOT = "/dev/shm/canal" if os.path.isdir("/dev/shm") else "/tmp/canal"


def bench_changelog(n_events: int) -> tuple[str, ChangelogSpec]:
    spec = ChangelogSpec(
        n_events=n_events, n_partitions=32, n_keys=max(1000, n_events // 80), seed=42
    )
    path = f"{WORK_ROOT}/bench_log_{n_events}_{spec.n_partitions}_{spec.n_keys}"
    if not os.path.exists(os.path.join(path, "part-p0000.parquet")):
        generate_changelog(path, spec)
    return path, spec


def warmup(spark) -> None:
    """Small replay to get past JIT/codegen before the timed window."""
    import shutil

    log, _ = bench_changelog(100_000)
    wt = f"{WORK_ROOT}/warm_table"
    shutil.rmtree(wt, ignore_errors=True)
    CdcEngine(spark, log, SnapshotTable.create(wt, n_buckets=16), lsn_budget=10**9).run_to_completion()


def run_cdc_replay(spark, n_events: int, n_epochs: int, workdir: str) -> dict:
    """The north-rule job: full replay in ~n_epochs bounded epochs."""
    import shutil

    log, spec = bench_changelog(n_events)
    shutil.rmtree(workdir, ignore_errors=True)
    table = SnapshotTable.create(workdir, n_buckets=max(32, CPUS))
    eng = CdcEngine(spark, log, table, lsn_budget=1)
    _ = eng.extents  # planning scan outside the timed window
    # exact budget from extents: the replay runs in exactly n_epochs
    # (a row-count heuristic leaves a degenerate trailing epoch that
    # pays full fixed cost for ~no events)
    eng.lsn_budget = eng.budget_for_epochs(n_epochs)
    t0 = time.monotonic()
    final_epoch = eng.run_to_completion()
    wall = time.monotonic() - t0
    lin = table.lineage_df(spark).toPandas()
    applied = int(lin.n_events.sum())
    return {
        "wall_sec": round(wall, 3),
        "epochs": int(final_epoch),
        "events_applied": applied,
        "events_per_sec": round(applied / wall, 1),
        "final_rows": table.read(spark).count(),
    }


def run_mor_replay(spark, n_events: int, n_epochs: int, workdir: str) -> dict:
    """Merge-on-read ingest at the SAME epoch count as the CoW
    headline — the apples-to-apples throughput comparison."""
    import shutil

    log, spec = bench_changelog(n_events)
    shutil.rmtree(workdir, ignore_errors=True)
    table = SnapshotTable.create(workdir, n_buckets=max(32, CPUS))
    eng = CdcEngine(spark, log, table, lsn_budget=1, write_mode="mor")
    _ = eng.extents
    eng.lsn_budget = eng.budget_for_epochs(n_epochs)
    t0 = time.monotonic()
    final_epoch = eng.run_to_completion()
    wall = time.monotonic() - t0
    lin = table.lineage_df(spark).toPandas()
    applied = int(lin.n_events.sum())
    return {
        "wall_sec": round(wall, 3),
        "epochs": int(final_epoch),
        "events_applied": applied,
        "events_per_sec": round(applied / wall, 1),
        "final_rows": table.read(spark).count(),
    }


def run_multi_replay(spark, n_events: int, n_epochs: int, workdir: str) -> dict:
    """Instance-level throughput (r5): the SAME changelog replayed
    through MultiTableEngine into two routed tables (src[0-4] /
    src[5-9] — disjoint halves, together covering every event) under
    the shared atomic group epoch. Comparable to cdc_replay: same
    source events consumed, but the work is one shared watermark pass
    + two per-route filtered apply pipelines + N+1 commits."""
    import shutil

    from canal_spark.multi import MultiTableEngine, TableRoute

    log, _spec = bench_changelog(n_events)
    shutil.rmtree(workdir, ignore_errors=True)
    routes = [
        TableRoute(
            "low",
            SnapshotTable.create(f"{workdir}/low", n_buckets=max(32, CPUS)),
            source_whitelist="src[0-4]",
        ),
        TableRoute(
            "high",
            SnapshotTable.create(f"{workdir}/high", n_buckets=max(32, CPUS)),
            source_whitelist="src[5-9]",
        ),
    ]
    eng = MultiTableEngine(spark, log, routes, f"{workdir}/grp", lsn_budget=1)
    ext = eng.extents  # planning scan outside the timed window
    eng.lsn_budget = max(1, (max(ext.values()) + n_epochs) // n_epochs)
    t0 = time.monotonic()
    final = eng.run_to_completion()
    wall = time.monotonic() - t0
    applied = sum(
        int(r.table.lineage_df(spark).toPandas().n_events.sum()) for r in routes
    )
    return {
        "wall_sec": round(wall, 3),
        "group_epochs": int(final),
        "events_applied": applied,
        "events_per_sec": round(applied / wall, 1),
        "rows": {r.name: r.table.read(spark).count() for r in routes},
    }


def run_stream_replay(spark, n_events: int, n_epochs: int, workdir: str) -> dict:
    """The same north-rule job through the Structured-Streaming
    front-end (file tail -> foreachBatch -> the same LWW/MERGE
    kernel), sized to the SAME epoch count as cdc_replay: quantifies
    what exactly-once-from-a-stream costs over the batch engine
    (durable pending-store write + availableNow bookkeeping per
    micro-batch)."""
    import math
    import shutil

    from canal_spark.streaming.stream import StreamingUpsert

    log, spec = bench_changelog(n_events)
    shutil.rmtree(workdir, ignore_errors=True)
    table = SnapshotTable.create(f"{workdir}/table", n_buckets=max(32, CPUS))
    su = StreamingUpsert(spark, table)
    per_trigger = math.ceil(spec.n_partitions / n_epochs)
    t0 = time.monotonic()
    q = su.start(log, f"{workdir}/ckpt", max_files_per_trigger=per_trigger)
    q.awaitTermination()
    wall = time.monotonic() - t0
    lin = table.lineage_df(spark).toPandas()
    applied = int(lin.n_events.sum())
    return {
        "wall_sec": round(wall, 3),
        "epochs": int(table.current_epoch()),
        "events_applied": applied,
        "events_per_sec": round(applied / wall, 1),
        "final_rows": table.read(spark).count(),
    }


def run_update_heavy(spark, n_events: int, n_update_epochs: int, workdir: str) -> dict:
    """The regime merge-on-read exists for: a LARGE seeded table takes
    a stream of SMALL update epochs. CoW rewrites every touched bucket
    per epoch (write amplification ~ table_rows / delta_rows); MoR
    appends O(delta) fragments. Seeds ~90% of the log as one bulk
    epoch (untimed), then times the remaining tail applied as
    `n_update_epochs` epochs for each mode; for MoR also times
    compact_files and the table scan before/after compaction — the
    operational payoff of the maintenance command.

    Uses a KEY-DENSE changelog (one key per ~2 events instead of the
    headline's ~80): the table must be much larger than each update
    delta for write amplification to be the cost being measured —
    with the headline's hot-key spec the whole table is smaller than
    one epoch's scan and both modes just pay fixed costs."""
    import shutil

    spec = ChangelogSpec(
        n_events=n_events, n_partitions=32, n_keys=max(1000, n_events // 2), seed=43
    )
    log = f"{WORK_ROOT}/bench_log_dense_{n_events}"
    if not os.path.exists(os.path.join(log, "part-p0000.parquet")):
        generate_changelog(log, spec)
    out: dict = {"update_epochs": n_update_epochs, "n_keys": spec.n_keys}
    for mode in ("cow", "mor"):
        wd = f"{workdir}_{mode}"
        shutil.rmtree(wd, ignore_errors=True)
        table = SnapshotTable.create(wd, n_buckets=max(32, CPUS))
        eng = CdcEngine(spark, log, table, lsn_budget=1, write_mode=mode)
        ext = eng.extents
        eng.lsn_budget = int(0.9 * max(ext.values()))
        eng.run_epoch()  # bulk seed, untimed
        seeded = int(table.lineage_df(spark).toPandas().n_events.sum())
        eng.lsn_budget = eng.budget_for_epochs(n_update_epochs)
        t0 = time.monotonic()
        eng.run_to_completion()
        wall = time.monotonic() - t0
        applied = int(table.lineage_df(spark).toPandas().n_events.sum()) - seeded
        m = {
            "update_wall_sec": round(wall, 3),
            "update_events": applied,
            "update_events_per_sec": round(applied / wall, 1),
            "table_rows": table.read(spark).count(),
        }
        if mode == "mor":
            snap = table.snapshot()
            m["data_files_fragmented"] = sum(len(fs) for fs in snap["files"].values())

            def scan_wall() -> float:
                t = time.monotonic()
                table.read(spark).write.mode("overwrite").format("noop").save()
                return round(time.monotonic() - t, 3)

            m["scan_fragmented_sec"] = scan_wall()
            t0 = time.monotonic()
            packed = table.compact_files(spark, target_bytes=128 << 20)
            m["compact_wall_sec"] = round(time.monotonic() - t0, 3)
            m["data_files_compacted"] = sum(
                len(fs) for fs in table.snapshot()["files"].values()
            )
            m["buckets_compacted"] = len(packed)
            m["scan_compacted_sec"] = scan_wall()
        out[mode] = m
    out["mor_vs_cow_update_speedup"] = round(
        out["cow"]["update_wall_sec"] / out["mor"]["update_wall_sec"], 2
    )
    return out


def run_mv_refresh(spark, n_events: int, n_update_epochs: int, workdir: str) -> dict:
    """Incremental-MV maintenance cost in the steady state write-time
    CDF capture exists for: a LARGE seeded table (key-dense, 90% bulk,
    untimed) takes a stream of SMALL update epochs; after each epoch a
    per-group COUNT/SUM materialized aggregate refreshes. Three feeds
    on the SAME epochs:

      captured  — capture files, one O(delta) aggregate, no table scan
      diff      — snapshot diff (reads BOTH snapshots of changed buckets)
      recompute — from-scratch GROUP BY over the whole table

    All three must agree at the end (asserted) — this measures plan
    shape, not different answers."""
    import shutil

    spec = ChangelogSpec(
        n_events=n_events, n_partitions=32, n_keys=max(1000, n_events // 2), seed=43
    )
    log = f"{WORK_ROOT}/bench_log_dense_{n_events}"
    if not os.path.exists(os.path.join(log, "part-p0000.parquet")):
        generate_changelog(log, spec)
    shutil.rmtree(workdir, ignore_errors=True)
    table = SnapshotTable.create(f"{workdir}/t", n_buckets=max(32, CPUS))
    eng = CdcEngine(spark, log, table, lsn_budget=1, capture_changes=True)
    eng.lsn_budget = int(0.9 * max(eng.extents.values()))
    eng.run_epoch()  # bulk seed
    from canal_spark.operators.mv import MaterializedAggregate

    mvs = {
        "captured": MaterializedAggregate(
            table, f"{workdir}/mv_cap", feed_source="captured"
        ),
        "diff": MaterializedAggregate(table, f"{workdir}/mv_diff", feed_source="diff"),
    }
    for mv in mvs.values():
        mv.refresh(spark)  # initial build over the seed epoch, untimed
    walls = {k: 0.0 for k in (*mvs, "recompute")}
    eng.lsn_budget = eng.budget_for_epochs(n_update_epochs)
    epochs = 0
    while eng.run_epoch() is not None:
        epochs += 1
        for k, mv in mvs.items():
            t0 = time.monotonic()
            mv.refresh(spark)
            walls[k] += time.monotonic() - t0
        t0 = time.monotonic()
        scratch = (
            table.read(spark)
            .groupBy("source")
            .agg(F.count("*").alias("cnt"), F.sum("n_tok").alias("sum_value"))
            .collect()
        )
        walls["recompute"] += time.monotonic() - t0
    states = {
        k: {r["source"]: (r["cnt"], r["sum_value"]) for r in mv.read(spark).collect()}
        for k, mv in mvs.items()
    }
    states["recompute"] = {r["source"]: (r["cnt"], r["sum_value"]) for r in scratch}
    assert states["captured"] == states["diff"] == states["recompute"]
    return {
        "update_epochs": epochs,
        "table_rows": table.read(spark).count(),
        **{f"{k}_sec": round(v, 3) for k, v in walls.items()},
        "captured_vs_diff": round(walls["diff"] / walls["captured"], 2),
        "captured_vs_recompute": round(walls["recompute"] / walls["captured"], 2),
    }


def main() -> None:
    os.makedirs(WORK_ROOT, exist_ok=True)
    spark = get_spark(
        app="canal_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf={
            "spark.local.dir": f"{WORK_ROOT}/spark-local",
            "spark.driver.memory": "24g",
            "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
            "spark.cleaner.periodicGC.interval": "15s",
        },
    )
    queries: dict[str, float] = {}

    warmup(spark)
    # floor 6 for the flagship: the same-session r2/r4 control pair
    # showed the tiered-JIT plateau lands around run 4-5 in a fresh
    # JVM — a floor of 4 can stop on a local plateau two runs early
    runs = run_until_converged(
        lambda: run_cdc_replay(spark, N_EVENTS, N_EPOCHS, f"{WORK_ROOT}/bench_table"),
        min_runs=max(N_RUNS, 6),
        max_runs=N_RUNS_MAX,
        wall_of=lambda r: r["wall_sec"],
    )
    replay = max(runs, key=lambda r: r["events_per_sec"])
    replay["all_runs_wall_sec"] = [r["wall_sec"] for r in runs]
    queries["cdc_replay"] = replay["wall_sec"]

    mor_runs = run_until_converged(
        lambda: run_mor_replay(spark, N_EVENTS, N_EPOCHS, f"{WORK_ROOT}/bench_mor"),
        min_runs=max(2, N_RUNS // 2),
        max_runs=N_RUNS_MAX,
        wall_of=lambda r: r["wall_sec"],
    )
    mor = max(mor_runs, key=lambda r: r["events_per_sec"])
    mor["all_runs_wall_sec"] = [r["wall_sec"] for r in mor_runs]
    queries["mor_replay"] = mor["wall_sec"]

    multi_runs = run_until_converged(
        lambda: run_multi_replay(spark, N_EVENTS, N_EPOCHS, f"{WORK_ROOT}/bench_multi"),
        min_runs=max(2, N_RUNS // 2),
        max_runs=N_RUNS_MAX,
        wall_of=lambda r: r["wall_sec"],
    )
    multi = max(multi_runs, key=lambda r: r["events_per_sec"])
    multi["all_runs_wall_sec"] = [r["wall_sec"] for r in multi_runs]
    queries["multi_replay"] = multi["wall_sec"]

    stream_runs = run_until_converged(
        lambda: run_stream_replay(spark, N_EVENTS, N_EPOCHS, f"{WORK_ROOT}/bench_stream"),
        min_runs=2,
        max_runs=max(4, N_RUNS),
        wall_of=lambda r: r["wall_sec"],
    )
    stream = max(stream_runs, key=lambda r: r["events_per_sec"])
    stream["all_runs_wall_sec"] = [r["wall_sec"] for r in stream_runs]
    queries["stream_replay"] = stream["wall_sec"]

    upd_runs = [
        run_update_heavy(spark, N_EVENTS, N_EPOCHS_UPDATE, f"{WORK_ROOT}/bench_upd")
        for _ in range(max(1, N_RUNS // 2))
    ]
    # best of N PER MODE independently (same convention as every other
    # measurement here) — never the run with the luckiest ratio
    best_cow = min((r["cow"] for r in upd_runs), key=lambda m: m["update_wall_sec"])
    best_mor = min((r["mor"] for r in upd_runs), key=lambda m: m["update_wall_sec"])
    update_heavy = {
        "update_epochs": upd_runs[0]["update_epochs"],
        "n_keys": upd_runs[0]["n_keys"],
        "cow": best_cow,
        "mor": best_mor,
        "mor_vs_cow_update_speedup": round(
            best_cow["update_wall_sec"] / best_mor["update_wall_sec"], 2
        ),
        "all_runs_speedup": [r["mor_vs_cow_update_speedup"] for r in upd_runs],
    }

    mv_runs = [
        run_mv_refresh(spark, N_EVENTS, N_EPOCHS_UPDATE, f"{WORK_ROOT}/bench_mv")
        for _ in range(max(1, N_RUNS // 2))
    ]
    mv_refresh = min(mv_runs, key=lambda r: r["captured_sec"])
    mv_refresh["all_runs_captured_sec"] = [r["captured_sec"] for r in mv_runs]
    queries["mv_refresh_captured"] = mv_refresh["captured_sec"]
    queries["mv_refresh_diff"] = mv_refresh["diff_sec"]

    simhash_series: list[float] = []
    for name in HEADLINE:
        # steady-state per-query timing: one warm-up execution at
        # sf0.001 first (same plan shape, trivial data) so the recorded
        # number measures the operator, not first-run codegen/JIT of
        # its plan — then the plateau criterion at full scale (r4: the
        # r3 union_multi_source 2.67× "regression" was a single-timed-
        # run instrument artifact; best-until-converged kills the class)
        QUERIES[name](spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()

        def timed_run(name=name):
            t0 = time.monotonic()
            QUERIES[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            return round(time.monotonic() - t0, 3)

        # dedup_simhash watch (VERDICT r4 "what's wrong" #2: 1.4x drift
        # over three rounds, code untouched): deeper convergence run +
        # the full series recorded so the next session can attribute
        # drift vs window variance
        if name == "dedup_simhash":
            series = run_until_converged(timed_run, min_runs=4, max_runs=8)
            queries[name] = min(series)
            simhash_series = series
        else:
            queries[name] = min(run_until_converged(timed_run, min_runs=2, max_runs=4))

    # refine_corpus sub-stage attribution (r5): cumulative wall at each
    # stage boundary (stages share lineage, so each timing re-runs the
    # prefix); marginal stage cost = cumulative difference. The
    # near-dup stage should reconcile against dedup_minhash_lsh (same
    # minhash aggregation dominates both).
    from canal_spark.queries import refine_corpus_stages

    stage_cum: dict[str, float] = {}
    for sname, thunk in refine_corpus_stages(spark, SF_DIR):

        def timed_stage(thunk=thunk):
            t0 = time.monotonic()
            thunk().write.mode("overwrite").format("noop").save()
            return round(time.monotonic() - t0, 3)

        stage_cum[sname] = min(run_until_converged(timed_stage, min_runs=2, max_runs=4))
    names = list(stage_cum)
    refine_stages = {
        "cumulative": stage_cum,
        "marginal": {
            n: round(stage_cum[n] - (stage_cum[names[i - 1]] if i else 0.0), 3)
            for i, n in enumerate(names)
        },
    }

    total = round(sum(queries.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc_replay": replay,
                "mor_replay": mor,
                "multi_replay": multi,
                "stream_replay": stream,
                "update_heavy": update_heavy,
                "mv_refresh": mv_refresh,
                "refine_corpus_stages": refine_stages,
                "dedup_simhash_series": simhash_series,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
