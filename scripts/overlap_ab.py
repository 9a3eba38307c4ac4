"""A/B for overlap-aware merge-on-read resolution (R13): an
append-mostly table (every fragment inserts a NEW key range — the
time-ordered-ingest regime) scanned WITH manifest key bounds (r4:
disjoint fragments bypass the `_seq` window) vs the same table with
bounds stripped from the manifest (r3 behavior: any fragment-bearing
bucket pays whole-bucket resolution).

Usage: python scripts/overlap_ab.py [n_base] [n_frag_epochs]
       python scripts/overlap_ab.py update [n_base]

`update` regime (r5): an UPDATE-shaped base written as key-sorted
range-disjoint slices (target_file_rows — the r5 layout) plus one
key-LOCALIZED delta fragment, scanned as-is vs with base bounds
widened to each bucket's hull (the r4 hash-slice layout, where every
compacted file spanned the bucket's whole key range and therefore
conflicted with any fragment). Reports the resolution-set shrink and
the wall-clock effect.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canal_spark.operators.merge import append_epoch, merge_epoch  # noqa: E402
from canal_spark.plans.table import SnapshotTable  # noqa: E402
from canal_spark.session import get_spark  # noqa: E402

WORK = "/dev/shm/canal/overlap_ab" if os.path.isdir("/dev/shm") else "/tmp/canal/overlap_ab"


def delta(spark, start, n, seq0):
    return (
        spark.range(start, start + n)
        .select(
            F.format_string("d%09d", F.col("id")).alias("doc_id"),
            F.array(F.col("id").cast("int")).alias("tokens"),
            F.lit(1).alias("n_tok"),
            F.lit("s0").alias("source"),
            F.lit("INSERT").alias("op"),
            (F.lit(seq0) + F.col("id")).alias("_seq"),
        )
    )


def timed_scan(spark, table, runs=4):
    walls = []
    for _ in range(runs):
        t0 = time.monotonic()
        table.read(spark).write.mode("overwrite").format("noop").save()
        walls.append(round(time.monotonic() - t0, 3))
    return walls


def resolving_files(table, spark):
    """(n_resolving, n_total) data files whose entries need `_seq`
    resolution under the current manifest bounds."""
    snap = table.snapshot()
    need = tot = 0
    for _b, fes in snap["files"].items():
        if any(fe.get("frag") for fe in fes):
            flags = SnapshotTable._resolution_set(fes)
        else:
            flags = [False] * len(fes)
        need += sum(flags)
        tot += len(fes)
    return need, tot


def update_regime(n_base: int) -> None:
    spark = get_spark(app="overlap_ab_upd", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.local.dir": f"{WORK}/spark-local"})
    shutil.rmtree(f"{WORK}/u", ignore_errors=True)
    # r5 layout: range-disjoint sorted slices per bucket
    table = SnapshotTable.create(
        f"{WORK}/u", n_buckets=32, target_file_rows=max(1, n_base // (32 * 8))
    )
    table.commit(1, merge_epoch(spark, table, delta(spark, 0, n_base, 0), 1), {}, [])
    # one key-LOCALIZED delta: updates confined to 2% of the id space
    lo = n_base // 2
    n_frag = max(1, n_base // 50)
    files = append_epoch(spark, table, delta(spark, lo, n_frag, n_base * 10), 2)
    table.commit(2, files, {}, [], append=True)

    need_a, tot = resolving_files(table, spark)
    walls_a = timed_scan(spark, table)
    rows_a = table.read(spark).count()

    # r4 hash-slice layout simulation: every base slice's bounds span
    # the bucket hull (exactly what the decorrelated hash split
    # produced), so every slice conflicts with the fragment
    snap = table.snapshot()
    for fes in snap["files"].values():
        base = [fe for fe in fes if not fe.get("frag") and "key_min" in fe]
        if base:
            hull_lo = min(fe["key_min"] for fe in base)
            hull_hi = max(fe["key_max"] for fe in base)
            for fe in base:
                fe["key_min"], fe["key_max"] = hull_lo, hull_hi
    snap["files_chain"] = 0
    with open(table._snap_path(snap["epoch"]), "w") as f:
        json.dump(snap, f)
    table._snap_cache.clear()
    need_b, _ = resolving_files(table, spark)
    walls_b = timed_scan(spark, table)
    rows_b = table.read(spark).count()
    assert rows_a == rows_b

    print(json.dumps({
        "regime": "update",
        "n_rows": rows_a,
        "n_frag_rows": n_frag,
        "r5_sorted_slices": {"resolving_files": need_a, "total_files": tot,
                             "walls": walls_a},
        "r4_hull_bounds": {"resolving_files": need_b, "walls": walls_b},
        "resolution_set_shrink": round(need_b / max(1, need_a), 2),
        "best_speedup": round(min(walls_b) / min(walls_a), 2),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "update":
        update_regime(int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000)
        return
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    per_epoch = n_base // 8
    spark = get_spark(app="overlap_ab", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.local.dir": f"{WORK}/spark-local"})
    shutil.rmtree(f"{WORK}/t", ignore_errors=True)
    table = SnapshotTable.create(f"{WORK}/t", n_buckets=32)
    table.commit(1, merge_epoch(spark, table, delta(spark, 0, n_base, 0), 1), {}, [])
    nxt = n_base
    for e in range(2, 2 + n_epochs):
        files = append_epoch(
            spark, table, delta(spark, nxt, per_epoch, nxt * 10), e
        )
        table.commit(e, files, {}, [], append=True)
        nxt += per_epoch

    plan = table.read(spark)._jdf.queryExecution().executedPlan().toString()
    with_bounds = {"walls": timed_scan(spark, table), "window_in_plan": "Window" in plan}
    rows_a = table.read(spark).count()

    # strip bounds from the CURRENT snapshot -> r3 behavior
    snap = table.snapshot()
    for fes in snap["files"].values():
        for fe in fes:
            for k in ("key_min", "key_max", "seq_min", "seq_max"):
                fe.pop(k, None)
    snap["files_chain"] = 0  # materialized rewrite
    with open(table._snap_path(snap["epoch"]), "w") as f:
        json.dump(snap, f)
    table._snap_cache.clear()  # the rewrite bypassed the memo
    plan2 = table.read(spark)._jdf.queryExecution().executedPlan().toString()
    stripped = {"walls": timed_scan(spark, table), "window_in_plan": "Window" in plan2}
    rows_b = table.read(spark).count()
    assert rows_a == rows_b == n_base + n_epochs * per_epoch

    out = {
        "n_rows": rows_a,
        "n_fragment_epochs": n_epochs,
        "with_bounds": with_bounds,
        "bounds_stripped": stripped,
        "best_speedup": round(min(stripped["walls"]) / min(with_bounds["walls"]), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
