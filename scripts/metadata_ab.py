"""A/B for delta-form snapshot manifests: per-epoch metadata bytes
written on a many-bucket table under small epochs, delta encoding vs
forced materialization (MATERIALIZE_EVERY=1).

Usage: python scripts/metadata_ab.py [n_buckets] [n_epochs]
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

WORK = "/dev/shm/canal/metadata_ab" if os.path.isdir("/dev/shm") else "/tmp/canal/metadata_ab"


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


def run(spark, n_buckets, n_epochs, materialize_every):
    root = f"{WORK}/t_{materialize_every}"
    shutil.rmtree(root, ignore_errors=True)
    old = SnapshotTable.MATERIALIZE_EVERY
    SnapshotTable.MATERIALIZE_EVERY = materialize_every
    try:
        table = SnapshotTable.create(root, n_buckets=n_buckets)
        table.commit(1, merge_epoch(spark, table, delta(spark, 0, 100_000, 0), 1), {}, [])
        t0 = time.monotonic()
        for i in range(n_epochs):
            e = table.current_epoch() + 1
            files = append_epoch(spark, table, delta(spark, 100_000 + 50 * i, 50, 10_000 * e), e)
            table.commit(e, files, {}, [], append=True)
        wall = time.monotonic() - t0
        sizes = [
            os.path.getsize(table._snap_path(e))
            for e in range(2, table.current_epoch() + 1)
        ]
        return {
            "bytes_per_epoch": round(sum(sizes) / len(sizes)),
            "epoch_loop_wall_sec": round(wall, 2),
        }
    finally:
        SnapshotTable.MATERIALIZE_EVERY = old


def main():
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark(app="metadata_ab", master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.local.dir": f"{WORK}/spark-local"})
    run(spark, 256, 10, 1)  # untimed warmup: JIT the append/commit path
    deltas = run(spark, n_buckets, n_epochs, SnapshotTable.MATERIALIZE_EVERY)
    forced = run(spark, n_buckets, n_epochs, 1)
    print(json.dumps({
        "n_buckets": n_buckets, "n_epochs": n_epochs,
        "delta_form": deltas, "materialized_every_epoch": forced,
        "metadata_reduction": round(
            forced["bytes_per_epoch"] / deltas["bytes_per_epoch"], 1),
    }))


if __name__ == "__main__":
    main()
