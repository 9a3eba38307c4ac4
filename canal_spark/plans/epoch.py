"""Epoch planning — bounded, deterministic LSN slices per source partition.

Canal analog: the client pull loop `getWithoutAck(batchSize)` bounds
each delivered batch by item count / memory
[C: server/.../CanalServerWithEmbedded.java :: #getWithoutAck;
store/.../MemoryEventStorePutGetImpl.java :: batchMode ITEMSIZE/MEMSIZE].

Spark-first: an epoch is `(from_lsn, to_lsn]` per source partition,
a pure function of (checkpoint, lsn_budget) — deterministic, so crash
re-runs re-derive the identical slice. The slice read pushes a coarse
global lsn range into the parquet scan (row-group pruning via min/max
stats on the lsn-sorted files) and refines per partition with a tiny
literal map — no join, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_extents(spark: SparkSession, changelog_path: str) -> dict[int, int]:
    """Max lsn per source partition. One columnar scan of two columns,
    computed once per replay run (metadata-scale result: P rows)."""
    rows = (
        spark.read.parquet(changelog_path)
        .groupBy("source_partition")
        .agg(F.max("lsn").alias("mx"))
        .collect()
    )
    return {int(r["source_partition"]): int(r["mx"]) for r in rows}


def plan_epoch(
    checkpoints: dict[int, int],
    extents: dict[int, int],
    lsn_budget: int,
) -> dict[int, tuple[int, int]] | None:
    """Next epoch's (from_exclusive, to_inclusive] per partition, or
    None when every partition is exhausted."""
    bounds = {}
    for p, extent in extents.items():
        frm = checkpoints.get(p, -1)
        if frm >= extent:
            continue
        bounds[p] = (frm, min(frm + lsn_budget, extent))
    return bounds or None


def read_slice(
    spark: SparkSession, changelog_path: str, bounds: dict[int, tuple[int, int]]
) -> DataFrame:
    """Epoch slice scan: coarse pushed-down lsn range + exact
    per-partition refinement (canal's position seek,
    [C: parse/.../AbstractEventParser.java :: #findStartPosition])."""
    lo = min(b[0] for b in bounds.values())
    hi = max(b[1] for b in bounds.values())
    frm_map = F.create_map(*[F.lit(x) for p, (f, _) in bounds.items() for x in (p, f)])
    to_map = F.create_map(*[F.lit(x) for p, (_, t) in bounds.items() for x in (p, t)])
    sp = F.col("source_partition")
    return (
        spark.read.parquet(changelog_path)
        # coarse: reaches the parquet scan as PushedFilters (row-group pruning)
        .filter((F.col("lsn") > lo) & (F.col("lsn") <= hi))
        # exact: per-partition range via literal maps (metadata-size expr)
        .filter(
            (F.col("lsn") > F.coalesce(frm_map[sp], F.lit(2**62)))
            & (F.col("lsn") <= F.coalesce(to_map[sp], F.lit(-1)))
        )
    )
