"""Key-partitioned MERGE apply (J2) — bucket-pruned copy-on-write upsert.

Reference semantics: canal's RDB adapter applies the change stream to a
JDBC target by primary key — INSERT, UPDATE-by-pk, DELETE-by-pk,
batched, serialized per pk-hash bucket
[C: client-adapter/rdb/.../RdbSyncService.java :: #sync/#update/#delete].

Spark-first design (scale-critical):

1. The delta is already LWW-collapsed to one row per key (lww.py), so
   MERGE degenerates to: `new_bucket = (old_bucket ANTI-JOIN changed
   keys) UNION (non-delete delta rows)` — one equi-join, one union.
2. **Bucket pruning**: the target is hash-bucketed by key
   (table.py). Only buckets containing changed keys are read and
   rewritten; every other bucket's files carry forward by reference in
   the manifest. Epoch cost is O(touched data), not O(table) — at
   100 TB with bounded epochs this is the whole ballgame.
3. The anti-join joins on (bucket, doc_id): both sides are already
   hashed by the same key function, and the delta side (bounded by the
   epoch planner's budget) is **broadcast** when small, eliminating the
   shuffle of the large target side entirely.
4. Schema evolution: upsert rows are aligned to the table's CURRENT
   schema by Iceberg-style field id (changelog field -> current column
   name/type), so renames/widenings need no data rewrite and added
   columns materialize as typed NULLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.plans.table import SnapshotTable, bucket_expr

#: field ids of the changelog payload columns (matches DEFAULT_SCHEMA ids)
CHANGELOG_FIELD_IDS = {1: "doc_id", 2: "tokens", 3: "n_tok", 4: "source"}


def align_to_schema(delta: DataFrame, schema_fields: list[dict]) -> DataFrame:
    """Project changelog payload columns onto the table's current schema
    by field id (rename/widen/add handled declaratively)."""
    cols = []
    for fld in schema_fields:
        src = CHANGELOG_FIELD_IDS.get(fld["id"])
        if src is not None and src in delta.columns:
            cols.append(F.col(src).cast(fld["type"]).alias(fld["name"]))
        else:
            cols.append(F.lit(None).cast(fld["type"]).alias(fld["name"]))
    return delta.select(*cols, "bucket")


def merge_epoch(
    spark: SparkSession,
    table: SnapshotTable,
    delta: DataFrame,
    epoch: int,
    broadcast_delta: bool = True,
) -> dict[int, list[str]]:
    """Write epoch `e`'s rewritten buckets; return {bucket: [files]}.

    `delta` must be LWW-collapsed (unique doc_id) with an `op` column;
    rows with op == 'DELETE' are tombstones. Does NOT commit — the
    caller commits the returned file map atomically (engine.py), so a
    crash here leaves only unreferenced orphan files.
    """
    snap = table.snapshot()
    n_buckets = snap["n_buckets"]
    key = snap["key_col"]
    fields = snap["schemas"][str(snap["schema_ver"])]

    # the collapsed delta is consumed three times (bucket discovery,
    # anti-join keys, upserts) — persist it so the upstream LWW
    # aggregation runs exactly once per epoch
    delta = delta.withColumn("bucket", bucket_expr(key, n_buckets)).persist()
    # driver-side metadata, bounded by n_buckets — never by data size
    affected = sorted(
        r["bucket"] for r in delta.select("bucket").distinct().collect()
    )
    if not affected:
        delta.unpersist()
        return {}

    old = table.read(spark, buckets=affected)
    changed_keys = delta.select("bucket", key)
    upserts = align_to_schema(delta.filter(F.col("op") != "DELETE"), fields)
    if broadcast_delta:
        changed_keys = F.broadcast(changed_keys)

    survivors = old.join(changed_keys, ["bucket", key], "left_anti")
    new_state = survivors.unionByName(upserts)

    out_dir = table.epoch_data_dir(epoch)
    (
        new_state.repartition(len(affected), "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    delta.unpersist()
    files = table.list_epoch_files(epoch)
    # an affected bucket can end up empty (all rows deleted) -> []
    return {b: files.get(b, []) for b in affected}
