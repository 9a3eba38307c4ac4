"""Key-partitioned MERGE apply (J2) — versioned, bucket-pruned
copy-on-write upsert.

Reference semantics: canal's RDB adapter applies the change stream to a
JDBC target by primary key — INSERT, UPDATE-by-pk, DELETE-by-pk,
batched, serialized per pk-hash bucket
[C: client-adapter/rdb/.../RdbSyncService.java :: #sync/#update/#delete].
Canal relies on arrival order; this engine makes the merge
ORDER-INDEPENDENT so that any slicing of the changelog (batch epochs,
per-file micro-batches, multi-source unions) converges to the same
state:

- every stored row carries `_seq` — the packed (lsn << 12 | source
  partition) of the event that produced it — and `_tombstone` for
  deletes (kept as rows so a late lower-`_seq` update cannot resurrect
  a deleted key; compaction of old tombstones is a metadata-only
  follow-up, see table.py);
- MERGE keeps, per key, the row with the greater `_seq` between the
  target and the delta: last-writer-wins by total event order, not by
  application order.

Scale shape (the broadcast never touches the big side):

    untouched = old ANTI-JOIN delta-keys      (broadcast, no shuffle)
    contested = old SEMI-JOIN delta-keys      (broadcast, <= |delta| rows)
    resolved  = contested FULL-OUTER delta    (both sides delta-sized)
    new bucket = untouched UNION resolved

Only buckets containing changed keys are read/rewritten; all other
bucket files carry forward by reference in the manifest (table.py) —
epoch cost is O(touched data), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.plans.table import META_COLS, SnapshotTable, bucket_expr

#: field ids of the changelog payload columns (matches DEFAULT_SCHEMA ids)
CHANGELOG_FIELD_IDS = {1: "doc_id", 2: "tokens", 3: "n_tok", 4: "source"}


def align_to_schema(delta: DataFrame, schema_fields: list[dict], key: str) -> DataFrame:
    """Project changelog payload columns onto the table's current schema
    by field id (rename/widen/add handled declaratively), carrying the
    merge metadata (`_seq`, `_tombstone`, bucket)."""
    cols = []
    for fld in schema_fields:
        src = CHANGELOG_FIELD_IDS.get(fld["id"])
        if fld["name"] == key:
            continue
        if src is not None and src in delta.columns:
            cols.append(F.col(src).cast(fld["type"]).alias(fld["name"]))
        else:
            cols.append(F.lit(None).cast(fld["type"]).alias(fld["name"]))
    return delta.select(
        F.col(key),
        *cols,
        F.col("_seq").cast("long").alias("_seq"),
        (F.col("op") == "DELETE").alias("_tombstone"),
        "bucket",
    )


def merge_epoch(
    spark: SparkSession,
    table: SnapshotTable,
    delta: DataFrame,
    epoch: int,
    broadcast_delta: bool = True,
) -> dict[int, list[str]]:
    """Write epoch `e`'s rewritten buckets; return {bucket: [files]}.

    `delta` must be LWW-collapsed (unique key) with `op` and `_seq`
    columns. Does NOT commit — the caller commits the returned file map
    atomically (engine.py), so a crash here leaves only unreferenced
    orphan files.
    """
    snap = table.snapshot()
    n_buckets = snap["n_buckets"]
    key = snap["key_col"]
    fields = snap["schemas"][str(snap["schema_ver"])]

    # the collapsed delta is consumed several times (bucket discovery,
    # join keys, resolve) — persist it so the upstream LWW aggregation
    # runs exactly once per epoch
    delta = align_to_schema(
        delta.withColumn("bucket", bucket_expr(key, n_buckets)), fields, key
    ).persist()
    # driver-side metadata, bounded by n_buckets — never by data size
    affected = sorted(r["bucket"] for r in delta.select("bucket").distinct().collect())
    if not affected:
        delta.unpersist()
        return {}

    old = table.read(spark, buckets=affected, internal=True)
    delta_keys = delta.select("bucket", key)
    if broadcast_delta:
        delta_keys = F.broadcast(delta_keys)

    untouched = old.join(delta_keys, ["bucket", key], "left_anti")
    contested = old.join(delta_keys, ["bucket", key], "left_semi")

    data_cols = [f["name"] for f in fields if f["name"] != key] + ["_seq", "_tombstone"]
    o, d = contested.alias("o"), delta.alias("d")
    delta_wins = F.col("d._seq") > F.coalesce(F.col("o._seq"), F.lit(-1))
    resolved = o.join(d, ["bucket", key], "full_outer").select(
        "bucket",
        key,
        *[
            F.when(delta_wins | F.col("o._seq").isNull(), F.col(f"d.{c}"))
            .otherwise(F.col(f"o.{c}"))
            .alias(c)
            for c in data_cols
        ],
    )
    # column order: key, data..., meta..., bucket (match align output)
    ordered = [key, *data_cols, "bucket"]
    new_state = untouched.select(*ordered).unionByName(resolved.select(*ordered))

    out_dir = table.epoch_data_dir(epoch)
    (
        new_state.repartition(len(affected), "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    delta.unpersist()
    files = table.list_epoch_files(epoch)
    return {b: files.get(b, []) for b in affected}


__all__ = ["merge_epoch", "align_to_schema", "CHANGELOG_FIELD_IDS", "META_COLS"]
