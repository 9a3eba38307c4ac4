"""Transaction-boundary grouping — the complete-transaction barrier (A2).

Reference semantics: canal buffers row events until the in-band
TRANSACTIONEND marker and only then flushes the transaction as a unit
[C: parse/.../inbound/EventTransactionBuffer.java :: #add/#flush]; the
consumer cursor only ever advances to a transaction boundary.

Spark-first: within an epoch slice, a source partition's *committed
watermark* is the max `lsn` bearing a commit marker (`tx_commit`).
Because transactions are contiguous per partition and the commit marker
is a transaction's last event, `lsn <= watermark` keeps exactly the
complete transactions — one tiny aggregation plus a broadcast join,
no stateful buffering. Events past the watermark are NOT lost: the
checkpoint stays at the watermark, so the next epoch re-reads them
(canal analog: rollback/redelivery of un-acked events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def committed_watermarks(slice_df: DataFrame, floors: dict[int, int]) -> dict[int, int]:
    """Per source partition: max committed lsn within the slice, floored
    at the incoming checkpoint (no commits in slice => cursor holds).
    Returns a small dict (one entry per source partition) — this is
    driver-side metadata, bounded by partition count, never by data."""
    rows = (
        slice_df.filter(F.col("tx_commit"))
        .groupBy("source_partition")
        .agg(F.max("lsn").alias("wm"))
        .collect()
    )
    wms = dict(floors)
    for r in rows:
        wms[int(r["source_partition"])] = max(int(r["wm"]), wms.get(int(r["source_partition"]), -1))
    return wms


def drop_rolled_back(df: DataFrame) -> DataFrame:
    """XA rollback semantics: a transaction terminated by an
    `XAROLLBACK` marker is discarded wholesale — its row events must
    never reach the apply path, while the marker itself carries
    `tx_commit` so the watermark (and hence the cursor) advances past
    the aborted transaction. Canal analog: XACOMMIT/XAROLLBACK entry
    types [C: protocol/.../EntryProtocol.proto :: EntryType.TRANSACTION
    END vs XA records]; GTID marker rows need no handling here — like
    heartbeats they are positional metadata the op filter drops.

    Scale: rollbacks are rare, so the marker set is tiny and AQE plans
    the anti-join as a broadcast — no shuffle of the event stream."""
    rb = (
        df.filter(F.col("op") == "XAROLLBACK")
        .select("source_partition", "tx_id")
        .distinct()
    )
    return df.join(rb, ["source_partition", "tx_id"], "left_anti")


def tx_barrier(slice_df: DataFrame, watermarks: dict[int, int]) -> DataFrame:
    """Keep only events at or below their partition's committed
    watermark (complete transactions)."""
    if not watermarks:
        return slice_df.limit(0)
    wm_expr = F.create_map(
        *[F.lit(x) for kv in watermarks.items() for x in kv]
    )
    return slice_df.filter(
        F.col("lsn") <= F.coalesce(wm_expr[F.col("source_partition")], F.lit(-1))
    )
