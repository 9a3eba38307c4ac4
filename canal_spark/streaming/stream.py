"""Structured Streaming front-end: the same epoch kernel under
foreachBatch (T1–T4 semantics, SURVEY.md §2.9).

Canal's pipeline is push-based (parse -> sink -> ring-buffer store ->
client ack); the streaming front-end maps it to Spark:

- the micro-batch IS the delivered batch (`getWithoutAck` analog);
- at-least-once redelivery from the source is made exactly-once by the
  table's idempotent epoch commits PLUS the recorded stream batch id
  (a replayed foreachBatch with an already-committed batch id is a
  no-op) — canal's ack/rollback protocol
  [C: server/.../CanalServerWithEmbedded.java :: #ack/#rollback];
- events past the last commit marker of their transaction cannot be
  re-read from a stream (unlike the batch engine, which re-slices the
  durable log), so the barrier writes them to a durable **pending
  store** inside the table directory, committed atomically with the
  epoch, and prepends them to the next batch — canal's
  EventTransactionBuffer [C: parse/.../EventTransactionBuffer.java],
  made durable;
- stale/duplicate events at or below the committed per-partition
  offset are dropped (offset high-watermark filter, T5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators import filters
from canal_spark.operators.lww import lww_collapse
from canal_spark.operators.merge import merge_epoch
from canal_spark.operators.txn import committed_watermarks, tx_barrier
from canal_spark.plans.table import SnapshotTable
from canal_spark.sources.changelog import CHANGELOG_DDL

PAYLOAD_COLS = ("op", "tokens", "n_tok", "source")


class StreamingUpsert:
    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        xa_mode: bool = False,
        sinks: tuple = (),
        write_mode: str = "cow",
    ):
        self.spark = spark
        self.table = table
        self.xa_mode = xa_mode
        #: same OuterAdapter fan-out contract as CdcEngine.sinks
        self.sinks = tuple(sinks)
        #: same semantics as CdcEngine.write_mode: "mor" appends the
        #: micro-batch delta as O(delta) fragments (the low-latency
        #: choice for a stream — commit time no longer scales with
        #: touched-bucket size) and defers merging to readers +
        #: compact_files; "cow" keeps resolution-free scans
        if write_mode not in ("cow", "mor"):
            raise ValueError(f"write_mode must be 'cow' or 'mor', got {write_mode!r}")
        self.write_mode = write_mode

    # ------------------------------------------------------------ batch
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """One micro-batch -> one commit epoch. Idempotent under
        foreachBatch redelivery. Returns True if a commit happened."""
        snap = self.table.snapshot()
        last_batch = snap.get("meta", {}).get("stream_batch_id", -1)
        if batch_id <= last_batch:
            return False  # redelivered batch: already committed

        epoch = snap["epoch"] + 1
        ckpts = self.table.checkpoints()

        pending = self.table.read_pending(self.spark)
        inp = batch_df.unionByName(pending) if pending is not None else batch_df

        # offset high-watermark: drop events already applied (stale
        # redelivery across restarts)
        if ckpts:
            committed_map = F.create_map(
                *[F.lit(x) for kv in ckpts.items() for x in kv]
            )
            inp = inp.filter(
                F.col("lsn")
                > F.coalesce(committed_map[F.col("source_partition")], F.lit(-1))
            )

        wms = committed_watermarks(inp, floors=ckpts)
        complete = tx_barrier(inp, wms)
        if self.xa_mode:
            from canal_spark.operators.txn import drop_rolled_back

            complete = drop_rolled_back(complete)
        apply_df = filters.op_filter(complete)

        # durable pending store: events past their partition's watermark
        wm_map = F.create_map(*[F.lit(x) for kv in wms.items() for x in kv]) if wms else None
        held = (
            inp.filter(F.col("lsn") > F.coalesce(wm_map[F.col("source_partition")], F.lit(-1)))
            if wm_map is not None
            else inp
        )
        # NOT inside the epoch data dir — merge_epoch overwrites that dir.
        # Partitioned by source stream (not coalesce(1)): a burst of
        # incomplete transactions writes in parallel, one task per
        # source partition (AQE merges the usual near-empty tail).
        pending_dir = os.path.join(self.table.root, "pending", f"epoch={epoch}")
        held.repartition(F.col("source_partition")).write.mode("overwrite").parquet(
            pending_dir
        )
        pending_files = [
            os.path.join(pending_dir, f)
            for f in os.listdir(pending_dir)
            if f.endswith(".parquet")
        ]

        lineage_rows = (
            apply_df.groupBy("source_partition")
            .agg(F.count("*").alias("n_events"), F.max("lsn").alias("max_lsn"))
            .collect()
        )
        delta = lww_collapse(apply_df, key="doc_id", payload_cols=PAYLOAD_COLS, with_seq=True)
        if self.write_mode == "mor":
            from canal_spark.operators.merge import append_epoch

            rewritten = append_epoch(self.spark, self.table, delta, epoch)
        else:
            rewritten = merge_epoch(self.spark, self.table, delta, epoch)
        for sink in self.sinks:
            sink.apply(self.spark, delta, epoch)
        lineage = [
            {
                "epoch": epoch,
                "source_partition": int(r["source_partition"]),
                "n_events": int(r["n_events"]),
                "n_upserts": None,
                "n_deletes": None,
                "sum_n_tok": None,
                "min_lsn": None,
                "max_lsn": int(r["max_lsn"]),
                "max_ts": None,
                "wall_ms": None,
            }
            for r in lineage_rows
        ]
        return self.table.commit(
            epoch,
            rewritten,
            wms,
            lineage,
            pending=pending_files,
            meta={"stream_batch_id": batch_id},
            append=(self.write_mode == "mor"),
        )

    # ------------------------------------------------------------ start
    def start(
        self,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
    ):
        """Tail a directory of changelog parquet files (the file-source
        stand-in for a Kafka topic; swap `.format("kafka")` + from_json
        on a real bus — the batch kernel is unchanged)."""
        stream = (
            self.spark.readStream.schema(CHANGELOG_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


class StreamingDeduper:
    """Structured-Streaming front-end for the persistent
    `IncrementalDeduper` (axes A+B over a live stream): each
    micro-batch of arriving documents is near-dup-deduplicated against
    itself and the whole retained corpus, and the admitted documents
    land in `out_dir/batch=<id>/` as the curated corpus slice.

    Exactly-once without a separate ledger: the deduper's state_dir
    commit protocol (unique data dir + exclusive marker election) is
    keyed by the foreachBatch `batch_id`, so a redelivered micro-batch
    replays its recorded survivors idempotently instead of recomputing
    or double-appending state, and the per-batch output write is a
    deterministic overwrite of the same `batch=<id>` dir. A crash at
    ANY point (before the state marker, between state and output)
    resolves on redelivery. Spark's file source only ever redelivers
    the LAST un-checkpointed batch, which is exactly the replay case
    the deduper's out-of-order guard admits.

    State growth is bounded inline: every `compact_every` batches the
    survivor log folds into one base relation (semantically invisible,
    crash-safe), so cold resume after 10^5 micro-batches plans
    O(n_files) inputs, not O(batches)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        out_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        compact_every: int | None = 16,
        **dedup_kwargs,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.compact_every = compact_every
        self.dedup_kwargs = dedup_kwargs

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One micro-batch -> one deduper batch. Idempotent under
        foreachBatch redelivery. A FRESH deduper instance per batch
        keeps every call a cold resume — restart-safety is the
        default path, not a special case."""
        from canal_spark.operators.dedup import IncrementalDeduper

        dd = IncrementalDeduper(
            text_col=self.text_col,
            id_col=self.id_col,
            state_dir=self.state_dir,
            **self.dedup_kwargs,
        )
        survivors = dd.observe(
            batch_df.select(self.id_col, self.text_col), batch_id=int(batch_id)
        )
        # full admitted rows (all payload columns), not just ids; the
        # overwrite of a fixed batch-keyed dir makes redelivery a no-op
        batch_df.join(survivors, self.id_col, "left_semi").write.mode(
            "overwrite"
        ).parquet(os.path.join(self.out_dir, f"batch={int(batch_id)}"))
        if self.compact_every and (int(batch_id) + 1) % self.compact_every == 0:
            dd.compact_state(self.spark)

    def start(
        self,
        source_dir: str,
        checkpoint_dir: str,
        schema_ddl: str,
        max_files_per_trigger: int = 1,
    ):
        """Tail a directory of document parquet files (file-source
        stand-in for a bus topic, exactly as StreamingUpsert.start)."""
        stream = (
            self.spark.readStream.schema(schema_ddl)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def admitted(self, spark: SparkSession, schema_ddl: str | None = None) -> DataFrame:
        """All admitted documents so far, tagged with the micro-batch
        that admitted them (`admitted_batch`, from the dir key)."""
        reader = spark.read.option("basePath", self.out_dir)
        if schema_ddl is not None:
            reader = reader.schema(schema_ddl + ", batch long")
        df = reader.parquet(os.path.join(self.out_dir, "batch=*"))
        return df.withColumn(
            "admitted_batch", F.col("batch").cast("int")
        ).drop("batch")
