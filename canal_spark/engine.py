"""The replay engine: changelog -> filter -> tx barrier -> LWW -> MERGE
-> atomic epoch commit. One epoch == one canal get/ack cycle.

Pipeline per epoch e (SURVEY.md §3.1 mapped to Spark):

    plan_epoch(checkpoints)                  # position seek
    -> read_slice                            # binlog dump analog
    -> whitelist/blacklist (optional)        # F1/F2 pre-filters
    -> committed_watermarks + tx_barrier     # TRANSACTIONEND buffering
    -> drop heartbeats, op filter            # F4/F5
    -> lineage metrics                       # A4 (per-partition, collected)
    -> lww_collapse                          # A1 (map-side partial agg)
    -> merge_epoch                           # J2 (bucket-pruned CoW)
    -> table.commit(e, files, checkpoints, lineage)   # atomic; idempotent

Exactly-once: the commit is a single atomic manifest rename carrying
data-file list + per-partition offsets + lineage; a re-run of a
committed epoch is a no-op, a crash before commit leaves only orphan
files. Resumability: a fresh engine on the same table directory resumes
from the committed checkpoints (canal's cursor).

Epoch budget growth: if a transaction is larger than the lsn budget the
watermark cannot advance; the engine doubles the slice until either a
commit marker lands inside it or the partition's extent is reached
(a trailing incomplete transaction is never applied — matching the
reference's "only complete transactions are delivered").
"""

from __future__ import annotations

import datetime as _dt
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from canal_spark.operators import filters
from canal_spark.operators.lww import lww_collapse
from canal_spark.operators.merge import merge_epoch
from canal_spark.operators.txn import committed_watermarks, tx_barrier
from canal_spark.plans.epoch import partition_extents, plan_epoch, read_slice
from canal_spark.plans.table import SnapshotTable

PAYLOAD_COLS = ("op", "tokens", "n_tok", "source")


@dataclass
class EpochResult:
    epoch: int
    committed: bool
    n_events: int
    checkpoints: dict[int, int]


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        changelog_path: str,
        table: SnapshotTable,
        lsn_budget: int = 1_000_000,
        source_whitelist: str | None = None,
        source_blacklist: str | None = None,
        broadcast_threshold_rows: int = 4_000_000,
    ):
        self.spark = spark
        self.changelog_path = changelog_path
        self.table = table
        self.lsn_budget = lsn_budget
        self.source_whitelist = source_whitelist
        self.source_blacklist = source_blacklist
        # the winner/delta joins broadcast when the epoch's distinct-key
        # count is modest (no shuffle OR sort of the wide event stream —
        # measured much faster), and fall back to shuffled hash joins
        # when the key set would make the driver-side broadcast build
        # (which is serial) the bottleneck or an OOM risk.
        self.broadcast_threshold_rows = broadcast_threshold_rows
        self._extents: dict[int, int] | None = None

    # ------------------------------------------------------------ plan
    @property
    def extents(self) -> dict[int, int]:
        if self._extents is None:
            self._extents = partition_extents(self.spark, self.changelog_path)
        return self._extents

    def _slice(self, bounds: dict[int, tuple[int, int]]):
        df = read_slice(self.spark, self.changelog_path, bounds)
        if self.source_whitelist:
            df = filters.whitelist(df, self.source_whitelist)
        if self.source_blacklist:
            df = filters.blacklist(df, self.source_blacklist)
        return df

    # ------------------------------------------------------------- run
    def run_epoch(self) -> EpochResult | None:
        """Run the next epoch. Returns None when the changelog is fully
        consumed (no committable events remain past any checkpoint)."""
        epoch = (self.table.current_epoch() or 0) + 1
        ckpts = self.table.checkpoints()
        bounds = plan_epoch(ckpts, self.extents, self.lsn_budget)
        if bounds is None:
            return None

        # NOTE: the slice is deliberately NOT cached — it is consumed by
        # a handful of aggregations/joins that each re-scan the pruned
        # parquet range (vectorized, row-group-pruned, scales with
        # cores). Building a columnar cache of the wide token arrays
        # costs more heap + wall time than the re-scans (measured).
        floors = {p: f for p, (f, _) in bounds.items()}
        budget = self.lsn_budget
        while True:
            sl = self._slice(bounds)
            wms = committed_watermarks(sl, floors)
            progressed = any(wms[p] > floors[p] for p in bounds)
            at_extent = all(t >= self.extents[p] for p, (_, t) in bounds.items())
            if progressed or at_extent:
                break
            # a tx larger than the budget: grow the slice (deterministic)
            budget *= 2
            bounds = {p: (f, min(f + budget, self.extents[p])) for p, (f, _) in bounds.items()}

        if not any(wms[p] > floors[p] for p in bounds):
            # only a trailing incomplete tx remains anywhere -> done
            return None

        t0 = time.monotonic()
        apply_df = filters.op_filter(tx_barrier(sl, wms))
        # rollup: per-partition lineage rows PLUS the grand-total row
        # (source_partition NULL) in one scan — the total's
        # approx_count_distinct is the epoch's true key cardinality
        all_rows = (
            apply_df.rollup("source_partition")
            .agg(
                F.count("*").alias("n_events"),
                F.sum((F.col("op") != "DELETE").cast("long")).alias("n_upserts"),
                F.sum((F.col("op") == "DELETE").cast("long")).alias("n_deletes"),
                F.coalesce(F.sum("n_tok"), F.lit(0)).alias("sum_n_tok"),
                F.min("lsn").alias("min_lsn"),
                F.max("lsn").alias("max_lsn"),
                F.max("ts").alias("max_ts"),
                # free on this scan; drives the broadcast decision below
                F.approx_count_distinct("doc_id").alias("n_keys_approx"),
            )
            .collect()
        )
        lineage_rows = [r for r in all_rows if r["source_partition"] is not None]
        totals = [r for r in all_rows if r["source_partition"] is None]
        keys_est = int(totals[0]["n_keys_approx"]) if totals else 0
        small = keys_est <= self.broadcast_threshold_rows
        delta = lww_collapse(
            apply_df,
            key="doc_id",
            payload_cols=PAYLOAD_COLS,
            broadcast_winners=small,
            with_seq=True,
        )
        rewritten = merge_epoch(
            self.spark, self.table, delta, epoch, broadcast_delta=small
        )

        wall_ms = int((time.monotonic() - t0) * 1000)
        lineage = [
            {
                "epoch": epoch,
                "source_partition": int(r["source_partition"]),
                "n_events": int(r["n_events"]),
                "n_upserts": int(r["n_upserts"] or 0),
                "n_deletes": int(r["n_deletes"] or 0),
                "sum_n_tok": int(r["sum_n_tok"] or 0),
                "min_lsn": int(r["min_lsn"]),
                "max_lsn": int(r["max_lsn"]),
                "max_ts": int(
                    r["max_ts"].replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6
                ),
                "wall_ms": wall_ms,
            }
            for r in lineage_rows
        ]
        n_events = sum(li["n_events"] for li in lineage)
        committed = self.table.commit(epoch, rewritten, wms, lineage)
        return EpochResult(epoch, committed, n_events, wms)

    def run_to_completion(self, max_epochs: int = 10_000) -> int:
        """Replay the whole changelog; returns the final epoch number."""
        for _ in range(max_epochs):
            if self.run_epoch() is None:
                break
        return self.table.current_epoch() or 0

    # -------------------------------------------------------- evolution
    def apply_schema_update(self, kind: str, payload: dict) -> int:
        """Apply one DDL event as its OWN commit epoch (ddlIsolation —
        canal isolates DDL from surrounding DML batches). Metadata-only:
        no data files are rewritten (field-id mapping at read time).

        kinds: ADD_COLUMN {name,type} | RENAME_COLUMN {from,to} |
               WIDEN_TYPE {name,to}  (SURVEY.md §2 X3 / FIXTURES.md A3)
        """
        snap = self.table.snapshot()
        fields = [dict(f) for f in snap["schemas"][str(snap["schema_ver"])]]
        if kind == "ADD_COLUMN":
            nid = max(f["id"] for f in fields) + 1
            fields.append({"id": nid, "name": payload["name"], "type": payload["type"]})
        elif kind == "RENAME_COLUMN":
            _field(fields, payload["from"])["name"] = payload["to"]
        elif kind == "WIDEN_TYPE":
            fld = _field(fields, payload["name"])
            _check_widening(fld["type"], payload["to"])
            fld["type"] = payload["to"]
        else:
            raise ValueError(f"unknown DDL kind: {kind}")
        epoch = (self.table.current_epoch() or 0) + 1
        self.table.commit(
            epoch,
            rewritten={},
            checkpoints={},
            lineage=[],
            schema_update={"ver": snap["schema_ver"] + 1, "fields": fields},
        )
        return epoch


_WIDENINGS = {
    ("int", "bigint"),
    ("int", "long"),
    ("float", "double"),
    ("array<int>", "array<bigint>"),
    ("array<int>", "array<long>"),
}


def _field(fields: list[dict], name: str) -> dict:
    for f in fields:
        if f["name"] == name:
            return f
    raise ValueError(f"no such column: {name!r} (have {[f['name'] for f in fields]})")


def _check_widening(frm: str, to: str) -> None:
    if (frm, to) not in _WIDENINGS:
        raise ValueError(f"illegal type change {frm} -> {to} (widenings only)")
