"""Incrementally-maintained materialized aggregate over a SnapshotTable.

The table-as-a-source consumer the CDF exists for: a grouped aggregate
(COUNT(*) + SUM(value) per group) kept in sync with the table by
applying `read_changes(last, now, with_before=True)` deltas — never
rescanning the table after epoch 0. This is the classic incremental
view-maintenance algebra for distributive aggregates (SUM/COUNT):

    INSERT  -> +after      (group_after  gains the new contribution)
    DELETE  -> -before     (group_before retracts the old one)
    UPDATE  -> -before, +after   (two contributions; handles the row
               MIGRATING groups when the group column itself changed)

Reference semantics: canal's FlatMessage carries `old` (the update
before-image) precisely so downstream stores can retract
[C: protocol/.../FlatMessage.java :: old]; Delta CDF's
update_preimage/postimage rows serve the same algebra.

Scale shape at 10^10 rows: a refresh touches O(changed buckets) data
(read_changes prunes to buckets whose manifest file lists differ), the
contribution union is a projection over that delta, and the only
shuffle is a hash aggregate keyed on the GROUP column — cardinality of
the group domain, not of the table. State is a tiny parquet table
(one row per group) committed with the same write-then-rename pointer
discipline as the table's own manifests, so refresh is crash-safe and
idempotent (re-running at the same table epoch is a no-op).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.plans.table import SnapshotTable


class MaterializedAggregate:
    """`SELECT <group_col>, COUNT(*) AS cnt, SUM(<value_col>) AS
    sum_value FROM table GROUP BY <group_col>`, maintained
    incrementally from the table's change feed.

    State layout under `state_dir`:
        state-e<epoch>-<uuid>/   parquet: (group_col, cnt, sum_value)
        CURRENT.json             {"epoch": e, "path": "state-e..."}
    The pointer write is atomic (tmp + rename); a crash between the
    parquet write and the pointer leaves an orphan state dir that the
    next refresh ignores (and overwrites logically).
    """

    def __init__(
        self,
        table: SnapshotTable,
        state_dir: str,
        group_col: str = "source",
        value_col: str = "n_tok",
        feed_source: str = "auto",
    ):
        #: `feed_source` passes through to read_changes: "auto" uses
        #: write-time capture files when the range has them (O(delta)
        #: refresh, no table scan — see CdcEngine(capture_changes)),
        #: falling back to the snapshot diff; "diff"/"captured" force.
        self.table = table
        self.state_dir = state_dir
        self.group_col = group_col
        self.value_col = value_col
        self.feed_source = feed_source
        os.makedirs(state_dir, exist_ok=True)

    # ------------------------------------------------------------ state
    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.state_dir, "CURRENT.json")

    def _pointer(self) -> dict | None:
        try:
            with open(self._pointer_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def current_epoch(self) -> int | None:
        """Table epoch the materialized state reflects (None = never
        refreshed: logically the empty epoch-0 table)."""
        p = self._pointer()
        return None if p is None else int(p["epoch"])

    def read(self, spark: SparkSession) -> DataFrame:
        """The materialized aggregate as of the last refresh."""
        p = self._pointer()
        if p is None:
            snap = self.table.snapshot()
            gtype = next(
                f["type"]
                for f in snap["schemas"][str(snap["schema_ver"])]
                if f["name"] == self.group_col
            )
            return spark.createDataFrame(
                [], f"{self.group_col} {gtype}, cnt bigint, sum_value bigint"
            )
        return spark.read.parquet(os.path.join(self.state_dir, p["path"]))

    # ---------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> int | None:
        """Advance the aggregate to the table's current epoch by
        applying the net change feed since the last refresh. Returns
        the new epoch, or None when already current (including
        change-free epochs: compaction/rebucket emit an empty feed, the
        state parquet is republished under the new epoch so resume
        stays monotonic).

        Exactly-once: the state pointer is the ledger. Re-running after
        a crash (pointer not advanced) recomputes the SAME delta from
        the SAME two durable snapshots and republishes — read_changes
        is a pure function of (from_epoch, to_epoch)."""
        now = self.table.current_epoch()
        if now is None:
            return None
        last = self.current_epoch()
        if last is not None and last >= now:
            return None
        g, v = self.group_col, self.value_col

        # RAW capture fast path (r6): per-epoch capture rows compose
        # under the additive +after/−before algebra without the net
        # collapse's per-key shuffle of full-width payload structs —
        # see SnapshotTable.read_changes_raw. TOUCH rows carry NULLs
        # on both sides and are excluded by the op filters.
        changes = (
            self.table.read_changes_raw(
                spark, last if last is not None else 0, now
            )
            if self.feed_source in ("auto", "captured")
            else None
        )
        if changes is None:
            changes = self.table.read_changes(
                spark,
                last if last is not None else 0,
                now,
                with_before=True,
                source=self.feed_source,
            )
        gain_ops, retract_ops = ("INSERT", "UPDATE"), ("UPDATE", "DELETE")
        gains = changes.filter(F.col("op").isin(*gain_ops)).select(
            F.col(g).alias(g),
            F.lit(1).cast("long").alias("cnt"),
            F.coalesce(F.col(v).cast("long"), F.lit(0)).alias("sum_value"),
        )
        retracts = changes.filter(F.col("op").isin(*retract_ops)).select(
            F.col(f"before_{g}").alias(g),
            F.lit(-1).cast("long").alias("cnt"),
            (-F.coalesce(F.col(f"before_{v}").cast("long"), F.lit(0))).alias(
                "sum_value"
            ),
        )
        contrib = gains.unionByName(retracts).unionByName(self.read(spark))
        new_state = (
            contrib.groupBy(g)
            .agg(
                F.sum("cnt").alias("cnt"),
                F.sum("sum_value").alias("sum_value"),
            )
            # a group whose last row left keeps a cnt=0 residue row:
            # drop it so the state equals the from-scratch aggregate
            .filter(F.col("cnt") > 0)
        )

        rel = f"state-e{now}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.state_dir, rel)
        # group-domain cardinality: one file is the right layout
        new_state.coalesce(1).write.mode("overwrite").parquet(out)
        tmp = os.path.join(self.state_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump({"epoch": now, "path": rel}, f)
        os.replace(tmp, self._pointer_path)
        self._gc(keep=rel)
        return now

    def _gc(self, keep: str) -> None:
        """Drop superseded state dirs (metadata-scale: one per refresh).
        Readers race-free: the pointer moved first, and the previous
        state is kept one generation as a read grace window."""
        import shutil

        gens = sorted(
            d
            for d in os.listdir(self.state_dir)
            if d.startswith("state-e") and d != keep
        )
        for d in gens[:-1]:
            shutil.rmtree(os.path.join(self.state_dir, d), ignore_errors=True)
