"""Table-to-table replication from the change feed — canal's core
use case (keep a downstream store in sync with the upstream's binlog
[C: client-adapter/rdb/.../RdbSyncService.java :: #sync]) expressed at
the table layer: a replica `SnapshotTable` is maintained purely from
the primary's `read_changes` feed, never by re-reading the changelog.

One `sync` call folds EVERY primary epoch since the last sync into ONE
replica epoch: the net feed is already LWW-collapsed per key, and LWW
application is order-independent, so applying the net of N epochs once
equals applying the N epochs one by one (the same algebra the engine's
own idempotence rests on). With write-time capture on the primary
(CdcEngine(capture_changes=True)) the feed costs O(sum of deltas) and
the replica write O(touched buckets) — a catch-up never scans the
primary.

Exactly-once: the replica commit carries `meta.replicated_from` (the
primary epoch the feed ran to); a re-run reads the watermark and
no-ops. A lost commit race (concurrent replica maintenance) replans on
the fresh replica state like every other commit path.

Scope (v1, honest): primary and replica must share the schema — sync
raises on divergence rather than guessing a field mapping; replicate
schema changes by applying the same DDL stream to both sides
(engine.apply_schema_update), then sync resumes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from canal_spark.operators.merge import merge_epoch
from canal_spark.plans.table import SnapshotTable


class TableReplicator:
    def __init__(
        self,
        primary: SnapshotTable,
        replica: SnapshotTable,
        broadcast_threshold_rows: int = 4_000_000,
    ):
        self.primary = primary
        self.replica = replica
        #: same cardinality gate as the engine's delta joins: small
        #: catch-ups broadcast, big ones shuffled-hash
        self.broadcast_threshold_rows = broadcast_threshold_rows

    @classmethod
    def create_replica(
        cls, primary: SnapshotTable, replica_root: str, n_buckets: int | None = None
    ) -> "TableReplicator":
        """Bootstrap an empty replica with the primary's CURRENT key
        and schema (bucket count may differ — replication is key-level,
        each side routes by its own layout)."""
        snap = primary.snapshot()
        replica = SnapshotTable.create(
            replica_root,
            n_buckets=n_buckets or snap["n_buckets"],
            schema=snap["schemas"][str(snap["schema_ver"])],
            key_col=snap["key_col"],
        )
        return cls(primary, replica)

    def replicated_epoch(self) -> int:
        """Primary epoch the replica reflects (0 = only the empty
        creation snapshot)."""
        return int(self.replica.snapshot().get("meta", {}).get("replicated_from", 0))

    def _rollback_target(self, epoch: int) -> int | None:
        """The restore target if primary epoch `epoch` is a rollback
        epoch, else None. Expired mid-range manifests read as None —
        keep the replica's watermark within the primary's retention
        window (same rule as time travel)."""
        try:
            m = self.primary.snapshot(epoch).get("meta", {})
        except FileNotFoundError:
            return None
        if m.get("rollback_of") == epoch - 1:
            return int(m["rollback_to"])
        return None

    def recover_from_rollback(self, spark: SparkSession) -> int | None:
        """Recovery after `sync` refused a primary rollback: rewind the
        replica to its newest retained epoch whose state precedes every
        rollback target in the unsynced range (replica.rollback_to — an
        append-only epoch, like the primary's own recovery), then sync
        forward along the restored timeline. From the safe base every
        feed `_seq` is monotone again, so plain LWW convergence holds.
        Raises if no retained replica epoch is old enough (rebuild the
        replica — its retention was shorter than the rewind)."""
        now = self.primary.current_epoch()
        last = self.replicated_epoch()
        targets = [
            t
            for e in range(last + 1, (now or 0) + 1)
            if (t := self._rollback_target(e)) is not None
        ]
        if not targets:
            return self.sync(spark)
        safe = min(targets)
        for re_ in range(self.replica.current_epoch(), -1, -1):
            try:
                s = self.replica.snapshot(re_)
            except FileNotFoundError:
                continue
            if int(s.get("meta", {}).get("replicated_from", 0)) <= safe:
                self.replica.rollback_to(re_)
                return self.sync(spark)
        raise ValueError(
            f"recover_from_rollback: no retained replica epoch at or before "
            f"primary epoch {safe} — rebuild the replica from scratch"
        )

    def sync(self, spark: SparkSession, to_epoch: int | None = None) -> int | None:
        """Advance the replica to the primary's current epoch (or
        `to_epoch`). Returns the primary epoch synced to, or None when
        already current."""
        now = self.primary.current_epoch() if to_epoch is None else to_epoch
        last = self.replicated_epoch()
        if now is None or now <= last:
            if now is not None and now < last:
                raise ValueError(
                    f"sync: replica is AHEAD of the primary ({last} > {now}) — "
                    "the primary was rolled back; roll the replica back too"
                )
            return None
        # LWW cannot absorb a primary rollback the replica is already
        # past: the restored rows carry OLDER _seq values, so the
        # replica's conditional merge rejects the "downgrade" and keeps
        # the undone state forever. Detect and refuse loudly instead of
        # silently diverging (a rollback epoch e has rollback_of == e-1
        # in its OWN meta; carried-forward copies fail that test).
        hazard = [
            t
            for e in range(last + 1, now + 1)
            if (t := self._rollback_target(e)) is not None and t < last
        ]
        if hazard:
            raise ValueError(
                f"sync: the primary rolled back to epoch {min(hazard)}, before "
                f"the replica's watermark {last} — run "
                "recover_from_rollback() to rewind the replica to a safe base"
            )
        p_snap = self.primary.snapshot(now)
        r_snap = self.replica.snapshot()
        p_fields = p_snap["schemas"][str(p_snap["schema_ver"])]
        r_fields = r_snap["schemas"][str(r_snap["schema_ver"])]
        if p_fields != r_fields:
            raise ValueError(
                "sync: primary and replica schemas diverged — apply the same "
                f"DDLs to both sides first (primary={p_fields}, replica={r_fields})"
            )

        feed = self.primary.read_changes(spark, last, now)
        n = feed.count()  # one action; O(sum of deltas) under capture
        small = n <= self.broadcast_threshold_rows
        for _attempt in range(5):
            epoch = self.replica.current_epoch() + 1
            rewritten = merge_epoch(
                spark, self.replica, feed, epoch, broadcast_delta=small,
                delta_by_name=True,
            )
            if self.replica.commit(
                epoch,
                rewritten,
                {},
                [],
                meta={"replicated_from": now, "replicated_rows": n},
            ):
                return now
            # lost the epoch number to concurrent replica maintenance:
            # nothing landed (staged files are orphans); replan
        raise RuntimeError("sync: lost the replica commit race 5 times")
