"""Last-writer-wins collapse per key (A1) — the heart of the upsert.

Reference semantics: canal preserves per-key order end-to-end through a
single-writer pipeline and per-pk-hash serial buckets in the adapter, so
the last event per primary key wins at the sink
[C: client-adapter/rdb/.../RdbSyncService.java :: #pkHash, serial
dmlsPartition[] buckets]. Canal has NO skew handling — a hot pk
serializes on one bucket; here skew is handled structurally.

Spark-first design choice (scale-critical): LWW is expressed as an
**algebraic aggregation** `max_by(payload, (lsn, source_partition))`,
NOT as a window `row_number() = 1`:

- `max_by` is a declarative aggregate, so Spark performs **map-side
  partial aggregation**: a hot doc_id with 10^6 events in an epoch
  collapses to ONE row per map task *before* the shuffle. The shuffle
  then moves O(distinct keys x tasks), not O(events). This is the
  two-stage (salted) reduction from SURVEY.md §4 — obtained from the
  engine's own partial-agg machinery rather than a hand-rolled salt.
- a window would shuffle ALL events of the hot key to one task first
  (no partial evaluation) — exactly the skew canal suffers.

The explicit salted two-stage variant is kept for comparison/tests.

Tie-break is total and deterministic: (lsn DESC, source_partition DESC)
— required for byte-exact replay parity (BASELINE.json:6); never rely
on row order out of a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDER_COLS = ("lsn", "source_partition")


def lww_collapse(
    df: DataFrame,
    key: str = "doc_id",
    order_cols: tuple[str, ...] = ORDER_COLS,
    payload_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """One row per key: the payload of the greatest (lsn, source_partition)."""
    if payload_cols is None:
        payload_cols = tuple(c for c in df.columns if c != key)
    return (
        df.groupBy(key)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload_cols]),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("_last")
        )
        .select(key, "_last.*")
    )


def lww_collapse_salted(
    df: DataFrame,
    key: str = "doc_id",
    order_cols: tuple[str, ...] = ORDER_COLS,
    payload_cols: tuple[str, ...] | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Explicit two-stage variant: per-(key, salt) partial max-by, then
    per-key final max-by. Semantically identical to `lww_collapse`
    (property-tested); useful when partial aggregation is defeated
    (e.g. a non-algebraic payload reduction)."""
    if payload_cols is None:
        payload_cols = tuple(c for c in df.columns if c != key)
    ordered = F.struct(*[F.col(c) for c in order_cols])
    stage1 = (
        df.withColumn("_salt", F.pmod(F.col(order_cols[0]), F.lit(n_salts)))
        .groupBy(key, "_salt")
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in payload_cols]), ordered).alias("_last"),
            F.max(ordered).alias("_ord"),
        )
    )
    return (
        stage1.groupBy(key)
        .agg(F.max_by(F.col("_last"), F.col("_ord")).alias("_last"))
        .select(key, "_last.*")
    )
