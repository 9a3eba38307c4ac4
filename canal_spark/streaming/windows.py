"""Event-time windowed aggregation with watermark-based late-data
handling over the change stream.

Canal itself has no event-time windowing (binlog order is its clock —
SURVEY.md §2.9 T5); this is the standard Structured Streaming surface a
consumer of the change feed needs for freshness/throughput monitoring:
tumbling per-window change counts by op, tolerating bounded
out-of-orderness, with state eviction driven by the watermark (bounded
memory at 100 TB: state is O(windows-in-flight × ops), not O(events)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_counts(
    changes: DataFrame,
    window_duration: str = "1 minute",
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """Streaming DataFrame -> tumbling event-time window counts per op.

    - `withWatermark(ts, late_threshold)`: events later than the
      threshold behind the max seen ts are dropped and their windows
      finalized (append output) — bounded state.
    - works identically on a batch frame (watermark is a no-op there),
      which is how the unit test cross-checks the aggregation logic.
    """
    return (
        changes.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", window_duration).alias("win"), "op")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("doc_id").alias("n_keys_approx"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "op",
            "n_events",
            "n_keys_approx",
        )
    )
