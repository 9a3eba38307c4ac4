"""Event filtering / projection — canal's pre-decode + sink-side filters.

Reference semantics (SURVEY.md §2.2): canal applies a regex
schema.table whitelist/blacklist BEFORE row decode (cheap pre-filter)
[C: filter/.../aviater/AviaterRegexFilter.java; parse/.../dbsync/
LogEventConvert.java :: nameFilter/nameBlackFilter], a per-table column
filter [C: LogEventConvert.java :: #filterColumn], event-type filters
[C: LogEventConvert.java :: filterQueryDml/Ddl/Dcl flags], and drops
transaction markers / heartbeats at the sink
[C: sink/.../EntryEventSink.java :: filterTransactionEntry].

Spark-first: all of these are declarative filters/projections, so
Catalyst pushes them into the parquet scan (predicate pushdown + column
pruning) — the "filter before decode" optimization comes for free and
is verified in tests via the explain plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

APPLY_OPS = ("INSERT", "UPDATE", "DELETE")


def whitelist(df: DataFrame, pattern: str, col: str = "source") -> DataFrame:
    """F1: keep events whose source matches the regex (instance filter)."""
    return df.filter(F.col(col).rlike(pattern))


def blacklist(df: DataFrame, pattern: str, col: str = "source") -> DataFrame:
    """F2: drop events whose source matches the regex (filter.black.regex)."""
    return df.filter(~F.col(col).rlike(pattern))


def field_filter(
    df: DataFrame, keep: list[str] | None = None, drop: list[str] | None = None
) -> DataFrame:
    """F3: column whitelist/blacklist (instance.filter.field)."""
    if keep is not None:
        return df.select(*keep)
    if drop:
        return df.drop(*drop)
    return df


def op_filter(df: DataFrame, ops: tuple[str, ...] = APPLY_OPS) -> DataFrame:
    """F4: keep row-change ops only (drop QUERY/DDL-class/heartbeat rows)."""
    return df.filter(F.col("op").isin(*ops))


def drop_heartbeats(df: DataFrame) -> DataFrame:
    """F5: heartbeat suppression — liveness markers advance the
    watermark (txn.py) but never reach the apply path."""
    return df.filter(F.col("op") != "HEARTBEAT")
