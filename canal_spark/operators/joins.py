"""Join operators beyond plain equi-joins: as-of and range joins.

Canal has no general join engine (⊘, SURVEY.md §2.3 J3) — these are
engine-beyond-reference operators a training-data pipeline needs.

Scale notes (the point of each implementation):

- **as-of join**: the textbook formulation is an inequality join
  (left.ts >= right.ts) + argmax, which Spark plans as a broadcast
  nested loop — O(|L|·|R|) and a non-starter at 100 TB. We instead
  union both sides and take a running `last(..., ignorenulls=True)`
  over a (key, time) window: ONE shuffle on the key, linear work,
  and the window sort is per-key, not global.
- **range join**: kept equi-keyed (the range predicate rides on top of
  a key equi-join), so Catalyst plans a shuffled hash / sort-merge
  join on the key and evaluates the range as a post-filter — never a
  cartesian. For pure range joins with no equi key, bucketize the
  range into bins and equi-join on the bin (not needed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    value_cols: list[str],
    left_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value columns of the latest right
    row with right.time <= left.time for the same key (ASOF >= join).

    Both inputs must carry `key` and `time_col`. Right-side ties on
    (key, time) must be pre-deduplicated by the caller (deterministic
    winner), since "the" as-of row is otherwise ambiguous.

    Implementation: tag + union + running last() ignoring nulls over
    rows between unbounded preceding and current. Right rows sort
    BEFORE left rows at equal timestamps (kind 0 < 1) to honour the
    inclusive `>=` bound. One shuffle on `key`; no range join.

    All value columns travel as ONE struct through a single
    last(ignorenulls=True), so the attached values all come from the
    same (latest) right row — including its NULL fields. A per-column
    last() would instead carry each column forward independently,
    resurrecting older non-null values whenever the true as-of row has
    a NULL (not ASOF semantics).
    """
    from pyspark.sql import types as T

    vals_type = T.StructType([right.schema[c] for c in value_cols])
    r = right.select(
        F.col(key),
        F.col(time_col),
        F.lit(0).alias("_kind"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l_ = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(vals_type).alias("_vals"),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col).asc(), F.col("_kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l_).withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))
    return unioned.filter(F.col("_kind") == 1).select(
        key,
        time_col,
        *left_cols,
        *[F.col(f"_vals.{c}").alias(c) for c in value_cols],
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_time: str,
    low,
    high,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left key: count right rows whose time falls in [low, high],
    where low/high are Column expressions over the left row. The equi
    key keeps the plan a hash/sort-merge join; the range is a cheap
    post-join filter (verified: no BroadcastNestedLoopJoin)."""
    joined = left.join(right, on=on).filter(
        (F.col(right_time) >= low) & (F.col(right_time) <= high)
    )
    return joined.groupBy(on).agg(F.count("*").alias(count_alias))
