"""Driver contract for the spark-graft builder (PySpark target).

entry()      -> flagship CDC collapse on sf0.001
queries()    -> every implemented operator from SURVEY.md §2 plus the
                training-data ops (dedup / similarity / text analysis)
oracle_sql() -> matching ANSI SQL for DuckDB (omitted only for ops
                that are genuinely not SQL-expressible: hash-family
                LSH dedup/ANN, the exactly-once protocol, the
                multimodal binary stub, HLL sketches)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from canal_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins collapse with tombstones over the
    sf0.001 events-as-changelog, enriched against the customer dim —
    the final-state upsert semantics of the engine's MERGE kernel."""
    from pyspark.sql import functions as F

    from canal_spark.queries import merge_upsert_final_state
    from canal_spark.sources.cdc_mapping import load

    sf = "/root/testdata/sf0.001"
    state = merge_upsert_final_state(spark, sf)
    cust = load(spark, sf, "customer")
    return state.join(
        F.broadcast(cust), state.key == cust.c_custkey, "left"
    ).select("key", "last_lsn", "last_value", "c_name", "c_mktsegment")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
