"""Canal FlatMessage JSON edge: the flattened per-table JSON format the
reference publishes to MQ topics
[C: protocol/.../FlatMessage.java :: {id, database, table, pkNames[],
isDdl, type, es, ts, sql, data:[{col->val}], old:[{col->val}]}] —
every column value serialized as a string (canal's stringly-typed
Column model, SURVEY.md §1.1).

Spark mapping: `from_json` with an EXPLICIT schema (never schema
inference — at 100 TB an inference pass is a full extra scan and a
schema-drift hazard), then `explode` of the row array: one output row
per changed row, typed via cast. All JVM-side expressions — the JSON
path never touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: explicit FlatMessage schema (subset sufficient for DML rows;
#: `old` carries only changed columns' pre-images)
FLAT_MESSAGE_SCHEMA = (
    "id BIGINT, `database` STRING, `table` STRING, pkNames ARRAY<STRING>, "
    "isDdl BOOLEAN, type STRING, es BIGINT, ts BIGINT, sql STRING, "
    "data ARRAY<MAP<STRING, STRING>>, old ARRAY<MAP<STRING, STRING>>"
)


def parse_flat_messages(df: DataFrame, json_col: str = "msg") -> DataFrame:
    """JSON strings -> one typed row per changed row.

    Output: (msg_id, database, table, op, es, row_index, row, old_row)
    where row/old_row are the raw string->string column maps; callers
    project + cast to their table's types (canal adapters do the same
    via their column mapping config)."""
    parsed = df.select(
        F.from_json(F.col(json_col), FLAT_MESSAGE_SCHEMA).alias("m")
    ).filter(F.col("m").isNotNull() & ~F.coalesce(F.col("m.isDdl"), F.lit(False)))
    exploded = parsed.select(
        F.col("m.id").alias("msg_id"),
        F.col("m.database").alias("database"),
        F.col("m.table").alias("table"),
        F.col("m.type").alias("op"),
        F.col("m.es").alias("es"),
        F.coalesce(F.col("m.old"), F.array()).alias("_old"),
        F.posexplode("m.data").alias("row_index", "row"),
    )
    return exploded.select(
        "msg_id",
        "database",
        "table",
        "op",
        "es",
        "row_index",
        "row",
        # 0-based get(): null (not ANSI error) when there is no pre-image
        F.get("_old", F.col("row_index")).alias("old_row"),
    )
