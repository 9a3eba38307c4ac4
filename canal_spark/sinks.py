"""Sink adapters — canal's OuterAdapter SPI and MQ fan-out, Spark-side.

Canal delivers each batch to pluggable sinks: MQ producers serialize
FlatMessage JSON per topic/partition
[C: connector/kafka-connector/.../CanalKafkaProducer.java ::
#send(MQDestination,...)] and client adapters apply batches to
downstream stores [C: client-adapter/common/.../OuterAdapter.java ::
#sync]. Here a sink is any object with
`apply(spark, delta, epoch)` receiving the epoch's collapsed delta
(one LWW winner per key, `_seq`-versioned) — the same frame the MERGE
consumes.

Delivery contract: sinks run BEFORE the epoch's atomic table commit
and write to epoch-keyed locations with overwrite, so a crash after a
sink wrote but before the commit re-runs the epoch and overwrites the
sink output byte-identically — idempotent at-least-once = effectively
exactly-once per epoch directory (same recipe as the table itself).

Cost note: the delta lineage is recomputed per sink (one extra pruned
slice scan + the cached-winners join); the engine deliberately never
caches the wide delta (measured in r1 — cache build cost exceeds the
re-scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from canal_spark.operators.lww import SP_BITS


def flat_messages_from_delta(
    delta: DataFrame,
    database: str = "canal",
    table: str = "target",
) -> DataFrame:
    """Epoch delta -> one FlatMessage JSON string per changed row
    (canal's flatMessage=true mode: stringly-typed column maps,
    DELETE rows carried with type=DELETE). Inverse of
    sources.flat_message.parse_flat_messages; JVM-only expressions."""
    data_map = F.create_map(
        F.lit("doc_id"), F.col("doc_id"),
        F.lit("tokens"), F.to_json(F.col("tokens")),
        F.lit("n_tok"), F.col("n_tok").cast("string"),
        F.lit("source"), F.col("source"),
    )
    msg = F.struct(
        F.col("_seq").alias("id"),
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.array(F.lit("doc_id")).alias("pkNames"),
        F.lit(False).alias("isDdl"),
        F.col("op").alias("type"),
        # es = source event "execute time" analog: the winner's lsn
        F.shiftright(F.col("_seq"), SP_BITS).alias("es"),
        F.col("_seq").alias("ts"),
        F.lit(None).cast("string").alias("sql"),
        F.array(data_map).alias("data"),
        F.lit(None).cast("array<map<string,string>>").alias("old"),
    )
    return delta.select(F.to_json(msg).alias("value"))


class SinkMapping:
    """Declarative per-sink ETL config — the transferable half of
    canal's adapter SQL mapping ([C: client-adapter/es-core/.../
    SqlParser.java :: main-table mapping]: each ES/RDB target declares
    a projection/rename plus dimension joins over the change stream).

    Applied to the epoch delta BEFORE fan-out, in this order:
    1. `where`: SQL predicate over the delta (row routing);
    2. `dim` + `on=(delta_col, dim_col)`: broadcast enrichment LEFT
       join — the same J1 path the engine's enrichment queries use
       (the dim is a small reference table; the delta side never
       shuffles);
    3. `columns`: {target_name: source_sql_expr} projection/rename
       evaluated after the join, so targets can name dim columns.

    Every piece is optional; an empty mapping is the identity. The
    whole mapping stays one lazy JVM-side plan fragment per sink."""

    def __init__(
        self,
        columns: dict[str, str] | None = None,
        where: str | None = None,
        dim: DataFrame | None = None,
        on: tuple[str, str] | None = None,
    ):
        if (dim is None) != (on is None):
            raise ValueError("dim and on must be given together")
        self.columns = columns
        self.where = where
        self.dim = dim
        self.on = on

    def apply(self, delta: DataFrame) -> DataFrame:
        out = delta
        if self.where:
            out = out.filter(F.expr(self.where))
        if self.dim is not None:
            dcol, mcol = self.on
            # beyond the join key (dropped below), any dim column
            # sharing a delta column's name would survive the join as
            # a duplicate and break every later `columns` expression /
            # write with ambiguity — reject the mapping upfront with
            # the actual collision list instead
            clash = sorted((set(self.dim.columns) - {mcol}) & set(out.columns))
            if clash:
                raise ValueError(
                    "SinkMapping: dim columns collide with delta columns "
                    f"{clash}; alias them in the dim before mapping"
                )
            # drop the dim's join column after the join: keeping it
            # duplicates the name whenever dcol == mcol (the natural
            # same-name key) and breaks the downstream write /
            # `columns` references with ambiguity errors
            out = out.join(
                F.broadcast(self.dim), out[dcol] == self.dim[mcol], "left"
            ).drop(self.dim[mcol])
        if self.columns:
            out = out.select(
                *[F.expr(src).alias(tgt) for tgt, src in self.columns.items()]
            )
        return out


class MappedParquetSink:
    """A store adapter driven entirely by a SinkMapping: the mapped
    delta lands in epoch-keyed parquet (overwrite => idempotent per
    epoch, same delivery contract as every sink here). The write
    format is the swappable part; the mapping is the adapter logic."""

    def __init__(self, out_dir: str, mapping: SinkMapping | None = None):
        self.out_dir = out_dir
        self.mapping = mapping or SinkMapping()

    def epoch_dir(self, epoch: int) -> str:
        return f"{self.out_dir}/epoch={epoch}"

    def apply(self, spark: SparkSession, delta: DataFrame, epoch: int) -> None:
        self.mapping.apply(delta).write.mode("overwrite").parquet(self.epoch_dir(epoch))


class FlatMessageDirSink:
    """MQ-topic stand-in: epoch-keyed directories of FlatMessage JSON
    lines (swap the write for a Kafka producer `.format("kafka")` on a
    real bus — the message construction is identical)."""

    def __init__(self, out_dir: str, database: str = "canal", table: str = "target"):
        self.out_dir = out_dir
        self.database = database
        self.table = table

    def epoch_dir(self, epoch: int) -> str:
        return f"{self.out_dir}/epoch={epoch}"

    def apply(self, spark: SparkSession, delta: DataFrame, epoch: int) -> None:
        (
            flat_messages_from_delta(delta, self.database, self.table)
            .write.mode("overwrite")
            .text(self.epoch_dir(epoch))
        )
