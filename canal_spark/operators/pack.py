"""Sequence packing: lay documents' token ranges end-to-end and cut
fixed-length training sequences — THE canonical operation over a table
of pre-tokenized training sequences (input_hint shape).

Semantics: documents are concatenated in `id_col` order; training
sequence (chunk) `c` covers token offsets [c*seq_len, (c+1)*seq_len).
Output: one row per (document, chunk) overlap with the token count the
document contributes to that chunk — the manifest a dataloader needs
to assemble fixed-length batches without ever re-scanning text.

Scale design — the whole point of this module: the naive formulation
is `SUM(n_tok) OVER (ORDER BY doc_id)`, a GLOBAL window that Spark
plans as a single-partition sort (one task owns the corpus — a
non-starter at 10^10 docs). Instead, the classic two-phase parallel
prefix sum:

1. range-partition by id (order-preserving across partitions);
2. intra-partition running sums via a window PARTITIONED BY the
   physical partition id — fully parallel, sorted within partitions
   only;
3. per-partition totals are P driver-side numbers (metadata scale);
   their exclusive cumulative sums are folded back as a literal map.

The chunk assignment depends only on global offsets, which are
independent of the partition boundaries — output is deterministic for
any partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, chunk_id, n_in_chunk) — see module docstring. Documents
    with `ntok_col` <= 0 contribute no rows. `id_col` values must be
    unique (the target-table invariant)."""
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    base = (
        df.select(F.col(id_col), F.col(ntok_col).cast("long").alias("_n"))
        .repartitionByRange(int(parts), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = base.withColumn("_end_local", F.sum("_n").over(w))
    totals = sorted(
        (int(r["_pid"]), int(r["t"]))
        for r in base.groupBy("_pid").agg(F.sum("_n").alias("t")).collect()
    )
    bases: dict[int, int] = {}
    acc = 0
    for pid, t in totals:
        bases[pid] = acc
        acc += t
    base_map = (
        F.create_map(*[F.lit(x) for kv in bases.items() for x in kv])
        if bases
        else F.create_map()
    )
    start = base_map[F.col("_pid")] + F.col("_end_local") - F.col("_n")
    end = base_map[F.col("_pid")] + F.col("_end_local")
    L = F.lit(seq_len)
    out = (
        intra.filter(F.col("_n") > 0)
        .withColumn("_start", start)
        .withColumn("_end", end)
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    F.expr(f"_start div {seq_len}"), F.expr(f"(_end - 1) div {seq_len}")
                )
            ),
        )
    )
    lo = F.greatest(F.col("_start"), F.col("chunk_id") * L)
    hi = F.least(F.col("_end"), (F.col("chunk_id") + 1) * L)
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (hi - lo).cast("long").alias("n_in_chunk"),
    )
