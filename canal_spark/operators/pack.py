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

1. split the id domain into P contiguous ranges with EXPLICIT literal
   boundaries (driver-side, from a one-job TakeOrdered random sample
   of ids — same balance guarantee as RangePartitioner's own sampler);
2. intra-range running sums via a window PARTITIONED BY the range id
   — fully parallel, sorted within ranges only;
3. per-range totals are P driver-side numbers (metadata scale); their
   exclusive cumulative sums are folded back as a literal map.

Why literal boundaries instead of `repartitionByRange` +
`spark_partition_id()`: the totals collect and the final output are
two independent Spark actions, and RangePartitioner re-samples its
split points with an execution-varying seed on each action — the two
actions can disagree about which range a boundary row belongs to,
silently corrupting every offset past the first moved row (manifests
only at scale, where the sampler is non-exhaustive). Boundaries that
are Python literals are shared by construction, need no persist() of
the corpus, and drop a shuffle: the window's own partitionBy(_pid) is
now the only exchange.

The chunk assignment depends only on global offsets, which are
independent of the range boundaries — output is deterministic for any
partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _range_bounds(df: DataFrame, id_col: str, parts: int) -> list:
    """P-1 split points over the id domain, as driver-side literals.

    One TakeOrdered job over the column-pruned id projection: sample
    ~32 ids per target range via orderBy(rand(seed)).limit(n) (no full
    sort), then pick evenly spaced quantiles driver-side. Collected
    ONCE, so every downstream action agrees on range membership.
    """
    if parts <= 1:
        return []
    n = parts * 32
    ids = sorted(r[0] for r in df.select(id_col).orderBy(F.rand(17)).limit(n).collect())
    if len(ids) <= parts:
        return sorted(set(ids[:-1]))
    step = len(ids) / parts
    return sorted({ids[int(i * step)] for i in range(1, parts)})


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
    parts = int(
        num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    bounds = _range_bounds(df, id_col, parts)
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        # range k owns ids in (bounds[k-1], bounds[k]]: pid = #bounds < id.
        # Linear scan over P-1 literals per row, but entirely inside
        # whole-stage codegen; P is O(cluster cores), not O(data).
        pid = F.size(F.filter(barr, lambda b: b < F.col(id_col)))
    else:
        pid = F.lit(0)
    base = df.select(
        F.col(id_col), F.col(ntok_col).cast("long").alias("_n")
    ).withColumn("_pid", pid)
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
    for p, t in totals:
        bases[p] = acc
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
