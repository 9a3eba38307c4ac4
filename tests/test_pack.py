"""Sequence packing: distributed prefix sum equals the naive global
window for any partition count, chunk-size invariants hold, and the
plan contains no single-partition global sort."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from canal_spark.operators.pack import pack_sequences

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.col("n_chars").alias("n_tok")
    )


def _naive(df, seq_len):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    o = df.withColumn("s", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    c = o.filter(F.col("n_tok") > 0).withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.expr(f"s div {seq_len}"),
                F.expr(f"(s + n_tok - 1) div {seq_len}"),
            )
        ),
    )
    lo = F.greatest(F.col("s"), F.col("chunk_id") * seq_len)
    hi = F.least(F.col("s") + F.col("n_tok"), (F.col("chunk_id") + 1) * seq_len)
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (hi - lo).cast("long").alias("n_in_chunk"),
    )


def test_matches_naive_for_any_partition_count(spark):
    d = _docs(spark)
    exp = _naive(d, 512)
    for parts in (1, 3, 16):
        got = pack_sequences(d, seq_len=512, num_partitions=parts)
        assert got.count() == exp.count()
        assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_chunk_size_invariants(spark):
    got = pack_sequences(_docs(spark), seq_len=512)
    sizes = got.groupBy("chunk_id").agg(F.sum("n_in_chunk").alias("n")).collect()
    last = max(r["chunk_id"] for r in sizes)
    for r in sizes:
        if r["chunk_id"] == last:
            assert 0 < r["n"] <= 512
        else:
            assert r["n"] == 512, f"chunk {r['chunk_id']} not full: {r['n']}"
    # total token conservation
    total = _docs(spark).agg(F.sum("n_tok")).first()[0]
    assert sum(r["n"] for r in sizes) == total


def test_pid_is_deterministic_literal_not_physical(spark):
    """Regression: range membership must NOT come from
    spark_partition_id() over repartitionByRange — RangePartitioner
    re-samples boundaries per action, so the totals collect and the
    output job could disagree on boundary rows. With literal bounds
    the plan contains neither construct and repeated evaluations of
    the SAME returned DataFrame are identical."""
    d = _docs(spark)
    got = pack_sequences(d, seq_len=512, num_partitions=7)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" not in plan.upper()
    assert "rangepartitioning" not in plan.lower()
    first = {tuple(r) for r in got.collect()}
    second = {tuple(r) for r in got.collect()}
    assert first == second


def test_plan_has_no_global_single_partition_sort(spark):
    plan = (
        pack_sequences(_docs(spark), seq_len=512)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, "global window would serialize the corpus"
