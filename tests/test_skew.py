"""Hot-key skew (SURVEY.md §5.2 item 5): the LWW collapse must not
serialize on a hot key. Structural property under test: what crosses
the shuffle after map-side partial aggregation is ONE row per
(map task, key) — so reduce-partition load is bounded by the KEY
distribution, not the EVENT distribution, even when one key owns half
the events (canal's adapter would serialize that key on one pk-hash
bucket; SURVEY.md §4 'per-key hash concurrency' row)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from canal_spark.operators.lww import lww_collapse

N_EVENTS = 200_000
HOT_SHARE = 0.5
N_KEYS = 1_000


def _skewed_events(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n_hot = int(N_EVENTS * HOT_SHARE)
    keys = np.concatenate(
        [
            np.zeros(n_hot, dtype=np.int64),
            rng.integers(1, N_KEYS, size=N_EVENTS - n_hot),
        ]
    )
    pdf = pd.DataFrame(
        {
            "doc_id": [f"doc{k}" for k in keys],
            "lsn": np.arange(N_EVENTS, dtype=np.int64),
            "source_partition": (np.arange(N_EVENTS) % 8).astype("int32"),
            "op": "UPDATE",
            "n_tok": np.ones(N_EVENTS, dtype=np.int32),
            "source": "src0",
        }
    )
    return spark.createDataFrame(pdf).repartition(16)


def test_hot_key_does_not_skew_reduce_partitions(spark):
    df = _skewed_events(spark)
    winners = df.groupBy("doc_id").agg(
        F.max(F.shiftleft(F.col("lsn"), 12) + F.col("source_partition")).alias("_ord")
    )
    per_part = (
        winners.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()
    )
    med = per_part["count"].median()
    assert per_part["count"].max() <= max(4 * med, 50), (
        f"reduce-partition skew: max={per_part['count'].max()} median={med}"
    )
    # and the hot key still resolved to exactly one winner row
    assert winners.filter(F.col("doc_id") == "doc0").count() == 1


def test_lww_correct_under_heavy_skew(spark):
    df = _skewed_events(spark)
    out = lww_collapse(df, payload_cols=("op", "n_tok", "source")).toPandas()
    assert len(out) == N_KEYS
    # winner of the hot key is the greatest (lsn, source_partition)
    hot_max = df.filter(F.col("doc_id") == "doc0").agg(F.max("lsn")).first()[0]
    got = out[out.doc_id == "doc0"]
    assert len(got) == 1
    # reconstruct the winner's lsn via a direct lookup
    w = df.filter((F.col("doc_id") == "doc0") & (F.col("lsn") == hot_max)).count()
    assert w == 1
