"""Tests for the beyond-equi joins (as-of, range) and the IVF ANN
variant: semantics vs a naive formulation, plan shape at scale, and
approximate-recall floors."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from canal_spark.operators import similarity as SIM
from canal_spark.operators.joins import asof_join, range_join_count

SF = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_asof_join_matches_naive_inequality_join(spark):
    ev = _events(spark)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"), "ts", F.col("event_id").alias("purchase_lsn")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("key"), "ts")
        .agg(
            F.max("event_id").alias("click_lsn"),
            F.max_by("value", "event_id").alias("click_value"),
        )
    )
    got = asof_join(
        purchases, clicks, key="key", time_col="ts",
        value_cols=["click_lsn", "click_value"], left_cols=["purchase_lsn"],
    )

    # naive O(L*R) reference: inequality join + argmax by click ts
    c = clicks.select(
        F.col("key").alias("ckey"), F.col("ts").alias("cts"), "click_lsn", "click_value"
    )
    joined = purchases.join(
        c, (purchases.key == c.ckey) & (c.cts <= purchases.ts), "left"
    )
    w = Window.partitionBy("purchase_lsn").orderBy(F.desc_nulls_last("cts"))
    naive = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("key", "ts", "purchase_lsn", "click_lsn", "click_value")
    )
    assert got.count() == purchases.count()
    assert got.exceptAll(naive).count() == 0 and naive.exceptAll(got).count() == 0


def test_asof_join_plan_has_no_nested_loop(spark):
    ev = _events(spark)
    left = ev.select(F.col("user_id").alias("key"), "ts", F.col("event_id").alias("lid"))
    right = ev.select(F.col("user_id").alias("key"), "ts", F.col("value").alias("v"))
    right = right.groupBy("key", "ts").agg(F.max("v").alias("v"))
    plan = asof_join(
        left, right, key="key", time_col="ts", value_cols=["v"], left_cols=["lid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_stays_hash_join(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderdate"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("orderkey"), "l_shipdate"
    )
    out = range_join_count(
        orders, li, on="orderkey", right_time="l_shipdate",
        low=F.col("o_orderdate"),
        high=F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # range rows never exceed the equi-join row count
    assert out.agg(F.sum("n_in_range")).first()[0] <= orders.join(li, "orderkey").count()


def test_ivf_recall_floor_vs_brute_force(spark):
    """Recall floor with k-means-trained centroids. Context for the
    threshold: the synthetic embeddings are isotropic (mean pairwise
    cos 0.00, within-cluster cos to centroid 0.27), so neighbor mass
    is nearly uniform across lists and recall is structurally capped
    near covered-mass (nprobe/n_lists) plus a locality bonus — 0.65 at
    nprobe=4/8 is the data's ceiling territory, not slack. On
    clustered real-world embeddings the same training yields far
    higher recall. (First-n-by-id 'centroids', the r1 stand-in,
    measured 0.56 at nprobe=3; k-means measures 0.70.)"""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_bucketed_topk(emb, queries, k=5, n_lists=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.65, f"IVF recall {recall:.2f} below floor"


def test_kmeans_centroids_deterministic_and_normalized(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = SIM.kmeans_centroids(emb, n_lists=4)
    c2 = SIM.kmeans_centroids(emb, n_lists=4)
    assert c1 == c2, "training must be a pure function of the data"
    for _cid, v in c1:
        norm = sum(x * x for x in v) ** 0.5
        assert abs(norm - 1.0) < 1e-9


def test_kmeans_clamps_n_lists_to_tiny_corpus(spark):
    """Corpus smaller than n_lists: the list count clamps to the
    corpus size instead of raising IndexError, and IVF over the
    clamped lists still answers (full coverage → exact)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") < 3)
    cents = SIM.kmeans_centroids(emb, n_lists=16)
    assert len(cents) == 3
    out = SIM.ivf_bucketed_topk(emb, emb, k=2, n_lists=16, nprobe=16)
    exact = SIM.brute_force_topk(emb, emb, k=2).select(
        "query_id", "neighbor_id", "rank"
    )
    got = out.select("query_id", "neighbor_id", "rank")
    assert got.exceptAll(exact).count() == 0 and exact.exceptAll(got).count() == 0


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing every list makes IVF exact — the correctness anchor for
    the routing/scoring path."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, queries, k=3).select(
        "query_id", "neighbor_id", "rank"
    )
    full = SIM.ivf_bucketed_topk(emb, queries, k=3, n_lists=4, nprobe=4).select(
        "query_id", "neighbor_id", "rank"
    )
    assert full.exceptAll(exact).count() == 0 and exact.exceptAll(full).count() == 0


def test_asof_join_nullable_right_values_come_from_one_row(spark):
    """The as-of row's NULL fields must be attached as NULL — a
    per-column carry-forward would resurrect older non-null values and
    mix columns from different right rows."""
    left = spark.createDataFrame([("k", 3, 100)], "key string, ts int, lid int")
    right = spark.createDataFrame(
        [("k", 1, 10, "a"), ("k", 2, None, "b")],
        "key string, ts int, v1 int, v2 string",
    )
    got = asof_join(
        left, right, key="key", time_col="ts", value_cols=["v1", "v2"], left_cols=["lid"]
    ).collect()
    assert len(got) == 1
    row = got[0]
    assert row["v2"] == "b" and row["v1"] is None, (
        "as-of values must all come from the latest right row (ts=2), "
        f"got v1={row['v1']} v2={row['v2']}"
    )
