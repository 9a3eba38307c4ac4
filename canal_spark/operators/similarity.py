"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — the dot product is a sequential
left-fold over the zipped arrays (`zip_with` + `aggregate`), fully
JVM-side. Scale path: LSH (random hyperplanes) bucketing so the join
key is the signature, not an n^2 cross join; and an IVF-style variant
that routes queries to the nearest coarse centroid's bucket.

Canal has no analog (⊘ in SURVEY.md §2) — engine-beyond-reference
operators for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a, b):
    """Cosine similarity of two array columns (double, deterministic
    left-to-right accumulation order)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set
    against the full vector table — a broadcast nested-loop by design;
    cost is |queries| x |vectors| with no shuffle of the big side.

    Rank ties broken by (rounded sim DESC, neighbor id ASC) for a fully
    deterministic, engine-portable result.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    scored = (
        F.broadcast(q)
        .join(v, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), round_digits).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_hyperplane_signatures(
    vectors: DataFrame,
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) random-hyperplane LSH: bit i = sign(<v, r_i>).
    Hyperplanes are a deterministic seeded constant broadcast into the
    plan as literals — identical on every executor."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    v = F.col(vec_col).cast("array<double>")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(v, plane) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return vectors.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket.
    The join key is the bucket — at 100 TB this shuffles each side once
    on a low-cardinality key instead of broadcasting everything."""
    sig_v = lsh_hyperplane_signatures(vectors, n_planes, dim, id_col=id_col, vec_col=vec_col)
    sig_q = lsh_hyperplane_signatures(queries, n_planes, dim, id_col=id_col, vec_col=vec_col)
    q = sig_q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        "bucket",
    )
    v = sig_v.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        "bucket",
    )
    scored = (
        q.join(v, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 3).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its `nprobe` nearest coarse centroids
    (IVF list ids). Centroids are a small driver-side constant folded
    into the plan as literals — no shuffle, no broadcast join, scales
    with |vectors| only. Deterministic tie-break: (sim DESC, cid ASC)."""
    v = F.col(vec_col).cast("array<double>")
    scored = F.array(
        *[
            F.struct(
                F.round(cosine(v, F.array(*[F.lit(float(x)) for x in cvec])), 6).alias("sim"),
                F.lit(-cid).alias("neg_cid"),
            )
            for cid, cvec in centroids
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(F.transform(top, lambda s: -s["neg_cid"])).alias("list_id"),
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 2048,
    sweeps: int = 3,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means training for IVF coarse centroids: a
    deterministic hash-ordered sample (TakeOrdered — per-partition
    top-k merge, never a full shuffle/collect of the corpus) + a few
    Lloyd sweeps driver-side in numpy. Centroids are tiny
    (n_lists x dim), so training cost is O(sample) regardless of
    corpus size; the resulting list assignment is what gives IVF real
    recall (first-n-by-id 'centroids' cluster nothing)."""
    import numpy as np

    rows = (
        vectors.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("kmeans_centroids: vector corpus is empty")
    x = np.asarray([list(r["v"]) for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # tiny-corpus clamp: fewer vectors than requested lists → one list
    # per vector (callers see the effective count via len() of the
    # returned list and must size nprobe against it)
    n_lists = min(n_lists, len(x))
    cents = x[:n_lists].copy()
    for _ in range(sweeps):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return [(i, [float(v) for v in cents[i]]) for i in range(n_lists)]


def ivf_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 2048,
    train_sweeps: int = 3,
) -> DataFrame:
    """IVF-style approximate top-k: vectors are partitioned into
    `n_lists` inverted lists by nearest coarse centroid; each query
    probes its `nprobe` nearest lists and scores only those vectors.

    Centroids come from seeded spherical k-means over a deterministic
    hash-ordered sample (kmeans_centroids). At scale the join key is
    `list_id` (cardinality n_lists), so the big side shuffles once on
    a small key domain instead of a broadcast nested loop over
    everything.
    """
    centroids = kmeans_centroids(
        vectors, n_lists, id_col, vec_col, sample_size=train_sample, sweeps=train_sweeps
    )
    v = ivf_assign(vectors, centroids, id_col, vec_col, nprobe=1).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        "list_id",
    )
    q = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        "list_id",
    )
    scored = (
        q.join(v, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 3).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def neardup_pairs_by_cosine(
    vectors: DataFrame,
    threshold: float,
    max_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold within an
    id-bounded slice (the oracle-checkable form; the scale path is
    lsh_bucketed_topk)."""
    base = vectors
    if max_id is not None:
        base = base.filter(F.col(id_col) < max_id)
    a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 3).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
