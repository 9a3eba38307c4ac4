"""Near-duplicate detectors must actually FIND planted duplicates —
recall on known pairs plus a no-false-positive bound on documents
built to be pairwise dissimilar (closes the r1 gap: rows-only driver
checks proved the queries run, not that they detect)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from canal_spark.operators import dedup as DD
from canal_spark.queries import _with_planted_dupes

SF = "/root/testdata/sf0.001"
PLANTED = {(i, i + 100000) for i in range(10)}


@pytest.fixture(scope="module")
def docs(spark):
    return _with_planted_dupes(
        spark.read.parquet(f"{SF}/documents.parquet")
    ).cache()


def _pairs(df) -> set[tuple[int, int]]:
    return {(int(r["id_a"]), int(r["id_b"])) for r in df.collect()}


def test_minhash_lsh_finds_all_planted(docs):
    sh = DD.word_shingles(docs)
    sig = DD.minhash_signatures(sh, num_perm=16)
    found = _pairs(DD.jaccard_verify(DD.lsh_candidate_pairs(sig, bands=4), sh, min_jaccard=0.5))
    missing = PLANTED - found
    assert not missing, f"MinHash+LSH missed planted near-dupes: {sorted(missing)}"


def test_minhash_scan_agg_value_parity(docs):
    """The scan-side (HOF fold) and explode+agg MinHash plans are two
    physical shapes of the SAME hash family — every signature element
    must be identical, or banding keys diverge between callers."""
    sh = DD.word_shingles(docs)
    a = DD.minhash_signatures(sh, num_perm=16, method="agg").withColumnRenamed("sig", "sa")
    b = DD.minhash_signatures(sh, num_perm=16, method="scan").withColumnRenamed("sig", "sb")
    j = a.join(b, "doc_id")
    assert j.filter(F.col("sa") != F.col("sb")).count() == 0
    assert j.count() == docs.count()


def test_simhash_finds_all_planted(docs):
    # planted hamming distances reach 4 (one appended word flips more
    # bits on short docs), so detect at radius 4 / 5 blocks (pigeonhole:
    # <=4 differing bits across 5 disjoint slices => one clean block)
    found = _pairs(DD.simhash_near_pairs(DD.simhash(docs), max_hamming=4, blocks=5))
    missing = PLANTED - found
    assert not missing, f"SimHash missed planted near-dupes: {sorted(missing)}"


def test_ngram_jaccard_finds_all_planted(docs):
    found = _pairs(DD.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.8))
    missing = PLANTED - found
    assert not missing, f"n-gram Jaccard missed planted near-dupes: {sorted(missing)}"


def test_char_ngram_finds_all_planted(docs):
    found = _pairs(DD.char_ngram_jaccard_pairs(docs, n=3, min_jaccard=0.8))
    missing = PLANTED - found
    assert not missing, f"char-ngram Jaccard missed planted near-dupes: {sorted(missing)}"


@pytest.fixture(scope="module")
def disjoint_docs(spark):
    """40 documents engineered pairwise-dissimilar: unique word vocab
    per doc (word/shingle overlap zero) over random letters (char-gram
    overlap negligible). Deterministic: seeded PRNG, fixed hash family."""
    rnd = random.Random(7)
    rows = []
    for i in range(40):
        words = [
            "".join(rnd.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
            for _ in range(40)
        ]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_no_false_positives(disjoint_docs):
    sh = DD.word_shingles(disjoint_docs)
    sig = DD.minhash_signatures(sh, num_perm=16)
    got = DD.jaccard_verify(DD.lsh_candidate_pairs(sig, bands=4), sh, min_jaccard=0.5)
    assert got.count() == 0


def test_simhash_no_false_positives(disjoint_docs):
    assert DD.simhash_near_pairs(DD.simhash(disjoint_docs), max_hamming=3).count() == 0


def test_char_ngram_no_false_positives(disjoint_docs):
    assert (
        DD.char_ngram_jaccard_pairs(disjoint_docs, n=3, min_jaccard=0.8).count() == 0
    )


def test_ngram_jaccard_no_false_positives(disjoint_docs):
    assert DD.ngram_jaccard_pairs(disjoint_docs, n=3, min_jaccard=0.8).count() == 0


def test_ngram_jaccard_short_doc_pair_found(spark):
    """min_shared floor adapts to tiny docs: a 3-word doc and its exact
    copy share only ONE shingle and must still be detected."""
    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    got = {(int(r["id_a"]), int(r["id_b"])) for r in DD.ngram_jaccard_pairs(d, min_jaccard=0.8).collect()}
    assert got == {(1, 2)}


def test_ngram_candidate_join_is_df_capped(disjoint_docs):
    """The pair join must ride on DF-filtered grams with a bounded
    per-gram fan-out — assert no nested-loop/cartesian in the plan."""
    ex = (
        DD.ngram_jaccard_pairs(disjoint_docs, n=3, min_jaccard=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in ex and "CartesianProduct" not in ex


def test_char_ngram_candidates_are_band_keyed(disjoint_docs):
    """The r1 scale defect: candidates must come from a band-signature
    equi-join, never an exploded-gram self-join (which degenerates to
    all-pairs per hot gram). Assert the plan contains no nested-loop /
    cartesian and that the only self-join feeding the pair set is the
    banded one (join keys include band_key)."""
    plan = (
        DD.char_ngram_jaccard_pairs(disjoint_docs, n=3, min_jaccard=0.8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "band_key" in plan
    ex = (
        DD.char_ngram_jaccard_pairs(disjoint_docs, n=3, min_jaccard=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in ex and "CartesianProduct" not in ex


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing guarantee: any shared substring of length >= k+w-1
    (= 8 at k=5,w=4) yields at least one shared fingerprint. The
    planted clones (same text + ' extra') must share; engineered
    random-letter docs share almost nothing."""
    from canal_spark.functions.text import winnowing_fingerprints

    docs = _with_planted_dupes(spark.read.parquet(f"{SF}/documents.parquet"))
    fps = winnowing_fingerprints(docs)
    a = fps.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("k"), "fp"
    )
    b = fps.filter(F.col("doc_id") >= 100000).select(
        (F.col("doc_id") - 100000).alias("k"), "fp"
    )
    shared = a.join(b, ["k", "fp"]).select("k").distinct().count()
    assert shared == 10, "every planted clone must share fingerprints"


def test_winnowing_density_bound(spark):
    """Winnowing keeps ~2/(w+1) of the grams — assert the documented
    storage bound holds (fingerprints strictly fewer than grams)."""
    from canal_spark.functions.text import winnowing_fingerprints

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_fp = winnowing_fingerprints(docs, k=5, w=4).count()
    n_grams = int(
        docs.select(F.greatest(F.length("text") - 4, F.lit(1)).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert n_fp < 0.7 * n_grams


@pytest.mark.parametrize("threshold", [1_000_000, 0])
def test_connected_components_collapses_chains(spark, threshold):
    """A~B, B~C (but never A~C directly) must land in ONE cluster —
    the under-dedup case pairwise drop rules miss; isolated docs label
    themselves; disjoint pairs stay separate clusters. Parametrized
    over BOTH physical paths: the driver union-find fast path
    (threshold high) and the distributed label-propagation rounds
    (threshold 0) must agree exactly."""
    from canal_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    nodes = spark.range(1, 11).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            pairs, nodes, driver_threshold_edges=threshold
        ).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[9] == 7
    for i in (4, 5, 6, 8, 10):
        assert got[i] == i


def test_connected_components_paths_agree_on_random_graph(spark):
    """Property parity: on a deterministic random pair graph the driver
    union-find and the distributed rounds produce byte-identical
    cluster assignments."""
    import random

    from canal_spark.operators.dedup import connected_components

    rnd = random.Random(7)
    pairs = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    nodes = spark.range(0, 250).select(F.col("id").alias("doc_id"))
    fast = sorted(
        map(tuple, connected_components(pdf, nodes).collect())
    )
    dist = sorted(
        map(tuple, connected_components(pdf, nodes, driver_threshold_edges=0).collect())
    )
    assert fast == dist


def test_connected_components_releases_all_caches(spark, monkeypatch):
    """Every frame the algorithm persists must be unpersisted by the
    time it returns (the result plan is lineage-truncated at the
    converged labels via localCheckpoint) — a long-lived session
    running dedup per corpus batch would otherwise accumulate one
    leaked cache per call."""
    from canal_spark.operators.dedup import connected_components

    persisted = []
    # patch the CONCRETE class (pyspark 4 sessions hand back
    # pyspark.sql.classic.dataframe.DataFrame, which overrides
    # persist — patching the abstract base would miss every call)
    cls = type(spark.range(1))
    real_persist = cls.persist

    def tracking_persist(self, *a, **kw):
        persisted.append(self)
        return real_persist(self, *a, **kw)

    monkeypatch.setattr(cls, "persist", tracking_persist)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    nodes = spark.range(1, 6).select(F.col("id").alias("doc_id"))
    out = connected_components(pairs, nodes, driver_threshold_edges=0)
    assert out.count() == 5  # the result survives the cache release
    assert persisted, "sanity: the algorithm does persist intermediates"
    still_cached = [df for df in persisted if df.is_cached]
    assert not still_cached, f"{len(still_cached)} frame(s) left persisted"
