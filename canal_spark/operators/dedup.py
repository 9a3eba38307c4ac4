"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Design rules (100 TB posture):
- everything is DataFrame ops on JVM-side built-ins (xxhash64, md5,
  higher-order array functions, bit_count) — zero Python in the hot
  path, whole-stage codegen throughout;
- near-dup candidate generation is LSH-bucketed (band join), never an
  all-pairs cross join: the shuffle key is the band signature, so cost
  scales with bucket collision counts, not n^2;
- verification (exact Jaccard) runs only on the candidate set.

Canal has no analog (⊘ rows in SURVEY.md §2) — these are the
engine-beyond-reference operators the pipeline needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^31-1: keeps a*h + b within int64 under ANSI overflow checks
# (a, b, h all reduced below 2^31 before the multiply)
MERSENNE_PRIME = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: one surviving id + the
    duplicate count per distinct text (hash-groupBy; map-side partial
    aggregation makes hot duplicates cheap)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(df: DataFrame, text_col: str = "text", w: int = 3) -> DataFrame:
    """Adds `shingles: array<string>` — w-word shingles (whole doc when
    shorter than w words)."""
    words = F.split(F.col(text_col), " ")
    shingled = F.transform(
        F.sequence(F.lit(0), F.size(words) - w),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, w)),
    )
    return df.withColumn(
        "shingles",
        F.when(F.size(words) >= w, shingled).otherwise(F.array(F.concat_ws(" ", words))),
    )


def _minhash_coefs(num_perm: int, seed: int) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MERSENNE_PRIME), rnd.randrange(MERSENNE_PRIME))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 16,
    seed: int = 42,
    method: str = "scan",
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature over `shingles`.

    Universal-hash family h_j(x) = (a_j * xxhash64(x) + b_j) mod p;
    the j-th signature element is the min over the doc's shingles.

    Two physically different plans compute the SAME values (pytest
    asserts element equality):

    - method="scan" (default): one fold over the shingle array per row
      — `aggregate(transform(shingles, xxhash64), [p]*k,
      zip_with(acc, coefs, least))`. Zero explode, zero shuffle, zero
      aggregation state: the signature is a scan-side projection, so
      at corpus scale the minhash stage adds NOTHING to the shuffle
      plan (the downstream band join is the first exchange).
    - method="agg": explode shingles -> algebraic MIN aggregation
      (partial agg before shuffle). Kept for A/B and as the fallback
      shape if a corpus ever hits HOF-interpretation overhead.

    Measured (sf0.1 documents + planted dupes, 5,010 docs, dedicated
    JVM, best-of-4 after warmup): signature stage scan 2.08 s vs agg
    3.18 s (1.53x); full dedup_minhash_lsh pipeline 5.33 s vs 5.84 s
    (1.10x — the exact-Jaccard verify dominates the rest). The scan
    shape's structural win is at corpus scale: the agg path's explode
    materializes one row per (doc, shingle) and carries a hash-agg
    state per doc, while scan adds zero rows, zero exchanges, and
    zero agg state to whatever plan it rides on."""
    coefs = _minhash_coefs(num_perm, seed)
    p = F.lit(MERSENNE_PRIME)
    if method == "scan":
        ca = F.array(
            *[
                F.struct(
                    F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b")
                )
                for a, b in coefs
            ]
        )
        hashed = F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), p))
        init = F.array_repeat(F.lit(MERSENNE_PRIME).cast("long"), num_perm)
        sig = F.aggregate(
            hashed,
            init,
            lambda acc, h: F.zip_with(
                acc, ca, lambda m, c: F.least(m, F.pmod(c["a"] * h + c["b"], p))
            ),
        )
        return df.select(id_col, sig.alias("sig"))
    ex = df.select(id_col, F.explode("shingles").alias("sh")).withColumn(
        "h", F.pmod(F.xxhash64("sh"), p)
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), p)).alias(f"m{j}")
        for j, (a, b) in enumerate(coefs)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"m{j}" for j in range(num_perm)]).alias("sig"))


def lsh_bands(sig_df: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """(id, band_idx, band_key) — the LSH band index rows for a
    signature frame (band_key = hash of a signature slice). This is
    both the self-join key space of `lsh_candidate_pairs` and the
    persistent probe index an incremental deduper carries between
    batches (`IncrementalDeduper`)."""
    num_perm_col = F.size(F.col("sig"))
    rows_per_band = (num_perm_col / bands).cast("int")
    return (
        sig_df.select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_idx"),
            F.col("sig"),
        )
        .withColumn(
            "band_key",
            F.xxhash64(
                "band_idx",
                F.slice(F.col("sig"), F.col("band_idx") * rows_per_band + 1, rows_per_band),
            ),
        )
        .select(id_col, "band_idx", "band_key")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", bands: int = 4
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: docs sharing at least one
    LSH band (band = hash of a signature slice). The self-join key is
    (band_idx, band_key) — bounded buckets, no cross join."""
    banded = lsh_bands(sig_df, id_col=id_col, bands=bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, id_col: str = "doc_id", min_jaccard: float = 0.7
) -> DataFrame:
    """Exact Jaccard over shingle SETS for the candidate pairs only.
    Intersection via a shingle equi-join (shuffle on shingle hash),
    set sizes via per-doc distinct counts — no arrays collected.

    The exploded-shingle relation is semi-joined to the candidate id
    set FIRST, so the big per-corpus explode is pruned before any
    shuffle: at scale the candidate set is a vanishing fraction of the
    corpus, and shuffling every document's shingles to verify a few
    pairs would dominate the whole job."""
    cand_ids = (
        pairs.select(F.col("id_a").alias("_id"))
        .unionByName(pairs.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    ex = (
        shingled.select(F.col(id_col).alias("_id"), F.explode("shingles").alias("sh"))
        .join(cand_ids, "_id", "left_semi")
        .distinct()
    )
    sizes = ex.groupBy("_id").agg(F.count("*").alias("sz"))
    ex_b = ex.select(F.col("_id").alias("id_b"), F.col("sh"))
    inter = (
        pairs.join(ex.select(F.col("_id").alias("id_a"), "sh"), "id_a")
        .join(ex_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash from word hashes, built
    entirely from JVM aggregates: per bit i, the sign of
    sum(+1/-1 over words by bit i of xxhash64(word))."""
    ex = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")).withColumn(
        "h", F.xxhash64("w")
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = ex.groupBy(id_col).agg(*bit_aggs)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseOR(term)
    return agg.select(id_col, sim.alias("simhash"))


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash: block the 64-bit hash into `blocks`
    slices (pigeonhole: <= max_hamming diffs => some block equal),
    equi-join per block, verify with bit_count(xor)."""
    width = 64 // blocks
    mask = (1 << width) - 1
    blocked = sim_df.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("blk"),
    ).withColumn(
        # pyspark's shiftright wrapper takes a literal shift; the SQL
        # builtin accepts an expression
        "blk_key",
        F.expr(f"shiftright(simhash, CAST(blk * {width} AS INT))").bitwiseAND(F.lit(mask)),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, ["blk", "blk_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.5,
    max_df: int = 64,
    min_shared: int = 3,
) -> DataFrame:
    """Word-n-gram Jaccard near-dup pairs via a document-frequency-capped
    gram join + exact verify (P4's scale path).

    Candidate generation:
    1. distinct word n-gram shingles per doc;
    2. per-gram document frequency; grams with df > `max_df` (corpus
       boilerplate) or df == 1 (can't witness a pair) are dropped —
       the self-join on the surviving grams is EXPLICITLY bounded at
       C(max_df, 2) pairs per gram, so no hot gram can degenerate the
       join toward all-pairs (the r1 defect);
    3. pairs must share >= least(min_shared, |A|, |B|) surviving grams.
       Recall-safe for the threshold: j >= 0.8 forces
       |A∩B| >= 0.44(|A|+|B|) >= 0.89*min(|A|,|B|), so every true pair
       clears the floor unless its intersection is made ENTIRELY of
       dropped boilerplate grams (such boilerplate-only dupes are
       exact-dedup/minhash territory, documented limitation).
    4. exact Jaccard over the FULL shingle sets (threshold semantics
       unchanged by the df cap) via jaccard_verify.

    For char-unit grams over corpora with a tiny gram universe, use
    char_ngram_jaccard_pairs (MinHash-banded) instead: char grams are
    near-universal, so a gram-keyed join has no usable df regime.

    The Jaccard is EXACT despite the cap: the intersection is
    n_shared (capped grams, free from candidate generation) plus a
    hot-gram completion join restricted to the candidate docs — no
    full-corpus re-explode in the verify phase."""
    base = word_shingles(df, text_col=text_col, w=n).select(
        F.col(id_col).alias("_id"), F.array_distinct("shingles").alias("shingles")
    )
    ex = base.select("_id", F.explode("shingles").alias("sh"))
    dfc = ex.groupBy("sh").agg(F.count("*").alias("df"))
    # no broadcast hint: the gram-frequency relation is corpus-sized at
    # scale; the join is keyed on sh (reuses dfc's exchange) and AQE
    # picks broadcast when it happens to be small
    ex_df = ex.join(dfc, "sh")
    exk = ex_df.filter((F.col("df") >= 2) & (F.col("df") <= max_df)).select("_id", "sh")
    a = exk.select(F.col("_id").alias("id_a"), "sh")
    b = exk.select(F.col("_id").alias("id_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    # set sizes are a FREE narrow projection off the distinct'd shingle
    # arrays — re-aggregating the exploded-gram relation here would be
    # an avoidable corpus-scale shuffle (jaccard_verify's identical
    # groupBy is fine because there `ex` is candidate-pruned first)
    sizes = base.select("_id", F.size("shingles").alias("sz"))
    cands = (
        shared.join(sizes.select(F.col("_id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .filter(
            F.col("n_shared") >= F.least(F.lit(min_shared), F.col("sz_a"), F.col("sz_b"))
        )
    )
    # exact-intersection completion: shared grams ABOVE the cap, counted
    # only for candidate docs (semi-join prunes the hot explode first)
    cand_ids = (
        cands.select(F.col("id_a").alias("_id"))
        .unionByName(cands.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    hot = (
        ex_df.filter(F.col("df") > max_df)
        .select("_id", "sh")
        .join(cand_ids, "_id", "left_semi")
    )
    inter_hot = (
        cands.select("id_a", "id_b")
        .join(hot.select(F.col("_id").alias("id_a"), "sh"), "id_a")
        .join(hot.select(F.col("_id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_hot"))
    )
    inter = F.col("n_shared") + F.col("n_hot")
    return (
        cands.join(inter_hot, ["id_a", "id_b"], "left")
        .withColumn("n_hot", F.coalesce(F.col("n_hot"), F.lit(0)))
        .withColumn(
            "jaccard",
            inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter).cast("double"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def char_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingles: array<string>) — distinct character n-grams."""
    # substring with a dynamic start needs expr-form (F.substring start is literal-only)
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
            f" i -> substring({text_col}, i, {n}))"
        )
    )
    return df.select(id_col, grams.alias("shingles"))


def char_ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 3,
    min_jaccard: float = 0.5,
    num_perm: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs: MinHash-banded
    candidate generation over the char shingles + exact Jaccard verify
    on the candidates only.

    Candidates deliberately do NOT come from an exploded-gram self-join
    (the r1 formulation): common 3-grams ("the", "ing") occur in nearly
    every document of a language, so any per-gram equi-join degenerates
    toward all-pairs at corpus scale no matter the blocking key. Band
    signatures collide only for near-identical shingle SETS, so the
    candidate join stays bounded; `bands`/`num_perm` give
    P(candidate) = 1-(1-j^r)^b with r = num_perm/bands (r=2, b=8:
    j=0.8 -> 0.9997, j=0.3 -> 0.53 — and false candidates are removed
    by the exact verify).

    `block_col` is accepted for API compatibility and ignored: the
    band key already separates dissimilar documents regardless of
    language.

    Degenerate-universe caveat (measured): banding selectivity assumes
    a large shingle universe. On a corpus whose char-n-gram universe is
    tiny (the synthetic test corpus has only 388 distinct 3-grams, so
    most documents share most grams), MinHash signatures concentrate
    and ~82% of ALL pairs collide in some band at r=2 — the candidate
    set becomes a large corpus fraction and the exact verify, while
    keeping the ANSWER correct, does near-all-pairs work. Real text
    corpora (universe ~alphabet^n, power-law gram frequencies) do not
    look like this; if yours does, raise `n` (grows the universe
    exponentially) or use word-unit `ngram_jaccard_pairs`, whose df
    cap bounds the work regardless of universe size."""
    base = char_shingles(df, text_col=text_col, id_col=id_col, n=n)
    sig = minhash_signatures(base, id_col=id_col, num_perm=num_perm)
    pairs = lsh_candidate_pairs(sig, id_col=id_col, bands=bands)
    return jaccard_verify(pairs, base, id_col=id_col, min_jaccard=min_jaccard)


def _components_driver(edges: DataFrame, nodes: DataFrame, id_col: str) -> DataFrame:
    """Small-graph path of `connected_components`: min-root union-find
    over the collected edge relation, labels broadcast back as a
    literal frame. Semantics identical to the distributed rounds
    (cluster_id = min id reachable); consumes and releases `edges`."""
    try:
        rows = edges.select("src", "dst").collect()
        src_type = edges.schema["src"].dataType
    finally:
        edges.unpersist()

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["src"], r["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # the min id is the root == the component label

    if not parent:
        return nodes.select(F.col(id_col)).withColumn("cluster_id", F.col(id_col))
    from pyspark.sql.types import StructField, StructType

    spark = nodes.sparkSession
    labels = spark.createDataFrame(
        [(n, find(n)) for n in parent],
        StructType([StructField("node", src_type), StructField("lbl", src_type)]),
    )
    return (
        nodes.select(F.col(id_col))
        .join(F.broadcast(labels), nodes[id_col] == labels.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("lbl"), F.col(id_col)).alias("cluster_id"),
        )
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    driver_threshold_edges: int = 1_000_000,
) -> DataFrame:
    """(id, cluster_id) — transitive near-duplicate CLUSTERS from the
    pairwise detector output: cluster_id = min id reachable through
    the pair graph (every node not in any pair is its own cluster).
    Pairwise drop rules under-deduplicate (A~B, B~C but A!~C keeps
    both A and C unless the chain collapses); corpus dedup at scale
    keeps ONE canonical doc per connected component.

    Algorithm: min-label propagation — each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(component diameter) rounds. Near-dup components are small and
    shallow by construction (they are near-copies of one document), so
    the round count is tiny and each round is one shuffle of the EDGE
    relation (candidate pairs only — a vanishing fraction of the
    corpus; the corpus-sized `nodes` frame joins in once at the end).
    The loop's only driver-side action is the per-round convergence
    check on the (small) label frame.

    Small-graph fast path: with at most `driver_threshold_edges`
    edges, the edge relation (already a vanishing fraction of the
    corpus — it is the candidate-pair set) is collected once and
    components come from a driver-side min-root union-find, with the
    labels broadcast back as a literal frame. Measured at sf0.1
    (refine_corpus near-dup stage, dedicated JVM): the distributed
    rounds cost ~5 s in per-round job overhead for a few-hundred-edge
    graph; the fast path makes clustering ~free next to the detector.
    1M edges ≈ tens of MB on the driver — the same order as a
    broadcast dimension. The distributed rounds remain the path for
    genuinely large candidate graphs (threshold 0 forces them; the
    pytest parity suite runs both paths on the same input).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    try:
        if edges.count() <= driver_threshold_edges:
            return _components_driver(edges, nodes, id_col)
    except Exception:
        edges.unpersist()
        raise
    # every round's labels are localCheckpoint(eager)ed: it truncates
    # the LOGICAL plan, not just the computation — a persisted frame
    # still nests its full lineage, so round N's plan would contain all
    # N-1 prior rounds and the analyzer OOMs the driver past ~12 rounds
    # (found by the pytest parity test on a random 150-edge graph).
    # Checkpointing per round keeps every plan one-round deep; the
    # superseded checkpoints become unreferenced and the context
    # cleaner reclaims them. This also truncates the RESULT plan, so
    # the returned frame outlives the `edges` cache release.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            neigh = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("node2"))
                .agg(F.min("lbl").alias("nmin"))
            )
            new_labels = (
                labels.join(neigh, labels.node == neigh.node2, "left")
                .select(
                    "node",
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))
                    ).alias("lbl"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components: no convergence in {max_iter} rounds "
                "(component diameter exceeds the bound — raise max_iter)"
            )
        return (
            nodes.select(F.col(id_col))
            .join(labels, nodes[id_col] == labels.node, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("lbl"), F.col(id_col)).alias("cluster_id"),
            )
        )
    finally:
        edges.unpersist()


class IncrementalDeduper:
    """Streaming/CDC near-duplicate dedup: documents arrive in batches
    (epochs), and each batch is deduplicated against BOTH itself and
    everything retained so far — first arrival wins. This is the
    continuous-ingestion counterpart of the batch `refine_corpus`
    near-dup stage: at 10^10-doc corpus scale you cannot re-run corpus-
    wide dedup per ingest epoch, so per epoch only the NEW documents
    are shingled/hashed, and the corpus participates solely through a
    persistent LSH band index probed by an equi-join.

    Survivor rule (one rule covers direct hits, within-batch dups, and
    transitive chains): build the verified near-dup graph over
    {new batch ∪ matched retained docs} with retained ids encoded
    BELOW every new id (new id -> id + id_offset); a new doc survives
    iff it is the minimum of its connected component. A component
    containing any retained doc therefore drops all its new members
    (retained keys are smaller by construction), and a retained-free
    component keeps exactly its min-id member — the same canonical
    choice `refine_corpus` makes in batch mode.

    Scale posture (100 TB):
    - per-batch work is O(|new|): shingling + scan-side MinHash touch
      only the batch; the corpus is NEVER re-read;
    - the state is two append-only relations — the band index
      (doc_id, band_idx, band_key) and the retained shingle sets — so
      a real deployment stores them as bucketed tables (band index
      bucketed by band_key: the probe join is then shuffle-free on
      the corpus side) and appends survivors per epoch; here they are
      DataFrames re-rooted per batch with localCheckpoint so the plan
      does not grow with epoch count (the same bounded-lineage rule
      the CDC engine enforces);
    - the probe join keys on (band_idx, band_key): the small NEW side
      broadcasts, candidates are band collisions only, and exact
      Jaccard verification is candidate-pruned exactly as in
      `jaccard_verify` (the retained shingle relation is semi-joined
      to candidate ids before any shuffle).

    Persistence (`state_dir`): with a state directory the retained
    state lives on disk and the deduper is resumable from a cold JVM,
    under the same commit discipline as the table layer — each batch's
    survivor bands/shingles are written to `batch=<id>/` dirs FIRST,
    then an exclusive completion marker (`os.link`, EEXIST ⇒ already
    committed) publishes the batch. A crash between the two leaves an
    unmarked dir the next run overwrites; re-observing a completed
    batch id is an idempotent no-op that returns the recorded
    survivors (exactly-once per batch, T2-style); out-of-order batch
    ids raise (T3 sequential-ack analog). The per-batch log is bounded
    by `compact_state` (fold into a `_src_batch`-tagged base under the
    same marker discipline — semantically invisible, replay-preserving,
    crash-safe at every interleaving).

    Canal analog: none (⊘) — this is the engine-beyond-reference
    operator family of SURVEY §2.11 composed with the CDC epoch model
    (axes A+B: change-data ingest × training-data curation).
    """

    def __init__(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_jaccard: float = 0.8,
        num_perm: int = 16,
        bands: int = 8,
        id_offset: int = 1 << 40,
        state_dir: str | None = None,
    ) -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.min_jaccard = min_jaccard
        self.num_perm = num_perm
        self.bands = bands
        self.id_offset = id_offset
        self.state_dir = state_dir
        if state_dir is not None:
            import os

            os.makedirs(state_dir, exist_ok=True)
        self._bands: DataFrame | None = None  # (id, band_idx, band_key)
        self._shingled: DataFrame | None = None  # (id, shingles)

    # -- persistent-state plumbing -------------------------------------
    def _completed(self) -> list[int]:
        import os
        import re

        if self.state_dir is None or not os.path.isdir(self.state_dir):
            return []
        out = []
        for name in os.listdir(self.state_dir):
            m = re.fullmatch(r"_batch_(\d+)\.done", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _latest_base(self) -> int | None:
        """Highest published compaction base (`_base_<k>.done` asserts
        `base=<k>/` holds the union of survivors of all batches <= k,
        tagged with their source batch id). None before any compaction."""
        import os
        import re

        if self.state_dir is None or not os.path.isdir(self.state_dir):
            return None
        ks = [
            int(m.group(1))
            for name in os.listdir(self.state_dir)
            if (m := re.fullmatch(r"_base_(\d+)\.done", name))
        ]
        return max(ks) if ks else None

    def _schemas(self):
        import json
        import os

        from pyspark.sql.types import StructType

        path = os.path.join(self.state_dir, "schema.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            d = json.load(f)
        return (
            StructType.fromJson(json.loads(d["bands"])),
            StructType.fromJson(json.loads(d["shingled"])),
        )

    def _tagged_schemas(self):
        from pyspark.sql.types import LongType, StructField, StructType

        sch = self._schemas()
        if sch is None:
            return None
        tag = StructField("_src_batch", LongType())
        return (
            StructType(list(sch[0].fields) + [tag]),
            StructType(list(sch[1].fields) + [tag]),
        )

    def _disk_state_tagged(self, spark, completed: list[int]):
        """(bands, shingled) with a `_src_batch` attribution column:
        the latest published base (if any) plus the per-batch dirs
        after it — explicit schemas so an all-dropped batch (empty
        parquet dir) reads back as an empty frame instead of failing
        inference."""
        sch = self._schemas()
        if not completed or sch is None:
            return None, None
        bands_sch, sh_sch = sch
        base = self._latest_base()
        parts_b, parts_s = [], []
        if base is not None:
            tb, ts = self._tagged_schemas()
            bdir = self._base_dir(base)
            parts_b.append(spark.read.schema(tb).parquet(f"{bdir}/bands"))
            parts_s.append(spark.read.schema(ts).parquet(f"{bdir}/shingles"))
        tail = [i for i in completed if base is None or i > base]
        for i in tail:
            bdir = self._batch_dir(i)
            parts_b.append(
                spark.read.schema(bands_sch)
                .parquet(f"{bdir}/bands")
                .withColumn("_src_batch", F.lit(i).cast("long"))
            )
            parts_s.append(
                spark.read.schema(sh_sch)
                .parquet(f"{bdir}/shingles")
                .withColumn("_src_batch", F.lit(i).cast("long"))
            )
        from functools import reduce

        return (
            reduce(lambda x, y: x.unionByName(y), parts_b),
            reduce(lambda x, y: x.unionByName(y), parts_s),
        )

    def _disk_state(self, spark, completed: list[int]):
        b, s = self._disk_state_tagged(spark, completed)
        if b is None:
            return None, None
        return b.drop("_src_batch"), s.drop("_src_batch")

    def _publish(self, marker_name: str, payload: dict) -> bool:
        """Exclusive marker publish (unique tmp + `os.link`); False if
        another writer committed this marker first. The payload's
        `dir` entry names the authoritative data directory: writers
        write to UNIQUELY-named dirs and the marker election decides
        which one readers see, so no writer ever overwrites or deletes
        a directory another writer published or is still writing —
        the losing writer discards only its own dir. (A crash between
        dir write and publish orphans one unreferenced dir; orphans
        are bounded by crash count and swept when their batch range is
        compacted away.)"""
        import json
        import os
        import uuid

        marker = os.path.join(self.state_dir, marker_name)
        tmp = f"{marker}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        try:
            os.link(tmp, marker)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _marker_dir(self, marker_name: str, legacy: str) -> str:
        """Authoritative data dir recorded in a published marker
        (markers written before the unique-dir protocol carried no
        payload — fall back to the fixed-name dir)."""
        import json
        import os

        try:
            with open(os.path.join(self.state_dir, marker_name)) as f:
                return os.path.join(self.state_dir, json.load(f)["dir"])
        except (OSError, ValueError, KeyError, TypeError):
            return os.path.join(self.state_dir, legacy)

    def _batch_dir(self, batch_id: int) -> str:
        return self._marker_dir(f"_batch_{batch_id}.done", f"batch={batch_id}")

    def _base_dir(self, k: int) -> str:
        return self._marker_dir(f"_base_{k}.done", f"base={k}")

    def observe(self, new_docs: DataFrame, batch_id: int | None = None) -> DataFrame:
        """Deduplicate one arriving batch; returns the batch's
        survivor ids (one column, `id_col`) and appends them to the
        retained state. Ids must be NUMERIC, globally unique and
        < id_offset (the retained-below-new encoding is arithmetic;
        string-keyed tables map ids exactly — e.g. strip a prefix —
        rather than hashing, which collides at corpus scale).
        With `state_dir`, `batch_id` is required: completed ids replay
        idempotently, ids below the high-water mark raise."""
        import os

        idc = self.id_col
        spark = new_docs.sparkSession
        completed: list[int] = []
        if self.state_dir is not None:
            if batch_id is None:
                raise ValueError("batch_id is required when state_dir is set")
            completed = self._completed()
            if batch_id in completed:
                sch = self._schemas()
                bdir = f"{self._batch_dir(batch_id)}/bands"
                if os.path.isdir(bdir):
                    return spark.read.schema(sch[0]).parquet(bdir).select(idc).distinct()
                # the batch dir was folded into a compaction base; the
                # `_src_batch` tag preserves per-batch replay
                tb, _ = self._tagged_schemas()
                return (
                    spark.read.schema(tb)
                    .parquet(f"{self._base_dir(self._latest_base())}/bands")
                    .filter(F.col("_src_batch") == batch_id)
                    .select(idc)
                    .distinct()
                )
            if completed and batch_id < completed[-1]:
                raise ValueError(
                    f"batch {batch_id} arrived after batch {completed[-1]} "
                    "was committed (out of order)"
                )
            ret_bands, ret_sh = self._disk_state(spark, completed)
        else:
            ret_bands, ret_sh = self._bands, self._shingled

        off = F.lit(self.id_offset)
        sh_new = word_shingles(new_docs.select(idc, self.text_col), self.text_col)
        sh_new = sh_new.select(idc, "shingles").localCheckpoint(eager=True)
        sig = minhash_signatures(sh_new, id_col=idc, num_perm=self.num_perm)
        b_new = lsh_bands(sig, id_col=idc, bands=self.bands)

        # candidate edges, already in encoded-id space: within-batch
        # band collisions (both ends + offset) and probe hits against
        # the retained band index (retained end keeps its raw id)
        a, b = b_new.alias("a"), b_new.alias("b")
        cand = (
            a.join(b, ["band_idx", "band_key"])
            .filter(F.col(f"a.{idc}") < F.col(f"b.{idc}"))
            .select(
                (F.col(f"a.{idc}") + off).alias("id_a"),
                (F.col(f"b.{idc}") + off).alias("id_b"),
            )
        )
        sh_all = sh_new.select((F.col(idc) + off).alias(idc), "shingles")
        if ret_bands is not None:
            probe = (
                b_new.alias("n")
                .join(ret_bands.alias("r"), ["band_idx", "band_key"])
                .select(
                    (F.col(f"n.{idc}") + off).alias("id_a"),
                    F.col(f"r.{idc}").alias("id_b"),
                )
            )
            cand = cand.unionByName(probe)
            sh_all = sh_all.unionByName(ret_sh)
        cand = cand.distinct()

        verified = jaccard_verify(
            cand, sh_all, id_col=idc, min_jaccard=self.min_jaccard
        ).select("id_a", "id_b")
        labels = connected_components(
            verified, sh_all.filter(F.col(idc) >= self.id_offset), id_col=idc
        )
        survivors = (
            labels.filter(F.col("cluster_id") == F.col(idc))
            .select((F.col(idc) - off).alias(idc))
            .localCheckpoint(eager=True)
        )

        surv_bands = b_new.join(survivors, idc, "left_semi")
        surv_sh = sh_new.join(survivors, idc, "left_semi")
        if self.state_dir is not None:
            # data into a UNIQUE dir first (a crash orphans an
            # unreferenced dir; nothing a concurrent writer published
            # can be torn), exclusive marker election last — the
            # marker payload names the winning dir
            import json
            import shutil
            import uuid

            dname = f"batch={batch_id}.{uuid.uuid4().hex[:8]}"
            ddir = os.path.join(self.state_dir, dname)
            surv_bands.write.mode("overwrite").parquet(f"{ddir}/bands")
            surv_sh.write.mode("overwrite").parquet(f"{ddir}/shingles")
            sch_path = os.path.join(self.state_dir, "schema.json")
            if not os.path.exists(sch_path):
                with open(sch_path + ".tmp", "w") as f:
                    json.dump(
                        {
                            "bands": surv_bands.schema.json(),
                            "shingled": surv_sh.schema.json(),
                        },
                        f,
                    )
                os.replace(sch_path + ".tmp", sch_path)
            if not self._publish(
                f"_batch_{batch_id}.done", {"batch_id": batch_id, "dir": dname}
            ):
                # a concurrent writer committed this batch first — its
                # result is authoritative (ours is byte-equivalent by
                # determinism but must not double-publish); discard
                # only OUR dir and replay from the winner's
                shutil.rmtree(ddir, ignore_errors=True)
                return self.observe(new_docs, batch_id)
            return survivors

        # in-memory mode: append survivors to the retained state,
        # re-rooted so lineage stays O(1) in the number of batches
        if self._bands is None:
            self._bands = surv_bands.localCheckpoint(eager=True)
            self._shingled = surv_sh.localCheckpoint(eager=True)
        else:
            self._bands = self._bands.unionByName(surv_bands).localCheckpoint(eager=True)
            self._shingled = self._shingled.unionByName(surv_sh).localCheckpoint(eager=True)
        return survivors

    def compact_state(
        self, spark, n_files: int = 8, remove_compacted: bool = True
    ) -> int | None:
        """Fold the log-structured per-batch survivor dirs into ONE
        base relation (`base=<k>/bands`, `/shingles`, tagged with
        `_src_batch` so idempotent replay of old batch ids keeps
        working) under the table layer's commit discipline: data dirs
        first, exclusive `os.link` marker last. A crash before the
        marker leaves an invisible dir; the per-batch dirs are removed
        only AFTER the marker publishes, so every intermediate state
        resolves correctly. Returns the covered high batch id (None if
        nothing to compact); already-fully-compacted is a no-op.

        Why it matters at scale: one batch per CDC epoch means the
        state grows two parquet dirs per epoch forever — after 10^5
        epochs a cold resume lists and plans 2x10^5 inputs. Compaction
        bounds that to O(n_files + batches since last compact), the
        same small-file bound the table layer's compact_files gives
        data buckets. A real deployment would write the base bucketed
        by band_key so the probe join is shuffle-free on the corpus
        side; here the rewrite repartitions to `n_files`."""
        import os
        import shutil

        if self.state_dir is None:
            raise ValueError("compact_state requires state_dir")
        completed = self._completed()
        if not completed:
            return None
        upto = completed[-1]
        prev = self._latest_base()
        if prev == upto:
            return upto
        import glob
        import uuid

        bands, sh = self._disk_state_tagged(spark, completed)
        dname = f"base={upto}.{uuid.uuid4().hex[:8]}"
        ddir = os.path.join(self.state_dir, dname)
        bands.repartition(n_files).write.mode("overwrite").parquet(f"{ddir}/bands")
        sh.repartition(n_files).write.mode("overwrite").parquet(f"{ddir}/shingles")
        if not self._publish(f"_base_{upto}.done", {"base": upto, "dir": dname}):
            # a concurrent compactor published this base first —
            # identical content by determinism; discard only OUR dir
            # and let its flags govern
            shutil.rmtree(ddir, ignore_errors=True)
            return upto
        if remove_compacted:
            for i in completed:
                # the authoritative dir plus any crash-orphaned
                # unique-named dirs for the same batch id
                for d in glob.glob(
                    os.path.join(self.state_dir, f"batch={i}")
                ) + glob.glob(os.path.join(self.state_dir, f"batch={i}.*")):
                    shutil.rmtree(d, ignore_errors=True)
            if prev is not None:
                for d in glob.glob(
                    os.path.join(self.state_dir, f"base={prev}")
                ) + glob.glob(os.path.join(self.state_dir, f"base={prev}.*")):
                    shutil.rmtree(d, ignore_errors=True)
                # missing_ok: a crashed predecessor may have removed the
                # dir but not the marker (or vice versa) — both orders
                # resolve, _latest_base always takes the max
                import pathlib

                pathlib.Path(self.state_dir, f"_base_{prev}.done").unlink(missing_ok=True)
        return upto

    def retained_ids(self, spark=None) -> DataFrame | None:
        """Ids retained so far (None before the first batch). Disk
        mode needs the `spark` handle; in-memory mode ignores it."""
        if self.state_dir is not None:
            completed = self._completed()
            _, sh = self._disk_state(spark, completed)
            return None if sh is None else sh.select(self.id_col)
        return None if self._shingled is None else self._shingled.select(self.id_col)

    @property
    def retained(self) -> DataFrame | None:
        """In-memory-mode alias of retained_ids()."""
        if self.state_dir is not None:
            raise ValueError(
                "state_dir mode needs a session handle: use retained_ids(spark)"
            )
        return self.retained_ids()
