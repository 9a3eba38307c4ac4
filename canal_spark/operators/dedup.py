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


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — MinHash signature over `shingles`.

    Universal-hash family h_j(x) = (a_j * xxhash64(x) + b_j) mod p;
    the j-th signature element is the min over the doc's shingles —
    an algebraic MIN aggregation (partial agg before shuffle)."""
    import random

    rnd = random.Random(seed)
    coefs = [(rnd.randrange(1, MERSENNE_PRIME), rnd.randrange(MERSENNE_PRIME)) for _ in range(num_perm)]
    ex = df.select(id_col, F.explode("shingles").alias("sh")).withColumn(
        "h", F.pmod(F.xxhash64("sh"), F.lit(MERSENNE_PRIME))
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE_PRIME))).alias(f"m{j}")
        for j, (a, b) in enumerate(coefs)
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"m{j}" for j in range(num_perm)]).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str = "doc_id", bands: int = 4
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs: docs sharing at least one
    LSH band (band = hash of a signature slice). The self-join key is
    (band_idx, band_key) — bounded buckets, no cross join."""
    num_perm_col = F.size(F.col("sig"))
    rows_per_band = (num_perm_col / bands).cast("int")
    banded = (
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
    set sizes via per-doc distinct counts — no arrays collected."""
    ex = (
        shingled.select(F.col(id_col).alias("_id"), F.explode("shingles").alias("sh"))
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


def char_ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """n-gram (character) Jaccard near-dup pairs, blocked by a cheap
    key (e.g. lang) to bound the candidate join."""
    # substring with a dynamic start needs expr-form (F.substring start is literal-only)
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
            f" i -> substring({text_col}, i, {n}))"
        )
    )
    base = df.select(id_col, *( [block_col] if block_col else [] ), grams.alias("shingles"))
    ex = base.select(
        F.col(id_col).alias("_id"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
        F.explode("shingles").alias("sh"),
    )
    sizes = ex.groupBy("_id").agg(F.count("*").alias("sz"))
    join_keys = ["sh"] + (["_blk"] if block_col else [])
    a = ex.select(*[F.col(c) for c in (["_blk"] if block_col else [])], F.col("_id").alias("id_a"), "sh")
    b = ex.select(*[F.col(c) for c in (["_blk"] if block_col else [])], F.col("_id").alias("id_b"), "sh")
    inter = (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
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
