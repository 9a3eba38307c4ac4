"""Driver contract for the spark-graft builder (PySpark target).

entry()      -> flagship CDC collapse on sf0.001
queries()    -> every implemented operator from SURVEY.md §2 plus the
                training-data ops (dedup / similarity / text analysis)
oracle_sql() -> matching ANSI SQL for DuckDB (omitted only for ops
                that are genuinely not SQL-expressible: the hash-family
                LSH dedup/ANN pair sets and the multimodal binary
                stub; since r4 the exactly-once / schema-evolution /
                stateful-gate protocols and the HLL sketch check their
                outcome invariants against boolean/VALUES oracles)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from canal_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins collapse with tombstones over the
    sf0.001 events-as-changelog, enriched against the customer dim —
    the final-state upsert semantics of the engine's MERGE kernel."""
    from pyspark.sql import functions as F

    from canal_spark.queries import merge_upsert_final_state
    from canal_spark.sources.cdc_mapping import load

    sf = "/root/testdata/sf0.001"
    state = merge_upsert_final_state(spark, sf)
    cust = load(spark, sf, "customer")
    return state.join(
        F.broadcast(cust), state.key == cust.c_custkey, "left"
    ).select("key", "last_lsn", "last_value", "c_name", "c_mktsegment")


#: round-4 rotation (pure reordering, VERDICT r3 task 6): lead with the
#: 24 names the r3 driver sample skipped (the long-green r1/r2 tail),
#: then the r4 additions/conversions (new or changed contracts —
#: decontaminate_corpus is new; refine_corpus grew a near-dup stage;
#: four rows-only queries converted to boolean/VALUES oracles), then
#: the rest.
_SAMPLE_FIRST = [
    # unsampled in CORRECTNESS_r03
    "union_multi_source",
    "state_diff_except",
    "cast_types_roundtrip",
    "ddl_classify",
    "tokens_invariant_ntok",
    "pandas_udf_token_transform",
    "client_cursor_state",
    "xa_rollback_replay",
    "exactly_once_reapply_noop",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "embedding_neardup_cosine",
    "pack_sequences",
    "winnowing_fingerprints",
    "lang_id_heuristic",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "multimodal_frame_sample",
    "multimodal_decode_stub",
    # new or contract-changed in r4
    "decontaminate_corpus",
    "point_lookup_file_skipping",
    "shuffle_shards",
    "sample_stratified",
    "intra_doc_repetition",
    "mix_corpora",
    "dedup_cluster_assign",
    "refine_corpus",
    "approx_distinct_keys",
    "schema_evolution_replay",
    "stateful_stream_gate",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _SAMPLE_FIRST if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
