"""Driver contract for the spark-graft builder (PySpark target).

entry()      -> flagship CDC collapse on sf0.001
queries()    -> every implemented operator from SURVEY.md §2 plus the
                training-data ops (dedup / similarity / text analysis)
oracle_sql() -> matching ANSI SQL for DuckDB, for EVERY queries()
                entry (rows-only surface reached zero in r5):
                relational ops get row-level oracles; protocol and
                hash-family ops check their outcome INVARIANTS against
                boolean/VALUES oracles — exactly-once, schema
                evolution, stateful gate, HLL, the dedup pair sets
                (soundness + planted recall), LSH/IVF top-k (a planted
                identical copy must route to the query's bucket/list
                and return at rank 1) — and the word-n-gram pair set
                and the deterministic multimodal decode stub are fully
                row-level despite being "custom" ops
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


#: round-6 rotation (pure reordering, VERDICT r5 task 5): lead with the
#: EXACT 50 names the r5 driver sample skipped (the complement of
#: CORRECTNESS_r05.json's keys, duplicates removed) — completing
#: driver-green coverage of all 100 names within the two-round
#: rotation, including `rdb_sink_parity` (never driver-sampled) and
#: the four r5 local-only oracle conversions.
_SAMPLE_FIRST = [
    # unsampled in CORRECTNESS_r05 (50 names)
    "scan_changelog",
    "scan_lsn_range",
    "json_extract_props",
    "resume_after_checkpoint",
    "late_event_dropped",
    "initial_snapshot_rowcount",
    "filter_op_types",
    "filter_heartbeats",
    "filter_regex_whitelist",
    "filter_regex_blacklist",
    "project_field_filter",
    "lww_dedup_last_event",
    "merge_upsert_final_state",
    "antijoin_deletes",
    "semijoin_active_keys",
    "approx_distinct_keys",
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
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_assign",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "embedding_neardup_cosine",
    "pack_sequences",
    "rdb_sink_parity",
    "refine_corpus",
    "winnowing_fingerprints",
    "lang_id_heuristic",
    "quality_score",
    "token_count",
    "point_lookup_file_skipping",
    "decontaminate_corpus",
    "intra_doc_repetition",
    "mix_corpora",
    "shuffle_shards",
    "sample_stratified",
    "doc_fingerprint",
    "multimodal_frame_sample",
    "multimodal_decode_stub",
    "stateful_stream_gate",
    "schema_evolution_replay",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _SAMPLE_FIRST if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
