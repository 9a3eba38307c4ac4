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


#: round-5 rotation (pure reordering, VERDICT r4 task 4): lead with the
#: 31 names the r4 driver sample skipped (the join/window/agg/recall
#: block), then the r5 additions/conversions (multi_table_replay is
#: new; the dedup pair sets and ann_lsh_topk gained invariant
#: oracles), then the rest.
_SAMPLE_FIRST = [
    # unsampled in CORRECTNESS_r04
    "join_enrich_left",
    "join_enrich_broadcast",
    "window_lag_before_image",
    "txn_group_complete",
    "epoch_size_accounting",
    "metrics_per_partition",
    "pk_hash_partition",
    "topk_hot_keys",
    "hot_key_histogram",
    "distinct_keys_exact",
    "dedup_minhash_recall",
    "dedup_simhash_recall",
    "dedup_ngram_recall",
    "ann_ivf_recall",
    "mor_replay_modes_agree",
    "incremental_changes_consistent",
    "pii_scrub",
    "vocab_top_terms",
    "contamination_overlap",
    "train_val_split",
    "leakage_free_split",
    "flatmessage_roundtrip",
    "asof_join_nullable_values",
    "asof_join_last_click",
    "range_join_ship_window",
    "rollup_event_counts",
    "running_frame_totals",
    "ann_ivf_topk",
    "state_diff_intersect",
    "session_window_counts",
    "windowed_event_counts",
    # new or contract-changed in r5
    "delete_where_takedown",
    "partial_update_collapse",
    "partial_update_replay",
    "incremental_mv_refresh",
    "rollback_replay_parity",
    "tag_retention_parity",
    "flatmessage_outbox_roundtrip",
    "cdf_capture_parity",
    "time_travel_timestamp",
    "table_replication_parity",
    "branch_wap_parity",
    "dedup_segments",
    "incremental_changes_consistent",
    "stream_replay_parity",
    "token_budget_cap",
    "dedup_incremental",
    "dedup_incremental_resume",
    "dedup_incremental_compacted",
    "multi_table_replay",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "multimodal_decode_stub",
    "refine_corpus",
    "rdb_sink_parity",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: QUERIES[n] for n in _SAMPLE_FIRST if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
