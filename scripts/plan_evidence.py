"""Regenerate BENCH/PLANS.md: physical-plan evidence that the engine's
hot paths keep the properties claimed in SURVEY.md §4 — predicate
pushdown to the parquet scan, hash (not sort) aggregation in LWW,
broadcast of small dims, no nested-loop joins, whole-stage codegen.

Usage: python scripts/plan_evidence.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canal_spark.queries import QUERIES  # noqa: E402
from canal_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

#: (query, properties that MUST hold, properties that MUST NOT appear)
#: codegen note: in explain('formatted') whole-stage-codegen membership
#: is the `*` prefix on a node ("* Filter (3)"); under AQE the final
#: codegen'd plan only materializes at execution, so `*` is asserted
#: only on non-adaptive plans.
CHECKS = [
    ("scan_lsn_range", ["PushedFilters: [IsNotNull(event_id), GreaterThan(event_id", "* Filter"], ["SortAggregate"]),
    ("lww_dedup_last_event", ["HashAggregate"], ["SortAggregate", "Window", "SortMergeJoin"]),
    ("merge_upsert_final_state", ["HashAggregate"], ["SortAggregate", "SortMergeJoin", "CartesianProduct"]),
    ("join_enrich_broadcast", ["BroadcastHashJoin"], ["SortMergeJoin", "BroadcastNestedLoopJoin"]),
    ("asof_join_last_click", ["Window"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("range_join_ship_window", [], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("dedup_exact", ["HashAggregate"], ["SortAggregate"]),
    # the projection must collapse into the scan: ReadSchema carries
    # only the kept columns; the wide `text` column is never read
    ("project_field_filter", ["ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"], ["text:string"]),
    # dedup/ANN scale paths: candidates must come from equi-keyed joins
    # (bands / blocks / df-capped grams / LSH buckets / IVF lists) —
    # never a nested loop or cartesian over the corpus. (ann_cosine_topk
    # is excluded by design: the brute-force baseline IS a broadcast
    # nested loop of a tiny query set, documented in similarity.py.)
    # the r5 invariant queries join 1-row scalar aggregates
    # (soundness × planted recall) — that crossJoin legitimately plans
    # as a BroadcastNestedLoopJoin of single rows, so the corpus-NLJ
    # guard moves to the RAW pair pipelines (raw_* factories below),
    # where a nested loop would actually mean all-pairs work
    ("dedup_minhash_lsh", ["HashAggregate"], ["CartesianProduct"]),
    ("dedup_simhash", ["HashAggregate"], ["CartesianProduct"]),
    ("raw_minhash_pairs", ["HashAggregate"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("raw_simhash_pairs", ["HashAggregate"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("raw_incremental_probe", ["HashAggregate"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("dedup_ngram_jaccard", ["HashAggregate"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("ann_lsh_topk", [], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    ("ann_ivf_topk", [], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    # MQ JSON edge: explicit-schema from_json/to_json, JVM-only
    ("flatmessage_roundtrip", ["from_json"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    # as-of with nullable values: still the union+window plan, never an
    # inequality nested loop (the naive ASOF formulation)
    ("asof_join_nullable_values", ["Window"], ["BroadcastNestedLoopJoin", "CartesianProduct"]),
    # frame-sample fan-out: Arrow-batched python map, no shuffle at all
    ("multimodal_frame_sample", ["MapInPandas"], ["Exchange", "CartesianProduct"]),
    # composed refinement pipeline: ONE fused plan (dedup semi-join +
    # scan-side quality/lang gate + prefix-sum packing) — hash aggs
    # only, no sort aggregation, no nested loops, no global
    # single-partition window (the packing stays distributed)
    ("refine_corpus", ["HashAggregate"], ["SortAggregate", "BroadcastNestedLoopJoin", "CartesianProduct", "SinglePartition"]),
    # pack_sequences after the literal-bounds rewrite: no physical-id
    # dependence, no range re-sampling, no global sort
    ("pack_sequences", [], ["SPARK_PARTITION_ID", "rangepartitioning", "SinglePartition"]),
    # PII scrub is scan-only: regexp_replace inside the scan projection,
    # zero exchanges
    ("pii_scrub", [], ["Exchange", "SortAggregate"]),
    # top-k vocabulary: hash agg with map-side partials, then
    # TakeOrdered (per-partition top-k merge) — never a global sort of
    # the vocabulary
    ("vocab_top_terms", ["HashAggregate", "TakeOrderedAndProject"], ["SortAggregate"]),
    # contamination: benchmark grams broadcast, the corpus side probes —
    # no shuffle of the corpus, no sort-merge join
    ("contamination_overlap", ["BroadcastHashJoin"], ["SortMergeJoin", "CartesianProduct"]),
    # split assignment is a pure scan-side expression
    ("train_val_split", [], ["Exchange"]),
    # decontamination action: benchmark grams broadcast + flagged-id
    # anti-join broadcast back — the corpus side never sort-merges
    ("decontaminate_corpus", ["BroadcastHashJoin"], ["SortMergeJoin", "CartesianProduct"]),
    # sharded shuffle / quota sampling: per-shard (per-group) windows
    # over ONE hash exchange — never a global single-partition sort
    ("shuffle_shards", ["Window"], ["SinglePartition"]),
    ("sample_stratified", ["Window"], ["SinglePartition"]),
    # repetition gate + corpus mixing are scan-side: zero exchanges
    ("intra_doc_repetition", [], ["Exchange"]),
    ("mix_corpora", [], ["Exchange"]),
    # column-level partial LWW: fixed-width hash agg + broadcast winner
    # join + ObjectHashAggregate assembly — the wide payload must never
    # fall into a sort-based aggregate
    ("partial_update_collapse", ["BroadcastHashJoin", "ObjectHashAggregate"], ["SortAggregate"]),
]


def _raw_minhash_pairs(spark):
    import canal_spark.operators.dedup as DD
    from canal_spark.queries import _with_planted_dupes, load

    docs = _with_planted_dupes(load(spark, SF, "documents"))
    sh = DD.word_shingles(docs)
    sig = DD.minhash_signatures(sh, num_perm=16)
    return DD.jaccard_verify(DD.lsh_candidate_pairs(sig, bands=4), sh, min_jaccard=0.5)


def _raw_simhash_pairs(spark):
    import canal_spark.operators.dedup as DD
    from canal_spark.queries import _with_planted_dupes, load

    docs = _with_planted_dupes(load(spark, SF, "documents"))
    return DD.simhash_near_pairs(DD.simhash(docs), max_hamming=4, blocks=5)


def _raw_incremental_probe(spark):
    """The IncrementalDeduper batch-vs-retained probe shape WITHOUT the
    localCheckpoint re-rooting (which truncates the explain): new-batch
    bands equi-join the retained band index on (band_idx, band_key),
    then candidate-pruned exact-Jaccard verify — the per-epoch hot path
    of the streaming deduper must never nested-loop over the corpus."""
    import pyspark.sql.functions as F

    import canal_spark.operators.dedup as DD
    from canal_spark.queries import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    dd = DD.IncrementalDeduper(min_jaccard=0.8, num_perm=16, bands=8)
    dd.observe(docs.filter("doc_id % 3 = 0"))
    off = F.lit(dd.id_offset)
    sh_new = DD.word_shingles(docs.filter("doc_id % 3 = 1")).select("doc_id", "shingles")
    b_new = DD.lsh_bands(DD.minhash_signatures(sh_new, num_perm=16), bands=8)
    probe = (
        b_new.alias("n")
        .join(dd._bands.alias("r"), ["band_idx", "band_key"])
        .select(
            (F.col("n.doc_id") + off).alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
        )
        .distinct()
    )
    sh_all = sh_new.select((F.col("doc_id") + off).alias("doc_id"), "shingles").unionByName(
        dd._shingled
    )
    return DD.jaccard_verify(probe, sh_all, min_jaccard=0.8)


#: plan factories that are not driver queries (raw operator pipelines
#: whose plans the invariant queries wrap in scalar aggregations)
FACTORIES = {
    "raw_minhash_pairs": _raw_minhash_pairs,
    "raw_simhash_pairs": _raw_simhash_pairs,
    "raw_incremental_probe": _raw_incremental_probe,
}


def main() -> None:
    spark = get_spark(app="plan_evidence", master="local[4]", shuffle_partitions=8)
    lines = [
        "# PLANS — physical-plan evidence (auto-generated)",
        "",
        "Regenerate with `python scripts/plan_evidence.py`. Each section",
        "shows the `explain('formatted')` header of a driver query plus",
        "the asserted plan properties (scale posture per SURVEY.md §4).",
        "",
    ]
    failures = []
    for name, must, must_not in CHECKS:
        import contextlib
        import io

        df = FACTORIES[name](spark) if name in FACTORIES else QUERIES[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        ok = True
        for m in must:
            if m not in plan:
                ok = False
                failures.append(f"{name}: missing {m!r}")
        for m in must_not:
            if m in plan:
                ok = False
                failures.append(f"{name}: unexpected {m!r}")
        head = plan.split("\n\n")[0]
        # compress file listings
        head = re.sub(r"Location: \S+", "Location: …", head)
        lines += [
            f"## {name} — {'OK' if ok else 'VIOLATION'}",
            "",
            f"- asserted present: {', '.join(must) if must else '(none)'}",
            f"- asserted absent: {', '.join(must_not) if must_not else '(none)'}",
            "",
            "```",
            head.strip(),
            "```",
            "",
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    if failures:
        print("VIOLATIONS:")
        for x in failures:
            print(" -", x)
        sys.exit(1)
    print("all plan properties hold")


if __name__ == "__main__":
    main()
