"""Capture `.explain("formatted")` for a set of declared queries into
text files (plans/r06/<query>_{before,after}.txt — the optimization
round's plan evidence).

Usage:
    python scripts/capture_plans.py <suffix> [query ...]

With no query names, captures the bench HEADLINE set plus the queries
touched this round. The suffix is "before" or "after".
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canal_spark.queries import QUERIES  # noqa: E402
from canal_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.environ.get("PLANS_DIR", "plans/r06")

DEFAULT = [
    "lww_dedup_last_event",
    "partial_update_collapse",
    "merge_upsert_final_state",
    "join_enrich_broadcast",
    "topk_hot_keys",
    "union_multi_source",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "asof_join_last_click",
    "range_join_ship_window",
    "flatmessage_roundtrip",
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "winnowing_fingerprints",
    "pack_sequences",
    "token_budget_cap",
    "dedup_segments",
    "vocab_top_terms",
    "shuffle_shards",
    "sample_stratified",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app=f"plans_{suffix}", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 16))
    for name in names:
        if name not in QUERIES:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as ex:  # noqa: BLE001 - record the failure
            text = f"EXPLAIN FAILED: {ex!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
