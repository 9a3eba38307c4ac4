"""A/B: scan-side (higher-order fold) vs explode+agg MinHash plans.

Asserts value parity first (same hash family, two physical shapes),
then times the signature stage alone and the full dedup_minhash_lsh
pipeline. Run in a dedicated JVM:

    spark-submit --master local[32] --driver-memory 16g \
        scripts/minhash_ab.py [sf_dir]

Measured 2026-08-17 (sf0.1 + planted dupes, 5,010 docs, best-of-4
after a warm first round): SIG scan 2.08 s vs agg 3.18 s (1.53x);
FULL scan 5.33 s vs agg 5.84 s (1.10x — exact-Jaccard verify
dominates the full pipeline). Result: method="scan" is the default
(operators/dedup.py::minhash_signatures).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from canal_spark.operators import dedup as DD
from canal_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app="minhash_ab", master="local[32]", shuffle_partitions=32)

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    dupes = (
        docs.filter(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra")))
    )
    docs = docs.unionByName(dupes)
    n = docs.count()
    print(f"docs: {n}")
    sh = DD.word_shingles(docs)

    a = DD.minhash_signatures(sh, num_perm=16, method="agg").withColumnRenamed("sig", "sa")
    b = DD.minhash_signatures(sh, num_perm=16, method="scan").withColumnRenamed("sig", "sb")
    joined = a.join(b, "doc_id")
    diff = joined.filter(F.col("sa") != F.col("sb")).count()
    matched = joined.count()
    print(f"PARITY matched={matched} diff={diff}")
    assert diff == 0 and matched == n, (matched, diff, n)

    def time_best(fn, runs=4):
        walls = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            walls.append(round(time.monotonic() - t0, 2))
        return min(walls), walls

    def sig_job(method):
        return (
            DD.minhash_signatures(sh, num_perm=16, method=method)
            .agg(F.sum(F.element_at("sig", 1)))
            .collect()
        )

    def full_job(method):
        sig = DD.minhash_signatures(sh, num_perm=16, method=method)
        return DD.jaccard_verify(
            DD.lsh_candidate_pairs(sig, bands=4), sh, min_jaccard=0.5
        ).count()

    # two interleaved rounds per shape: the first round warms codegen
    # and the parquet scan, the second is the reported steady state
    for label, job in (("SIG", sig_job), ("FULL", full_job)):
        for method in ("agg", "scan", "agg", "scan"):
            best, walls = time_best(lambda: job(method))
            print(f"{label} {method}: best={best:.2f} walls={walls}")


if __name__ == "__main__":
    main()
