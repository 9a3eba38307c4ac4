"""canal_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Capability parity target: the change-data-capture semantics of the reference
(Zze0/canal, a fork of alibaba/canal — MySQL binlog incremental subscription
& consumption). This is NOT a port: canal is a row-at-a-time Java push
pipeline (parse -> sink -> ring-buffer store -> client ack); this engine
re-expresses the same semantics Spark-first:

- the durable, partitioned change-log table IS the buffer (no ring buffer),
- epochs (bounded LSN slices per source partition) ARE the batches,
- last-writer-wins collapse is an algebraic ``max_by`` aggregation (map-side
  partial aggregation handles hot keys before the shuffle),
- the MERGE apply is a bucket-pruned copy-on-write join against an
  Iceberg-semantics snapshot/manifest table layer,
- exactly-once = idempotent epoch commits (atomic manifest rename) carrying
  per-partition offset checkpoints + lineage in the same commit.

See SURVEY.md for the full reference-to-Spark operator mapping.
"""

from canal_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
