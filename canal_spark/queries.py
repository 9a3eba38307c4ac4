"""Driver-contract query catalog: every SURVEY.md §2 operator as a
(spark_fn, oracle_sql) pair over the /root/testdata tables.

Each entry exercises a real engine kernel (filters / lww / merge /
dedup / similarity / text) against the driver's DuckDB oracle at
sf0.01. Portability rules (FIXTURES.md §C): explicit casts on every
aggregate (DuckDB SUM(int) is HUGEINT, ROW_NUMBER is BIGINT), no Spark
`hash()`, no double aggregation without exact-decimal intermediates,
md5 for fingerprints, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_spark.functions import text as TX
from canal_spark.functions.tokens import char_len_udf
from canal_spark.operators import dedup as DD
from canal_spark.operators import similarity as SIM
from canal_spark.operators.lww import lww_collapse
from canal_spark.sources.cdc_mapping import (
    N_SOURCE_PARTITIONS,
    OP_SQL_CASE,
    events_as_changelog,
    load,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


# The events->changelog op mapping as a SQL CTE fragment, shared by oracles
MAPPED = f"""
mapped AS (
  SELECT event_id AS lsn, user_id AS key,
         user_id % {N_SOURCE_PARTITIONS} AS source_partition,
         ts, value, props, {OP_SQL_CASE} AS op
  FROM events
)"""

CKPT = """
ckpt AS (
  SELECT CAST(p AS BIGINT) AS source_partition,
         CAST(1000 + 800 * p AS BIGINT) AS committed_lsn
  FROM range(8) t(p)
)"""


def _ckpt_df(spark: SparkSession) -> DataFrame:
    return spark.range(8).select(
        F.col("id").alias("source_partition"),
        (F.lit(1000) + F.lit(800) * F.col("id")).alias("committed_lsn"),
    )


# ======================================================================
# 2.1 scans / sources
# ======================================================================
@q(
    "scan_changelog",
    "SELECT event_id AS lsn, user_id AS key, event_type, ts, value FROM events",
)
def scan_changelog(spark, sf):
    return load(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key"),
        "event_type",
        "ts",
        "value",
    )


@q(
    "scan_lsn_range",
    "SELECT event_id AS lsn, user_id AS key, event_type FROM events "
    "WHERE event_id > 2000 AND event_id <= 7000",
)
def scan_lsn_range(spark, sf):
    return (
        load(spark, sf, "events")
        .filter((F.col("event_id") > 2000) & (F.col("event_id") <= 7000))
        .select(F.col("event_id").alias("lsn"), F.col("user_id").alias("key"), "event_type")
    )


@q(
    "json_extract_props",
    "SELECT event_id AS lsn, json_extract_string(props, '$.k') AS k_val FROM events",
)
def json_extract_props(spark, sf):
    return load(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.get_json_object("props", "$.k").alias("k_val"),
    )


@q(
    "resume_after_checkpoint",
    f"WITH {MAPPED.strip()}, {CKPT.strip()} "
    "SELECT m.lsn, m.key, m.op FROM mapped m JOIN ckpt c USING (source_partition) "
    "WHERE m.lsn > c.committed_lsn",
)
def resume_after_checkpoint(spark, sf):
    ch = events_as_changelog(spark, sf)
    ck = _ckpt_df(spark)
    return (
        ch.join(F.broadcast(ck), "source_partition")
        .filter(F.col("lsn") > F.col("committed_lsn"))
        .select("lsn", "key", "op")
    )


@q(
    "late_event_dropped",
    f"WITH {MAPPED.strip()}, {CKPT.strip()} "
    "SELECT c.source_partition, CAST(COUNT(*) AS BIGINT) AS n_dropped "
    "FROM mapped m JOIN ckpt c USING (source_partition) "
    "WHERE m.lsn <= c.committed_lsn GROUP BY c.source_partition",
)
def late_event_dropped(spark, sf):
    ch = events_as_changelog(spark, sf)
    ck = _ckpt_df(spark)
    return (
        ch.join(F.broadcast(ck), "source_partition")
        .filter(F.col("lsn") <= F.col("committed_lsn"))
        .groupBy("source_partition")
        .agg(F.count("*").alias("n_dropped"))
    )


@q("initial_snapshot_rowcount", "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer")
def initial_snapshot_rowcount(spark, sf):
    return load(spark, sf, "customer").agg(F.count("*").alias("n_rows"))


# ======================================================================
# 2.2 filters / projections
# ======================================================================
@q(
    "filter_op_types",
    f"WITH {MAPPED.strip()} SELECT lsn, key, op FROM mapped "
    "WHERE op IN ('INSERT','UPDATE','DELETE')",
)
def filter_op_types(spark, sf):
    from canal_spark.operators.filters import op_filter

    return op_filter(events_as_changelog(spark, sf)).select("lsn", "key", "op")


@q(
    "filter_heartbeats",
    f"WITH {MAPPED.strip()} SELECT lsn, key, op FROM mapped WHERE op <> 'HEARTBEAT'",
)
def filter_heartbeats(spark, sf):
    from canal_spark.operators.filters import drop_heartbeats

    return drop_heartbeats(events_as_changelog(spark, sf)).select("lsn", "key", "op")


@q(
    "filter_regex_whitelist",
    "SELECT doc_id, source FROM documents WHERE regexp_matches(source, '^src[0-3]$')",
)
def filter_regex_whitelist(spark, sf):
    from canal_spark.operators.filters import whitelist

    return whitelist(load(spark, sf, "documents"), "^src[0-3]$").select("doc_id", "source")


@q(
    "filter_regex_blacklist",
    "SELECT doc_id, source FROM documents WHERE NOT regexp_matches(source, '^src[0-3]$')",
)
def filter_regex_blacklist(spark, sf):
    from canal_spark.operators.filters import blacklist

    return blacklist(load(spark, sf, "documents"), "^src[0-3]$").select("doc_id", "source")


@q("project_field_filter", "SELECT doc_id, lang, n_chars FROM documents")
def project_field_filter(spark, sf):
    from canal_spark.operators.filters import field_filter

    return field_filter(load(spark, sf, "documents"), keep=["doc_id", "lang", "n_chars"])


# ======================================================================
# 2.3/2.4/2.5 LWW, merge, joins, windows
# ======================================================================
LWW_SQL = f"""
WITH {MAPPED.strip()},
filtered AS (SELECT * FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE')),
lww AS (
  SELECT key, op, lsn, value,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY lsn DESC) AS rn
  FROM filtered
)"""


@q(
    "lww_dedup_last_event",
    LWW_SQL + " SELECT key, op AS last_op, lsn AS last_lsn, value AS last_value "
    "FROM lww WHERE rn = 1",
)
def lww_dedup_last_event(spark, sf):
    from canal_spark.operators.filters import op_filter

    ch = op_filter(events_as_changelog(spark, sf))
    return lww_collapse(
        ch, key="key", order_cols=("lsn",), payload_cols=("op", "lsn", "value")
    ).select(
        "key",
        F.col("op").alias("last_op"),
        F.col("lsn").alias("last_lsn"),
        F.col("value").alias("last_value"),
    )


@q(
    "merge_upsert_final_state",
    LWW_SQL + " SELECT key, lsn AS last_lsn, value AS last_value "
    "FROM lww WHERE rn = 1 AND op <> 'DELETE'",
)
def merge_upsert_final_state(spark, sf):
    """The flagship collapse: LWW per key, tombstones drop the key —
    the final-state semantics of the MERGE kernel, in oracle-checkable
    form (the file-level kernel itself is exercised in pytest)."""
    from canal_spark.operators.filters import op_filter

    ch = op_filter(events_as_changelog(spark, sf))
    return (
        lww_collapse(ch, key="key", order_cols=("lsn",), payload_cols=("op", "lsn", "value"))
        .filter(F.col("op") != "DELETE")
        .select("key", F.col("lsn").alias("last_lsn"), F.col("value").alias("last_value"))
    )


@q(
    "antijoin_deletes",
    f"WITH {MAPPED.strip()} SELECT c_custkey FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM mapped m WHERE m.key = c.c_custkey AND m.op = 'DELETE')",
)
def antijoin_deletes(spark, sf):
    dels = events_as_changelog(spark, sf).filter(F.col("op") == "DELETE")
    cust = load(spark, sf, "customer")
    return cust.join(
        dels, cust.c_custkey == dels.key, "left_anti"
    ).select("c_custkey")


@q(
    "semijoin_active_keys",
    f"WITH {MAPPED.strip()} SELECT c_custkey FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM mapped m WHERE m.key = c.c_custkey)",
)
def semijoin_active_keys(spark, sf):
    ch = events_as_changelog(spark, sf)
    cust = load(spark, sf, "customer")
    return cust.join(ch, cust.c_custkey == ch.key, "left_semi").select("c_custkey")


JOIN_SQL = (
    "SELECT e.event_id AS lsn, e.user_id AS key, c.c_name, c.c_mktsegment "
    "FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"
)


@q("join_enrich_left", JOIN_SQL)
def join_enrich_left(spark, sf):
    ev, cust = load(spark, sf, "events"), load(spark, sf, "customer")
    return ev.join(cust, ev.user_id == cust.c_custkey, "left").select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key"),
        "c_name",
        "c_mktsegment",
    )


@q("join_enrich_broadcast", JOIN_SQL)
def join_enrich_broadcast(spark, sf):
    ev, cust = load(spark, sf, "events"), load(spark, sf, "customer")
    return ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left").select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key"),
        "c_name",
        "c_mktsegment",
    )


@q(
    "window_lag_before_image",
    "SELECT event_id AS lsn, user_id AS key, value, "
    "LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value FROM events",
)
def window_lag_before_image(spark, sf):
    w = Window.partitionBy("user_id").orderBy("event_id")
    return load(spark, sf, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").alias("key"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
    )


# ======================================================================
# 2.4/2.6 aggregations, tx grouping, metrics, top-k
# ======================================================================
@q(
    "txn_group_complete",
    "WITH tx AS (SELECT event_id // 16 AS tx_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(MAX(event_id) AS BIGINT) AS max_lsn FROM events GROUP BY 1) "
    "SELECT tx_id, n_events, max_lsn FROM tx WHERE max_lsn <= 9000",
)
def txn_group_complete(spark, sf):
    return (
        load(spark, sf, "events")
        .groupBy(F.floor(F.col("event_id") / 16).alias("tx_id"))
        .agg(F.count("*").alias("n_events"), F.max("event_id").alias("max_lsn"))
        .filter(F.col("max_lsn") <= 9000)
    )


@q(
    "epoch_size_accounting",
    "SELECT event_id // 1000 AS epoch, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(SUM(LENGTH(props)) AS BIGINT) AS sum_bytes FROM events GROUP BY 1",
)
def epoch_size_accounting(spark, sf):
    return (
        load(spark, sf, "events")
        .groupBy(F.floor(F.col("event_id") / 1000).alias("epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.length("props")).alias("sum_bytes"),
        )
    )


@q(
    "metrics_per_partition",
    f"WITH {MAPPED.strip()} SELECT source_partition, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "CAST(MIN(lsn) AS BIGINT) AS min_lsn, CAST(MAX(lsn) AS BIGINT) AS max_lsn, "
    "MAX(ts) AS max_ts FROM mapped GROUP BY source_partition",
)
def metrics_per_partition(spark, sf):
    return (
        events_as_changelog(spark, sf)
        .groupBy("source_partition")
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
            F.max("ts").alias("max_ts"),
        )
    )


@q(
    "pk_hash_partition",
    f"SELECT user_id % {N_SOURCE_PARTITIONS} AS bucket, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM events GROUP BY 1",
)
def pk_hash_partition(spark, sf):
    return (
        load(spark, sf, "events")
        .groupBy((F.col("user_id") % N_SOURCE_PARTITIONS).alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "topk_hot_keys",
    "SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_events FROM events "
    "GROUP BY user_id ORDER BY n_events DESC, key ASC LIMIT 10",
)
def topk_hot_keys(spark, sf):
    return (
        load(spark, sf, "events")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("key"))
        .limit(10)
    )


@q(
    "hot_key_histogram",
    "WITH per_key AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM events GROUP BY user_id) "
    "SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_keys FROM per_key GROUP BY n_events",
)
def hot_key_histogram(spark, sf):
    per_key = (
        load(spark, sf, "events").groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    return per_key.groupBy("n_events").agg(F.count("*").alias("n_keys"))


@q("distinct_keys_exact", "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys FROM events")
def distinct_keys_exact(spark, sf):
    return load(spark, sf, "events").agg(F.countDistinct("user_id").alias("n_keys"))


@q("approx_distinct_keys", "SELECT TRUE AS within_bound")
def approx_distinct_keys(spark, sf):
    """The HLL sketch VALUE is engine-specific (rows-only in r1-r3),
    but its accuracy contract is not: the estimate must land within
    the relative-error bound of the exact count (default rsd 0.05;
    0.15 = 3 sigma), and that boolean is the driver-checked invariant."""
    agg = load(spark, sf, "events").agg(
        F.approx_count_distinct("user_id").alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    )
    return agg.select(
        (
            F.abs(F.col("approx") - F.col("exact")) / F.col("exact") <= 0.15
        ).alias("within_bound")
    )


# ======================================================================
# 2.7 set ops
# ======================================================================
@q(
    "union_multi_source",
    "WITH u AS (SELECT * FROM events WHERE user_id % 2 = 0 "
    "UNION ALL SELECT * FROM events WHERE user_id % 2 = 1) "
    "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY event_type",
)
def union_multi_source(spark, sf):
    ev = load(spark, sf, "events")
    u = ev.filter(F.col("user_id") % 2 == 0).unionByName(ev.filter(F.col("user_id") % 2 == 1))
    return u.groupBy("event_type").agg(F.count("*").alias("n"))


@q(
    "state_diff_except",
    "SELECT c_custkey AS key FROM customer EXCEPT SELECT user_id AS key FROM events",
)
def state_diff_except(spark, sf):
    cust = load(spark, sf, "customer").select(F.col("c_custkey").alias("key"))
    ev = load(spark, sf, "events").select(F.col("user_id").alias("key"))
    return cust.subtract(ev)


# ======================================================================
# 2.8 scalar functions
# ======================================================================
@q(
    "cast_types_roundtrip",
    "SELECT event_id, CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS lsn_rt, "
    "strftime(ts, '%Y-%m-%d') AS d, CAST(user_id AS INT) AS key_i FROM events",
)
def cast_types_roundtrip(spark, sf):
    return load(spark, sf, "events").select(
        "event_id",
        F.col("event_id").cast("string").cast("bigint").alias("lsn_rt"),
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.col("user_id").cast("int").alias("key_i"),
    )


@q(
    "ddl_classify",
    "SELECT CASE event_type WHEN 'signup' THEN 'CREATE' WHEN 'click' THEN 'ALTER' "
    "WHEN 'purchase' THEN 'ERASE' WHEN 'view' THEN 'QUERY' ELSE 'OTHER' END AS ddl_class, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1",
)
def ddl_classify(spark, sf):
    cls = (
        F.when(F.col("event_type") == "signup", "CREATE")
        .when(F.col("event_type") == "click", "ALTER")
        .when(F.col("event_type") == "purchase", "ERASE")
        .when(F.col("event_type") == "view", "QUERY")
        .otherwise("OTHER")
    )
    return (
        load(spark, sf, "events")
        .groupBy(cls.alias("ddl_class"))
        .agg(F.count("*").alias("n"))
    )


@q(
    "tokens_invariant_ntok",
    "SELECT vec_id, CAST(len(embedding) AS INT) AS n_dim, label FROM embeddings",
)
def tokens_invariant_ntok(spark, sf):
    return load(spark, sf, "embeddings").select(
        "vec_id", F.size("embedding").cast("int").alias("n_dim"), "label"
    )


@q(
    "pandas_udf_token_transform",
    "SELECT doc_id, CAST(LENGTH(text) AS INT) AS char_len FROM documents",
)
def pandas_udf_token_transform(spark, sf):
    """Vectorized Arrow UDF vs a JVM-side oracle — proves the pandas
    slow path is semantics-preserving."""
    return load(spark, sf, "documents").select(
        "doc_id", char_len_udf(F.col("text")).alias("char_len")
    )


CURSOR_SQL = (
    f"WITH {MAPPED.strip()}, "
    "ext AS (SELECT source_partition, MAX(lsn) AS ext FROM mapped GROUP BY source_partition) "
    "SELECT client, CAST(source_partition AS BIGINT) AS source_partition, "
    "CAST(LEAST(-1 + n_acks * budget, ext) AS BIGINT) AS acked_lsn "
    "FROM ext CROSS JOIN (VALUES ('c1', 2, 2000), ('c2', 1, 5000)) "
    "AS clients(client, n_acks, budget)"
)


@q("client_cursor_state", CURSOR_SQL)
def client_cursor_state(spark, sf):
    """Two named clients tail the same changelog at independent
    positions (canal's per-clientId cursor); returns the registry's
    inspection surface. Oracle: acked lsn after k acks of budget B is
    min(-1 + k*B, extent) per partition — acks cover the lsn RANGE, so
    the cursor is a pure function of (k, B, extents)."""
    import tempfile

    from canal_spark.plans.cursors import ChangelogConsumer, CursorRegistry

    tmp = tempfile.mkdtemp(prefix="canal_cursor_")
    events_as_changelog(spark, sf).write.mode("overwrite").parquet(f"{tmp}/log")
    reg = CursorRegistry(f"{tmp}/meta")
    c1 = ChangelogConsumer(spark, f"{tmp}/log", reg, "c1", lsn_budget=2000)
    c2 = ChangelogConsumer(spark, f"{tmp}/log", reg, "c2", lsn_budget=5000)
    # get() is None once the log is exhausted (small scale factors);
    # the oracle's LEAST(-1 + k*B, extent) covers that case exactly
    for _ in range(2):
        if (got := c1.get()) is None:
            break
        c1.ack(got[0])
    if (got := c2.get()) is not None:
        c2.ack(got[0])
    return spark.createDataFrame(
        reg.state_rows(), "client string, source_partition bigint, acked_lsn bigint"
    )


XA_SQL = (
    "SELECT doc_id, n_tok, tok_sum FROM (VALUES "
    "('a', 2, 3), ('b', 2, 9), ('c', 1, 10), ('d', 2, 23)"
    ") AS t(doc_id, n_tok, tok_sum)"
)


@q("xa_rollback_replay", XA_SQL)
def xa_rollback_replay(spark, sf):
    """XA semantics end-to-end: a fixed mini-log where one tx is
    XAROLLBACK-terminated (its INSERT/UPDATE discarded), one aborted
    DELETE must not kill its key, GTID markers advance the cursor.
    The oracle is the hand-derivable final state — the engine has to
    COMPUTE it through the barrier + rollback + LWW + merge path."""
    import tempfile

    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import SCHEMA as CH_SCHEMA

    ts0 = 1_767_225_600_000_000

    def row(op, doc, lsn, p, tx, commit, toks):
        return {
            "op": op, "doc_id": doc, "lsn": lsn, "source_partition": p,
            "tx_id": p * 1_000_000_000 + tx, "tx_commit": commit,
            "ts": ts0 + lsn * 1000, "tokens": toks,
            "n_tok": None if toks is None else len(toks),
            "source": "src0", "schema_ver": 1,
        }

    parts = {
        0: [
            row("INSERT", "a", 1, 0, 0, False, [1, 2]),
            row("INSERT", "b", 2, 0, 0, True, [3]),
            row("GTID", "", 3, 0, 1, True, None),
            row("INSERT", "x", 4, 0, 2, False, [9, 9]),
            row("UPDATE", "a", 5, 0, 2, False, [8, 8, 8]),
            row("XAROLLBACK", "", 6, 0, 2, True, None),
            row("UPDATE", "b", 7, 0, 3, True, [4, 5]),
        ],
        1: [
            row("INSERT", "c", 1, 1, 0, True, [10]),
            row("DELETE", "c", 2, 1, 1, False, None),
            row("XAROLLBACK", "", 3, 1, 1, True, None),
            row("INSERT", "d", 4, 1, 2, True, [11, 12]),
        ],
    }
    tmp = tempfile.mkdtemp(prefix="canal_xa_")
    import os as os_

    os_.makedirs(f"{tmp}/log", exist_ok=True)
    for p, rows in parts.items():
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        cols["ts"] = pa_.array(cols["ts"], type=pa_.timestamp("us"))
        pq_.write_table(pa_.table(cols, schema=CH_SCHEMA), f"{tmp}/log/part-p{p:04d}.parquet")
    table = SnapshotTable.create(f"{tmp}/table", n_buckets=2)
    CdcEngine(spark, f"{tmp}/log", table, lsn_budget=10**9, xa_mode=True).run_to_completion()
    return table.read(spark).select(
        "doc_id",
        "n_tok",
        F.aggregate("tokens", F.lit(0), lambda a, x: a + x).alias("tok_sum"),
    )


# ======================================================================
# 2.9 exactly-once (protocol runs end-to-end; its INVARIANTS are the
# oracle-checked output — the r4 boolean-scalar pattern)
# ======================================================================
@q(
    "exactly_once_reapply_noop",
    "SELECT TRUE AS reapply_noop, TRUE AS state_unchanged, TRUE AS has_rows",
)
def exactly_once_reapply_noop(spark, sf):
    """Mini end-to-end replay twice over: second pass must be a no-op.
    The protocol itself is not SQL, but its outcome booleans are —
    the trivial VALUES oracle makes the exactly-once property a
    driver-checked invariant (full coverage: tests/test_exactly_once)."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    tmp = tempfile.mkdtemp(prefix="canal_eo_")
    log = generate_changelog(
        f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
    )
    table = SnapshotTable.create(f"{tmp}/table", n_buckets=4)
    eng = CdcEngine(spark, log, table, lsn_budget=10**9)
    eng.run_to_completion()
    epoch1, rows1 = table.current_epoch(), table.read(spark).count()
    reapply = eng.run_epoch()  # must be None
    epoch2, rows2 = table.current_epoch(), table.read(spark).count()
    shutil.rmtree(tmp, ignore_errors=True)  # invariants materialized above
    return spark.createDataFrame(
        [(reapply is None, epoch1 == epoch2 and rows1 == rows2, rows1 > 0)],
        "reapply_noop boolean, state_unchanged boolean, has_rows boolean",
    )


@q(
    "stream_replay_parity",
    "SELECT TRUE AS stream_matches_batch, TRUE AS ddl_applied, "
    "TRUE AS redelivery_noop, TRUE AS has_rows",
)
def stream_replay_parity(spark, sf):
    """Structured-Streaming front-end end-to-end (T1–T4 + in-stream
    DDL): the same changelog replayed via foreachBatch micro-batches
    must reach the batch engine's exact final state, the side-stream
    DDL must land in position (column exists post-stream in BOTH), and
    a redelivered micro-batch must be a no-op. Protocol outcome as
    boolean invariants (the r4 pattern); full coverage in
    tests/test_streaming*.py."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
        generate_ddl_events,
    )
    from canal_spark.streaming.stream import StreamingUpsert

    tmp = tempfile.mkdtemp(prefix="canal_st_")
    log = generate_changelog(
        f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
    )
    ddl = generate_ddl_events(
        f"{tmp}/ddl",
        [{"lsn": 0, "source_partition": 1, "kind": "ADD_COLUMN",
          "payload": {"name": "lang", "type": "string"}}],
    )
    bt = SnapshotTable.create(f"{tmp}/batch", n_buckets=4)
    CdcEngine(spark, log, bt, lsn_budget=500, ddl_events_path=ddl).run_to_completion()
    st = SnapshotTable.create(f"{tmp}/stream", n_buckets=4)
    su = StreamingUpsert(spark, st, ddl_events_path=ddl)
    su.start(log, f"{tmp}/ckpt", max_files_per_trigger=1).awaitTermination(300)
    cols = ["doc_id", "tokens", "n_tok", "source", "lang"]
    a, b = bt.read(spark).select(cols), st.read(spark).select(cols)
    matches = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    ddl_ok = (
        st.snapshot()["schema_ver"] == bt.snapshot()["schema_ver"] == 2
        and "lang" in b.columns
    )
    redeliver = su.apply_batch(spark.read.parquet(log), batch_id=0) is False
    n = b.count()
    shutil.rmtree(tmp, ignore_errors=True)  # invariants materialized above
    return spark.createDataFrame(
        [(bool(matches), bool(ddl_ok), bool(redeliver), n > 0)],
        "stream_matches_batch boolean, ddl_applied boolean, "
        "redelivery_noop boolean, has_rows boolean",
    )


# ======================================================================
# training-data ops: dedup / similarity / text
# ======================================================================
@q(
    "dedup_exact",
    "SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_copies FROM documents GROUP BY md5(text)",
)
def dedup_exact(spark, sf):
    return DD.exact_dedup(load(spark, sf, "documents"))


def _with_planted_dupes(docs: DataFrame) -> DataFrame:
    """Deterministically plant near-duplicates: re-add the first 10 docs
    under shifted ids with one word appended (near-dup detectors must
    find exactly these)."""
    dupes = (
        docs.filter(F.col("doc_id") < 10)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra")))
    )
    return docs.unionByName(dupes)


PAIR_SOUND_ORACLE = (
    "SELECT TRUE AS has_pairs, TRUE AS all_above_threshold, "
    "TRUE AS jaccard_recomputed_ok, TRUE AS all_planted_found"
)


def _pair_soundness(
    spark, pairs: DataFrame, shingled: DataFrame, threshold: float
) -> DataFrame:
    """Invariant row over a near-dup detector's emitted pair set (the
    r4 boolean-VALUES-oracle pattern, VERDICT r4 task 3): SOUNDNESS —
    every emitted pair clears the exact-Jaccard threshold, recomputed
    INDEPENDENTLY of jaccard_verify's equi-join-count formulation via
    array_intersect/array_union over the full shingle sets — plus
    RECALL over the 10 planted pairs. The pair set itself is
    hash-family specific (not ANSI-SQL-reproducible); these two
    properties are what make it a correct answer, and both are.

    The emitted pair set is tiny (near-dup pairs, vanishing vs the
    corpus) but its LINEAGE is the whole detector pipeline, and this
    invariant plan references it from both scalar branches —
    localCheckpoint materializes it once (measured: without it the
    dedup_minhash_lsh bench wall nearly doubled, the LSH pipeline
    re-executing per branch)."""
    pairs = pairs.localCheckpoint(eager=True)
    sets_ = shingled.select(
        F.col("doc_id").alias("_id"), F.array_distinct("shingles").alias("s")
    )
    j2 = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    ).cast("double")
    sound = (
        pairs.join(
            sets_.select(F.col("_id").alias("id_a"), F.col("s").alias("sa")), "id_a"
        )
        .join(sets_.select(F.col("_id").alias("id_b"), F.col("s").alias("sb")), "id_b")
        .withColumn("j2", j2)
        .agg(
            (F.count("*") > 0).alias("has_pairs"),
            (F.min("j2") >= threshold).alias("all_above_threshold"),
            (F.max(F.abs(F.col("jaccard") - F.col("j2"))) < 1e-9).alias(
                "jaccard_recomputed_ok"
            ),
        )
    )
    planted = spark.createDataFrame(
        [(i, i + 100000) for i in range(10)], "id_a long, id_b long"
    )
    found = planted.join(
        pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).agg((F.count("*") == 10).alias("all_planted_found"))
    return sound.crossJoin(found)  # 1-row scalar x 1-row scalar


@q("dedup_minhash_lsh", PAIR_SOUND_ORACLE)
def dedup_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup pairs, driver-checked by invariants: the
    LSH band join is only the candidate generator, so soundness (every
    emitted pair's exact Jaccard >= 0.5, independently recomputed) and
    planted-pair recall pin the semantics without reproducing the hash
    family in SQL (pair-set coverage: tests/test_dedup_recall.py)."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    sh = DD.word_shingles(docs)
    sig = DD.minhash_signatures(sh, num_perm=16)
    pairs = DD.jaccard_verify(DD.lsh_candidate_pairs(sig, bands=4), sh, min_jaccard=0.5)
    return _pair_soundness(spark, pairs, sh, threshold=0.5)


@q(
    "dedup_simhash",
    "SELECT TRUE AS has_pairs, TRUE AS all_within_radius, "
    "TRUE AS ids_canonical, TRUE AS all_planted_found",
)
def dedup_simhash(spark, sf):
    """SimHash near-dup pairs at radius 4 / 5 blocks (pigeonhole:
    <= 4 flips => some 12-bit block equal; one appended word flips up
    to 4 bits on short docs). The 64-bit hash family is not
    SQL-expressible, so the driver checks the detector's defining
    invariants instead: every emitted pair is within the radius, the
    pair list is canonical (id_a < id_b, no duplicates), and all 10
    planted near-dupes are found (tests/test_dedup_recall.py holds the
    pair-set coverage)."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    # three scalar branches below reference the pair set; materialize
    # its (tiny) result once instead of re-running the detector per
    # branch (same rationale as _pair_soundness)
    pairs = DD.simhash_near_pairs(DD.simhash(docs), max_hamming=4, blocks=5)
    pairs = pairs.localCheckpoint(eager=True)
    inv = pairs.agg(
        (F.count("*") > 0).alias("has_pairs"),
        (F.max("hamming") <= 4).alias("all_within_radius"),
        (
            F.sum(F.when(F.col("id_a") < F.col("id_b"), 0).otherwise(1)) == 0
        ).alias("ordered"),
        F.count("*").alias("n"),
    )
    distinct_n = pairs.select("id_a", "id_b").distinct().agg(
        F.count("*").alias("dn")
    )
    planted = spark.createDataFrame(
        [(i, i + 100000) for i in range(10)], "id_a long, id_b long"
    )
    found = planted.join(
        pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
    ).agg((F.count("*") == 10).alias("all_planted_found"))
    return (
        inv.crossJoin(distinct_n)  # 1-row scalars throughout
        .crossJoin(found)
        .select(
            "has_pairs",
            "all_within_radius",
            (F.col("ordered") & (F.col("n") == F.col("dn"))).alias("ids_canonical"),
            "all_planted_found",
        )
    )


#: full row-level oracle for the word-n-gram detector: unlike the
#: MinHash/SimHash families, its candidate rule is deterministic set
#: logic — shared surviving (2 <= df <= 64) gram count >= least(3,
#: |A|, |B|), then exact Jaccard >= 0.8 — so DuckDB can replay the
#: ENTIRE pair set, df cap and all, from the parquet corpus.
NGRAM_PAIRS_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id < 10),
g AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 3 + 2),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE [array_to_string(w, ' ')] END) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs)),
ex AS (SELECT doc_id, UNNEST(s) AS sh FROM g),
dfc AS (SELECT sh, COUNT(*) AS df FROM ex GROUP BY sh),
surv AS (SELECT doc_id, list(sh) AS ks FROM ex JOIN dfc USING (sh)
         WHERE df BETWEEN 2 AND 64 GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib,
         len(list_intersect(COALESCE(sa.ks, []), COALESCE(sb.ks, []))) AS nsh,
         len(a.s) AS sza, len(b.s) AS szb,
         len(list_intersect(a.s, b.s)) AS inter
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  LEFT JOIN surv sa ON sa.doc_id = a.doc_id
  LEFT JOIN surv sb ON sb.doc_id = b.doc_id)
SELECT ia AS id_a, ib AS id_b,
       ROUND(CAST(inter AS DOUBLE) / (sza + szb - inter), 3) AS jaccard
FROM cand
WHERE nsh >= LEAST(3, sza, szb)
  AND CAST(inter AS DOUBLE) / (sza + szb - inter) >= 0.8
"""


@q("dedup_ngram_jaccard", NGRAM_PAIRS_SQL)
def dedup_ngram_jaccard(spark, sf):
    """Word-unit n-gram Jaccard near-dup pairs: DF-capped gram join
    (bounded pairs per gram) + shared-count floor + exact verify — the
    r1 exploded char-gram self-join degenerated toward all-pairs at
    corpus scale. No hashing anywhere in the rule, so the oracle
    replays the full pair set (df cap included) in DuckDB; the rounded
    jaccard column pins the capped-join + hot-gram-completion
    intersection arithmetic row by row."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    return DD.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.8).select(
        "id_a", "id_b", F.round("jaccard", 3).alias("jaccard")
    )


CLUSTER_SQL = """
WITH RECURSIVE all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id < 10),
sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 3 + 2),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE [array_to_string(w, ' ')] END) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs)),
p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
e AS (SELECT ia AS src, ib AS dst FROM p UNION SELECT ib, ia FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS lbl FROM all_docs
  UNION
  SELECT e.dst AS node, r.lbl FROM r JOIN e ON e.src = r.node
)
SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id FROM r GROUP BY node
"""


@q("dedup_cluster_assign", CLUSTER_SQL)
def dedup_cluster_assign(spark, sf):
    """Transitive near-dup CLUSTERING (P20): pairwise detector output
    -> connected components by min-label propagation (iterative Spark
    joins, O(component diameter) rounds) -> one cluster id per doc;
    singletons label themselves. Pairwise drop rules under-dedup
    chains (A~B~C keeps A and C); corpus dedup keeps one canonical doc
    per component. The component stage is exact-Jaccard-defined (like
    refine_corpus' drop stage), so the oracle replays it as a
    recursive min-reachability CTE over the all-pairs graph."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True)).select("doc_id", "text")
    sh = DD.word_shingles(docs)
    sig = DD.minhash_signatures(sh, num_perm=16)
    pairs = DD.jaccard_verify(
        DD.lsh_candidate_pairs(sig, bands=8), sh, min_jaccard=0.8
    )
    return DD.connected_components(pairs, docs.select("doc_id"))


INCR_DEDUP_SQL = """
WITH RECURSIVE all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id < 10),
sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 3 + 2),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE [array_to_string(w, ' ')] END) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs)),
p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
-- batch 0: plain min-reachability canonical (no retained state yet)
e0 AS (SELECT ia AS src, ib AS dst FROM p WHERE ia % 3 = 0 AND ib % 3 = 0
       UNION SELECT ib, ia FROM p WHERE ia % 3 = 0 AND ib % 3 = 0),
r0 AS (SELECT doc_id AS node, doc_id AS lbl FROM all_docs WHERE doc_id % 3 = 0
       UNION SELECT e0.dst, r0.lbl FROM r0 JOIN e0 ON e0.src = r0.node),
ret0 AS (SELECT node AS doc_id FROM r0 GROUP BY node HAVING MIN(lbl) = node),
-- batch 1: new ids encoded +10000000 so every retained id is smaller;
-- survivor = component min == own encoded id
x1 AS (SELECT ia AS nid, ib AS rid FROM p JOIN ret0 ON p.ib = ret0.doc_id
       WHERE ia % 3 = 1
       UNION SELECT ib, ia FROM p JOIN ret0 ON p.ia = ret0.doc_id
       WHERE ib % 3 = 1),
e1 AS (SELECT ia + 10000000 AS src, ib + 10000000 AS dst FROM p
       WHERE ia % 3 = 1 AND ib % 3 = 1
       UNION SELECT ib + 10000000, ia + 10000000 FROM p
       WHERE ia % 3 = 1 AND ib % 3 = 1
       UNION SELECT nid + 10000000, rid FROM x1
       UNION SELECT rid, nid + 10000000 FROM x1),
r1 AS (SELECT doc_id + 10000000 AS node, doc_id + 10000000 AS lbl
       FROM all_docs WHERE doc_id % 3 = 1
       UNION SELECT doc_id AS node, doc_id AS lbl FROM ret0
       UNION SELECT e1.dst, r1.lbl FROM r1 JOIN e1 ON e1.src = r1.node),
s1 AS (SELECT node - 10000000 AS doc_id FROM r1 WHERE node >= 10000000
       GROUP BY node HAVING MIN(lbl) = node),
ret1 AS (SELECT doc_id FROM ret0 UNION SELECT doc_id FROM s1),
-- batch 2: same rule against the grown retained set
x2 AS (SELECT ia AS nid, ib AS rid FROM p JOIN ret1 ON p.ib = ret1.doc_id
       WHERE ia % 3 = 2
       UNION SELECT ib, ia FROM p JOIN ret1 ON p.ia = ret1.doc_id
       WHERE ib % 3 = 2),
e2 AS (SELECT ia + 10000000 AS src, ib + 10000000 AS dst FROM p
       WHERE ia % 3 = 2 AND ib % 3 = 2
       UNION SELECT ib + 10000000, ia + 10000000 FROM p
       WHERE ia % 3 = 2 AND ib % 3 = 2
       UNION SELECT nid + 10000000, rid FROM x2
       UNION SELECT rid, nid + 10000000 FROM x2),
r2 AS (SELECT doc_id + 10000000 AS node, doc_id + 10000000 AS lbl
       FROM all_docs WHERE doc_id % 3 = 2
       UNION SELECT doc_id AS node, doc_id AS lbl FROM ret1
       UNION SELECT e2.dst, r2.lbl FROM r2 JOIN e2 ON e2.src = r2.node),
s2 AS (SELECT node - 10000000 AS doc_id FROM r2 WHERE node >= 10000000
       GROUP BY node HAVING MIN(lbl) = node)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(doc_id % 3 AS INT) AS admitted_batch
FROM (SELECT doc_id FROM ret1 UNION SELECT doc_id FROM s2)
"""


@q("dedup_incremental", INCR_DEDUP_SQL)
def dedup_incremental(spark, sf):
    """Streaming-corpus near-dup dedup (axes A+B: CDC epochs x
    curation): documents arrive in three batches (doc_id % 3 — the
    planted clone of doc i lands in a DIFFERENT batch than i, so the
    cross-batch probe path is exercised, and for i%3==2 the CLONE
    arrives first and must win by arrival order, not by id). Each
    batch is deduplicated against itself and the retained corpus via
    `IncrementalDeduper`: only new docs are shingled/hashed; the
    corpus participates through its persisted LSH band index.

    The survivor rule is exact-Jaccard-defined (LSH only generates
    candidates), so the oracle replays it per batch with the proven
    min-reachability recursive CTE, retained ids encoded below new
    ids — the same unified rule the operator applies. Oracle/detector
    agreement rides on the verified 100% LSH recall at the 0.8
    threshold on this corpus (see refine_corpus)."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True)).select("doc_id", "text")
    dd = DD.IncrementalDeduper(min_jaccard=0.8, num_perm=16, bands=8)
    outs = []
    for t in range(3):
        surv = dd.observe(docs.filter(F.col("doc_id") % 3 == t))
        outs.append(surv.select("doc_id", F.lit(t).cast("int").alias("admitted_batch")))
    return outs[0].unionByName(outs[1]).unionByName(outs[2])


def _incremental_persistent_replay(spark, sf, compact: bool):
    """Shared body of the two persistent-state incremental-dedup
    queries: three cold restarts (a FRESH IncrementalDeduper instance
    per batch over one state_dir), optionally folding the survivor log
    with `compact_state` between batches. Survivor frames are eagerly
    checkpointed, so the state dir can go before the caller collects."""
    import shutil
    import tempfile

    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True)).select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="incr_dedup_state_")
    try:
        outs = []
        for t in range(3):
            dd = DD.IncrementalDeduper(
                min_jaccard=0.8, num_perm=16, bands=8, state_dir=d
            )
            surv = dd.observe(docs.filter(F.col("doc_id") % 3 == t), batch_id=t)
            outs.append(
                surv.select("doc_id", F.lit(t).cast("int").alias("admitted_batch"))
            )
            if compact:
                dd.compact_state(spark)
        return outs[0].unionByName(outs[1]).unionByName(outs[2])
    finally:
        shutil.rmtree(d, ignore_errors=True)


@q("dedup_incremental_resume", INCR_DEDUP_SQL)
def dedup_incremental_resume(spark, sf):
    """dedup_incremental through the PERSISTENT state path with a cold
    restart between every batch, so batch 1 and 2 dedup against state
    recovered from disk (band index + shingle sets, completion-marker
    protocol), not from driver memory. Same oracle as
    dedup_incremental — resume must be semantically invisible."""
    return _incremental_persistent_replay(spark, sf, compact=False)


@q("dedup_incremental_compacted", INCR_DEDUP_SQL)
def dedup_incremental_compacted(spark, sf):
    """dedup_incremental_resume with `compact_state` between every
    batch: the per-batch survivor log is folded into a single tagged
    base relation (crash-safe marker protocol, covered dirs removed)
    before the next batch probes it. Same oracle — compaction of the
    dedup state must be semantically invisible, exactly as the table
    layer's compact_files is to readers."""
    return _incremental_persistent_replay(spark, sf, compact=True)


RECALL_ORACLE = (
    "SELECT CAST(10 AS BIGINT) AS n_planted, CAST(10 AS BIGINT) AS n_found, "
    "TRUE AS all_found"
)


def _planted_recall(spark, pairs: DataFrame) -> DataFrame:
    """Recall scalar over the 10 planted near-dup pairs, computed
    entirely in Spark (semi-join of the planted set against the
    detector's output) — the VALUES oracle then makes detector QUALITY
    a driver-checked invariant, not just a pytest assertion."""
    planted = spark.createDataFrame(
        [(i, i + 100000) for i in range(10)], "id_a long, id_b long"
    )
    hits = planted.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    return hits.agg(
        F.lit(10).cast("long").alias("n_planted"),
        F.count("*").alias("n_found"),
        (F.count("*") == 10).alias("all_found"),
    )


@q("dedup_minhash_recall", RECALL_ORACLE)
def dedup_minhash_recall(spark, sf):
    """MinHash+LSH must FIND all 10 planted near-dupes (P2 quality as
    a driver-green check; mirrors tests/test_dedup_recall.py)."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    sh = DD.word_shingles(docs)
    sig = DD.minhash_signatures(sh, num_perm=16)
    pairs = DD.jaccard_verify(DD.lsh_candidate_pairs(sig, bands=4), sh, min_jaccard=0.5)
    return _planted_recall(spark, pairs)


@q("dedup_simhash_recall", RECALL_ORACLE)
def dedup_simhash_recall(spark, sf):
    """SimHash at radius 4 / 5 blocks finds all planted pairs (P3)."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    pairs = DD.simhash_near_pairs(DD.simhash(docs), max_hamming=4, blocks=5)
    return _planted_recall(spark, pairs)


@q("dedup_ngram_recall", RECALL_ORACLE)
def dedup_ngram_recall(spark, sf):
    """Word n-gram Jaccard (DF-capped candidate join) finds all planted
    pairs (P4)."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    pairs = DD.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.8)
    return _planted_recall(spark, pairs)


@q(
    "ann_ivf_recall",
    "SELECT CAST(8 AS BIGINT) AS n_lists, CAST(4 AS BIGINT) AS nprobe, "
    "TRUE AS recall_floor_met",
)
def ann_ivf_recall(spark, sf):
    """IVF recall vs brute force computed entirely in Spark (P8
    quality): measured 0.70 (sf0.001) / 0.78 (sf0.01) against the 0.65
    floor — the isotropic synthetic embeddings cap recall near
    covered-mass (see tests/test_joins_similarity.py)."""
    emb = load(spark, sf, "embeddings", spread=True)
    qs = emb.filter(F.col("vec_id") < 10)
    exact = SIM.brute_force_topk(emb, qs, k=5).select("query_id", "neighbor_id")
    approx = SIM.ivf_bucketed_topk(emb, qs, k=5, n_lists=8, nprobe=4).select(
        "query_id", "neighbor_id"
    )
    n_hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    n_tot = exact.agg(F.count("*").alias("n_tot"))
    return n_hit.crossJoin(n_tot).select(
        F.lit(8).cast("long").alias("n_lists"),
        F.lit(4).cast("long").alias("nprobe"),
        (F.col("n_hit") / F.col("n_tot") >= 0.65).alias("recall_floor_met"),
    )


ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
v AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
scored AS (SELECT query_id, neighbor_id,
                  ROUND(list_cosine_similarity(qv, nv), 3) AS sim
           FROM q, v WHERE query_id <> neighbor_id),
ranked AS (SELECT query_id, neighbor_id,
                  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS INT) AS rank
           FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
"""


@q("ann_cosine_topk", ANN_SQL)
def ann_cosine_topk(spark, sf):
    emb = load(spark, sf, "embeddings", spread=True)
    return SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@q(
    "ann_lsh_topk",
    "SELECT CAST(10 AS BIGINT) AS n_queries, "
    "CAST(10 AS BIGINT) AS n_planted_hits, TRUE AS planted_all_rank1",
)
def ann_lsh_topk(spark, sf):
    """LSH-bucketed top-k, driver-checked by the property LSH actually
    promises: a vector IDENTICAL to the query (planted copy, id+1e6)
    hashes to the query's bucket with probability 1 and must come back
    as its rank-1 neighbor for all 10 queries. A brute-force-recall
    floor (the IVF pattern) is meaningless here: on isotropic
    synthetic embeddings a single probed bucket covers 1/2^8 of the
    corpus, so recall vs global top-k is covered-mass-bound at ~2-4%
    by construction (measured both scales) — near-duplicate retrieval,
    not global ranking, is the LSH contract. The hyperplane family
    itself is not SQL-expressible; the invariant row is (full top-k
    output exercised in tests/test_joins_similarity.py)."""
    emb = load(spark, sf, "embeddings", spread=True)
    qs = emb.filter(F.col("vec_id") < 10)
    planted = qs.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    topk = SIM.lsh_bucketed_topk(emb.unionByName(planted), qs, k=5)
    hits = topk.filter(F.col("neighbor_id") == F.col("query_id") + 1_000_000)
    return hits.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_planted_hits"),
        (F.max("rank") == 1).alias("planted_all_rank1"),
    )


NEARDUP_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 60)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.v, b.v), 3) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 3) >= 0.35
"""


@q("embedding_neardup_cosine", NEARDUP_SQL)
def embedding_neardup_cosine(spark, sf):
    return SIM.neardup_pairs_by_cosine(
        load(spark, sf, "embeddings", spread=True), threshold=0.35, max_id=60
    )


PACK_SQL = """
WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tok FROM documents),
o AS (SELECT doc_id, n_tok,
        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
      FROM d),
c AS (SELECT doc_id, n_tok, s,
        UNNEST(range(s // 512, (s + n_tok - 1) // 512 + 1)) AS chunk_id
      FROM o WHERE n_tok > 0)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(LEAST(s + n_tok, (chunk_id + 1) * 512)
            - GREATEST(s, chunk_id * 512) AS BIGINT) AS n_in_chunk
FROM c
"""


@q("pack_sequences", PACK_SQL)
def pack_sequences_q(spark, sf):
    """Fixed-length training-sequence packing manifest via distributed
    prefix sum (operators/pack.py) — the single-partition global-window
    formulation is the oracle, the engine must match it with a fully
    parallel plan. n_chars stands in for the token count (packing
    consumes lengths only)."""
    from canal_spark.operators.pack import pack_sequences

    d = load(spark, sf, "documents").select(
        "doc_id", F.col("n_chars").alias("n_tok")
    )
    return pack_sequences(d, seq_len=512)


@q(
    "mor_replay_modes_agree",
    "SELECT TRUE AS states_identical, TRUE AS compaction_preserved_state, "
    "TRUE AS fragments_folded",
)
def mor_replay_modes_agree(spark, sf):
    """Merge-on-read vs copy-on-write replay of one deterministic
    mini-changelog: the MoR resolved view must equal the CoW state
    including `_seq`/`_tombstone`, compaction (compact_files) must fold
    every fragment without changing a row, and the folded table must
    still equal the CoW state. The invariants are computed entirely in
    Spark; the VALUES oracle driver-checks them every round."""
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    import shutil

    tmp = tempfile.mkdtemp(prefix="canal_mor_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        tc = SnapshotTable.create(f"{tmp}/cow", n_buckets=4)
        CdcEngine(spark, log, tc, lsn_budget=500).run_to_completion()
        tm = SnapshotTable.create(f"{tmp}/mor", n_buckets=4)
        CdcEngine(spark, log, tm, lsn_budget=500, write_mode="mor").run_to_completion()
        cow = tc.read(spark, internal=True)
        mor = tm.read(spark, internal=True)
        same1 = cow.exceptAll(mor).count() == 0 and mor.exceptAll(cow).count() == 0
        packed = tm.compact_files(spark, target_bytes=1 << 30)
        post = tm.read(spark, internal=True)
        same2 = post.exceptAll(cow).count() == 0 and cow.exceptAll(post).count() == 0
        folded = bool(packed) and all(
            len(fs) == 1 for fs in tm.snapshot()["files"].values()
        )
    finally:
        # every invariant is already materialized (counts/booleans):
        # the fixture is removable before the literal-frame return
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(same1, same2, folded)],
        "states_identical boolean, compaction_preserved_state boolean, "
        "fragments_folded boolean",
    )


@q(
    "incremental_changes_consistent",
    "SELECT TRUE AS reconstructs_snapshot, TRUE AS noop_epochs_emit_nothing, "
    "TRUE AS deletes_present",
)
def incremental_changes_consistent(spark, sf):
    """Incremental change feed (table-as-a-source, Delta-CDF analog):
    read_changes(a, b) applied to snapshot a must reconstruct snapshot
    b exactly; a compaction epoch must emit zero changes; the feed
    carries DELETEs. Invariants computed in Spark over a deterministic
    mini-replay; VALUES oracle driver-checks them."""
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    import shutil

    tmp = tempfile.mkdtemp(prefix="canal_cdf_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        table = SnapshotTable.create(f"{tmp}/t", n_buckets=4)
        eng = CdcEngine(spark, log, table, lsn_budget=500, write_mode="mor")
        eng.run_epoch()
        e1 = table.current_epoch()
        eng.run_to_completion()
        final = table.current_epoch()
        cols = ["doc_id", "tokens", "n_tok", "source"]
        changes = table.read_changes(spark, e1, final)
        a = table.read(spark, epoch=e1, with_bucket=False).select(*cols)
        reconstructed = a.join(
            changes.select("doc_id"), "doc_id", "left_anti"
        ).unionByName(changes.filter(F.col("op") != "DELETE").select(*cols))
        b = table.read(spark, epoch=final, with_bucket=False).select(*cols)
        ok1 = (
            reconstructed.exceptAll(b).count() == 0
            and b.exceptAll(reconstructed).count() == 0
        )
        deletes_present = changes.filter(F.col("op") == "DELETE").count() > 0
        table.compact_files(spark, target_bytes=1 << 30)
        ok2 = table.read_changes(spark, final, table.current_epoch()).count() == 0
    finally:
        # invariants materialized above; fixture removable pre-return
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(ok1, ok2, deletes_present)],
        "reconstructs_snapshot boolean, noop_epochs_emit_nothing boolean, "
        "deletes_present boolean",
    )


@q(
    "rdb_sink_parity",
    "SELECT TRUE AS store_matches_table, TRUE AS epochs_marked, "
    "TRUE AS reapply_noop",
)
def rdb_sink_parity(spark, sf):
    """Concrete RDB store driver (S8, r5): a mini end-to-end replay
    with DuckDBSink attached — the ACID store's final state must equal
    the engine's own table, every epoch must be marked exactly once,
    and re-delivering an already-marked epoch (with poisoned content)
    must change nothing. The r4 boolean-VALUES pattern; full coverage
    incl. the LWW rollback guard in tests/test_sinks.py."""
    import shutil
    import tempfile

    import duckdb

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sinks import DuckDBSink
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    tmp = tempfile.mkdtemp(prefix="canal_rdb_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        sink = DuckDBSink(f"{tmp}/sink.duckdb", table="docs")
        table = SnapshotTable.create(f"{tmp}/table", n_buckets=4)
        eng = CdcEngine(spark, log, table, lsn_budget=500, sinks=(sink,))
        final = eng.run_to_completion()
        con = duckdb.connect(f"{tmp}/sink.duckdb")
        store = sorted(
            con.execute("SELECT doc_id, n_tok, source FROM docs").fetchall()
        )
        n_marked = con.execute("SELECT COUNT(*) FROM __canal_epochs").fetchone()[0]
        con.close()
        engine_rows = sorted(
            (r["doc_id"], r["n_tok"], r["source"])
            for r in table.read(spark).select("doc_id", "n_tok", "source").collect()
        )
        matches = store == engine_rows
        # re-deliver a marked epoch with poisoned content: must no-op
        poison = spark.createDataFrame(
            [("poison", "INSERT", [0], 0, "srcX", 1 << 40)],
            "doc_id string, op string, tokens array<long>, n_tok long, "
            "source string, _seq long",
        )
        sink.apply(spark, poison, final)
        con = duckdb.connect(f"{tmp}/sink.duckdb")
        after = sorted(
            con.execute("SELECT doc_id, n_tok, source FROM docs").fetchall()
        )
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(matches, n_marked == final, after == store)],
        "store_matches_table boolean, epochs_marked boolean, reapply_noop boolean",
    )


REFINE_SQL = """
WITH RECURSIVE kept AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))),
sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 3 + 2),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE [array_to_string(w, ' ')] END) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM kept)),
p AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
e AS (SELECT ia AS src, ib AS dst FROM p UNION SELECT ib, ia FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS lbl FROM kept
  UNION
  SELECT e.dst AS node, r.lbl FROM r JOIN e ON e.src = r.node),
canon AS (SELECT node, MIN(lbl) AS cluster FROM r GROUP BY node),
fuzzy AS (
  SELECT k.* FROM kept k JOIN canon c ON k.doc_id = c.node
  WHERE c.cluster = k.doc_id),
scored AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tok,
    LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0, 1.0)
    + CAST(len(list_filter(string_split(text, ' '),
                x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
      / CAST(len(string_split(text, ' ')) AS DOUBLE)
    - CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      / CAST(LENGTH(text) AS DOUBLE) AS quality,
    CASE WHEN strpos(text, ' the ') > 0 THEN 'en'
         WHEN strpos(text, ' el ') > 0 THEN 'es'
         WHEN strpos(text, ' le ') > 0 THEN 'fr'
         WHEN strpos(text, ' der ') > 0 THEN 'de' ELSE 'und' END AS lang
  FROM fuzzy),
survivors AS (SELECT doc_id, n_tok FROM scored WHERE quality >= 0.5 AND lang <> 'und'),
o AS (SELECT doc_id, n_tok,
        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
      FROM survivors),
c AS (SELECT doc_id, n_tok, s,
        UNNEST(range(s // 512, (s + n_tok - 1) // 512 + 1)) AS chunk_id
      FROM o WHERE n_tok > 0)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(LEAST(s + n_tok, (chunk_id + 1) * 512)
            - GREATEST(s, chunk_id * 512) AS BIGINT) AS n_in_chunk
FROM c
"""


@q("refine_corpus", REFINE_SQL)
def refine_corpus(spark, sf):
    """End-to-end corpus refinement, the P-family composed stage by
    stage: exact dedup (md5 groupBy + semi-join keep-min) -> NEAR-dup
    CLUSTER drop (MinHash banding generates candidates, exact
    word-3-gram Jaccard >= 0.8 verifies, connected components collapse
    transitive chains, keep the min-id CANONICAL doc per component —
    r5, replacing the r4 pairwise larger-id drop that kept both ends
    of an A~B~C chain) -> quality + language gate (JVM scan-only
    expressions) -> fixed-length sequence packing (distributed prefix
    sum). Everything except the O(component-diameter) label-
    propagation rounds stays one fused lazy plan.

    The near-dup stage is EXACT-Jaccard-defined, so the oracle replays
    it as an all-pairs DuckDB join + recursive min-reachability CTE
    (the proven dedup_cluster_assign oracle); MinHash+LSH is only the
    candidate generator. Detector/oracle agreement therefore requires
    100% LSH recall at the 0.8 threshold — verified on this corpus at
    sf0.001 and sf0.01 (28/28 and 25/25 natural near-dup pairs found;
    at bands=8/r=2 a j=0.8 pair escapes banding with p~3e-4). At
    corpus scale the all-pairs oracle is the one that's impossible and
    the LSH path is the real algorithm."""
    return refine_corpus_stages(spark, sf)[-1][1]()


def refine_corpus_stages(spark, sf):
    """Ordered (name, thunk) stage boundaries of refine_corpus for
    bench attribution (VERDICT r4 "what's wrong" #1: the single wall
    couldn't tell stage drift from noise). Each thunk builds the
    pipeline UP TO its boundary; stages share lineage, so timing them
    cumulatively and differencing attributes the marginal stage cost.
    The near-dup thunk triggers the label-propagation rounds at
    construction time (connected_components' convergence loop) — that
    driver-side cost belongs to the near-dup stage and lands there."""
    from canal_spark.operators.pack import pack_sequences

    docs = load(spark, sf, "documents", spread=True)
    keep_ids = docs.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = docs.join(keep_ids.select("doc_id"), "doc_id", "left_semi")

    def near_stage() -> DataFrame:
        sh = DD.word_shingles(kept)
        sig = DD.minhash_signatures(sh, num_perm=16)
        pairs = DD.jaccard_verify(
            DD.lsh_candidate_pairs(sig, bands=8), sh, min_jaccard=0.8
        )
        clusters = DD.connected_components(pairs, kept.select("doc_id"))
        canonical = clusters.filter(
            F.col("doc_id") == F.col("cluster_id")
        ).select("doc_id")
        return kept.join(canonical, "doc_id", "left_semi")

    def pack_stage() -> DataFrame:
        survivors = near_stage().filter(
            (TX.quality_score("text") >= 0.5)
            & (TX.lang_id_heuristic("text") != "und")
        ).select("doc_id", F.col("n_chars").cast("long").alias("n_tok"))
        return pack_sequences(survivors, seq_len=512)

    return [
        ("exact_dedup", lambda: kept),
        ("near_dup", near_stage),
        ("gate_pack", pack_stage),
    ]


WINNOW_SQL = """
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 4, 1) + 1),
                        i -> md5(substring(text, i, 5))) AS hashes
  FROM documents),
m AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hashes) - 3, 1) + 1),
                        i -> list_min(hashes[i:i+3]))) AS fps
  FROM g)
SELECT doc_id, UNNEST(fps) AS fp FROM m
"""


@q("winnowing_fingerprints", WINNOW_SQL)
def winnowing_fingerprints_q(spark, sf):
    """Rolling-hash document fingerprints (MOSS winnowing): min gram
    hash per sliding window, distinct survivors. md5-hex ordering makes
    the fingerprint sets byte-identical to the SQL oracle."""
    return TX.winnowing_fingerprints(load(spark, sf, "documents", spread=True), k=5, w=4)


@q(
    "lang_id_heuristic",
    "SELECT doc_id, CASE WHEN strpos(text, ' the ') > 0 THEN 'en' "
    "WHEN strpos(text, ' el ') > 0 THEN 'es' WHEN strpos(text, ' le ') > 0 THEN 'fr' "
    "WHEN strpos(text, ' der ') > 0 THEN 'de' ELSE 'und' END AS pred_lang FROM documents",
)
def lang_id_heuristic(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id", TX.lang_id_heuristic("text").alias("pred_lang")
    )


@q(
    "token_budget_cap",
    "WITH c AS (SELECT doc_id, source, n_chars, SUM(n_chars) OVER "
    "(PARTITION BY source ORDER BY doc_id) AS cum FROM documents) "
    "SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_tok "
    "FROM c WHERE cum <= 20000",
)
def token_budget_cap(spark, sf):
    """Per-source token-budget cap (P21): each source contributes at
    most 20k tokens to the mix, taken as its deterministic doc_id-order
    prefix — one window pass, no second scan."""
    docs = load(spark, sf, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_tok")
    )
    return TX.cap_token_budget(docs, budget=20_000)


@q(
    "quality_score",
    "SELECT doc_id, LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0, 1.0) "
    "+ CAST(len(list_filter(string_split(text, ' '), "
    "x -> x IN ('the','a','of','and','to'))) AS DOUBLE) "
    "  / CAST(len(string_split(text, ' ')) AS DOUBLE) "
    "- CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) "
    "  / CAST(LENGTH(text) AS DOUBLE) AS quality FROM documents",
)
def quality_score(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id", TX.quality_score("text").alias("quality")
    )


@q(
    "token_count",
    "SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_ws, "
    "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_bpe "
    "FROM documents",
)
def token_count(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id",
        TX.token_count_whitespace("text").alias("n_ws"),
        TX.token_count_bpe_ish("text").alias("n_bpe"),
    )


PII_SQL = (
    "SELECT doc_id, regexp_replace(regexp_replace("
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com tel 555-867-5309', "
    r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean FROM documents"
)


@q("pii_scrub", PII_SQL)
def pii_scrub_q(spark, sf):
    """PII redaction over the corpus with deterministically planted
    emails/phones (the synthetic corpus has none, so the query plants
    one of each per doc — proving the scrub, not the absence)."""
    docs = load(spark, sf, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel 555-867-5309"),
    )
    return docs.select("doc_id", TX.pii_scrub(planted).alias("clean"))


VOCAB_SQL = """
SELECT term, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents)
GROUP BY term ORDER BY n DESC, term ASC LIMIT 20
"""


@q("vocab_top_terms", VOCAB_SQL)
def vocab_top_terms_q(spark, sf):
    return TX.vocab_top_terms(load(spark, sf, "documents"), k=20)


CONTAM_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id < 10),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 8
              THEN list_transform(range(1, len(w) - 8 + 2),
                                  i -> array_to_string(w[i:i+7], ' '))
              ELSE [array_to_string(w, ' ')] END AS grams
  FROM toks),
b AS (SELECT DISTINCT UNNEST(grams) AS gr FROM g WHERE doc_id < 5),
c AS (SELECT doc_id, UNNEST(list_distinct(grams)) AS gr FROM g WHERE doc_id >= 5)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM c JOIN b USING (gr) GROUP BY c.doc_id
"""


@q("contamination_overlap", CONTAM_SQL)
def contamination_overlap(spark, sf):
    """Train/test contamination: docs sharing any word 8-gram with the
    'benchmark' set (stand-in: docs 0-4). The corpus's natural 8-grams
    never repeat across documents, so contaminated docs are PLANTED
    (the near-dup fixture: docs 100000-100004 embed benchmark texts;
    100005+ embed non-benchmark texts and must NOT flag). Benchmark
    grams broadcast; the corpus side never shuffles."""
    docs = _with_planted_dupes(load(spark, sf, "documents", spread=True))
    bench = docs.filter(F.col("doc_id") < 5)
    corpus = docs.filter(F.col("doc_id") >= 5)
    return TX.benchmark_contamination(corpus, bench, n=8)


@q(
    "point_lookup_file_skipping",
    "SELECT TRUE AS value_correct, TRUE AS skipped_files, TRUE AS range_correct",
)
def point_lookup_file_skipping(spark, sf):
    """R12 manifest-bounds file skipping as a driver-checked invariant:
    a single-bucket table holding three key-disjoint files (base
    a-keys, fragment m-keys, fragment z-keys) must answer a point
    lookup by OPENING EXACTLY ONE FILE (`inputFiles()` on the executed
    plan — the Iceberg lower/upper_bounds behavior) and return the
    correct row; a half-open range read must also skip to one file."""
    import shutil
    import tempfile

    from canal_spark.operators.merge import append_epoch, merge_epoch
    from canal_spark.plans.table import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="canal_skip_")
    table = SnapshotTable.create(f"{tmp}/t", n_buckets=1)

    def delta(keys, seq0):
        rows = [(k, [i], 1, "s0", "INSERT", seq0 + i) for i, k in enumerate(keys)]
        return spark.createDataFrame(
            rows,
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, _seq long",
        )

    for i, (prefix, seq0) in enumerate([("a", 0), ("m", 1000), ("z", 2000)]):
        epoch = i + 1
        d = delta([f"{prefix}{j:04d}" for j in range(20)], seq0)
        if epoch == 1:
            table.commit(epoch, merge_epoch(spark, table, d, epoch), {}, [])
        else:
            table.commit(
                epoch, append_epoch(spark, table, d, epoch), {}, [], append=True
            )
    n_files = sum(len(fs) for fs in table.snapshot()["files"].values())
    point = table.read(spark, key_range=("m0005", "m0005"))
    point_rows = point.collect()
    value_correct = (
        len(point_rows) == 1
        and point_rows[0]["doc_id"] == "m0005"
        and list(point_rows[0]["tokens"]) == [5]
    )
    skipped = n_files == 3 and len(point.inputFiles()) == 1
    rng = table.read(spark, key_range=("z0000", None))
    range_correct = len(rng.inputFiles()) == 1 and rng.count() == 20
    shutil.rmtree(tmp, ignore_errors=True)  # invariants materialized above
    return spark.createDataFrame(
        [(value_correct, skipped, range_correct)],
        "value_correct boolean, skipped_files boolean, range_correct boolean",
    )


DECONTAM_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || ' extra' AS text
  FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT 200000 AS doc_id,
         array_to_string((string_split(text, ' '))[1:10], ' ') || ' qz0 qz1' AS text
  FROM documents WHERE doc_id = 0),
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM all_docs),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 8
              THEN list_transform(range(1, len(w) - 8 + 2),
                                  i -> array_to_string(w[i:i+7], ' '))
              ELSE [array_to_string(w, ' ')] END AS grams
  FROM toks),
b AS (SELECT DISTINCT UNNEST(grams) AS gr FROM g WHERE doc_id < 5),
c AS (SELECT doc_id, UNNEST(list_distinct(grams)) AS gr FROM g WHERE doc_id >= 5),
ov AS (SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM c JOIN b USING (gr) GROUP BY c.doc_id)
SELECT d.doc_id, COALESCE(ov.n_shared, 0) AS n_shared,
       COALESCE(ov.n_shared, 0) <= 4 AS kept
FROM (SELECT doc_id FROM all_docs WHERE doc_id >= 100000) d
LEFT JOIN ov USING (doc_id)
"""


@q("decontaminate_corpus", DECONTAM_SQL)
def decontaminate_corpus(spark, sf):
    """The removal action on top of R9's detector (TX.decontaminate):
    drop corpus docs sharing more than `max_shared=4` word 8-grams
    with the benchmark set. Planted fixture exercises both sides of
    the threshold: docs 100000-100004 embed benchmark texts wholesale
    (dozens of shared grams -> dropped); 100005+ embed NON-benchmark
    texts (0 shared -> kept); doc 200000 embeds exactly a 10-word
    benchmark prefix (3 shared grams, under the threshold -> kept,
    proving the boundary). `kept` comes from the operator's actual
    output (anti-join membership), not recomputed."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    w = F.split(F.col("text"), " ")
    probe = docs.filter(F.col("doc_id") == 0).select(
        F.lit(200000).cast("long").alias("doc_id"),
        F.concat(F.concat_ws(" ", F.slice(w, 1, 10)), F.lit(" qz0 qz1")).alias("text"),
    )
    all_docs = docs.unionByName(dupes).unionByName(probe)
    bench = all_docs.filter(F.col("doc_id") < 5)
    corpus = all_docs.filter(F.col("doc_id") >= 5)
    overlaps = TX.benchmark_contamination(corpus, bench, n=8)
    clean = TX.decontaminate(corpus, bench, n=8, max_shared=4)
    return (
        corpus.filter(F.col("doc_id") >= 100000)
        .select("doc_id")
        .join(overlaps, "doc_id", "left")
        .join(
            clean.select("doc_id").withColumn("_kept", F.lit(True)), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            F.coalesce(F.col("_kept"), F.lit(False)).alias("kept"),
        )
    )


SPLIT_THR = format(int(0.1 * 16**8), "08x")

SPLIT_SQL = (
    f"SELECT doc_id, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
    f"< '{SPLIT_THR}' THEN 'val' ELSE 'train' END AS split FROM documents"
)


@q("train_val_split", SPLIT_SQL)
def train_val_split_q(spark, sf):
    return TX.train_val_split(load(spark, sf, "documents"), val_frac=0.1).select(
        "doc_id", "split"
    )


GROUP_SPLIT_SQL = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text AS text FROM documents WHERE doc_id < 10),
s AS (SELECT doc_id,
        CASE WHEN substring(md5(md5(text)), 1, 8) < '{thr}'
             THEN 'val' ELSE 'train' END AS split
      FROM all_docs)
SELECT g.n_groups_split AS n_groups_split, s2.n_val > 0 AS has_val
FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups_split FROM (
        SELECT 1 FROM s JOIN all_docs USING (doc_id)
        GROUP BY md5(text) HAVING COUNT(DISTINCT split) > 1)) g,
     (SELECT CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_val FROM s) s2
""".replace("{thr}", SPLIT_THR)


@q("leakage_free_split", GROUP_SPLIT_SQL)
def leakage_free_split(spark, sf):
    """Group-aware split with planted EXACT duplicates (docs 100000+
    copy docs 0-9 verbatim): hashing by the content fingerprint must
    put every duplicate group wholly in one split — n_groups_split
    (groups straddling train/val) must be 0."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    all_docs = docs.unionByName(dupes)
    s = TX.train_val_split(all_docs, val_frac=0.1, group_expr=F.md5(F.col("text")))
    straddling = (
        s.groupBy(F.md5("text"))
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count("*").alias("n_groups_split"))
    )
    has_val = s.agg(
        (F.sum((F.col("split") == "val").cast("long")) > 0).alias("has_val")
    )
    return straddling.crossJoin(has_val)


REPETITION_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id,
        CASE WHEN len(w) >= 2
             THEN list_transform(range(1, len(w) - 2 + 2),
                                 i -> array_to_string(w[i:i+1], ' '))
             ELSE [array_to_string(w, ' ')] END AS grams
      FROM t)
SELECT doc_id,
       CASE WHEN len(grams) > 0
            THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
            ELSE 0.0 END AS dup_ngram_frac,
       CASE WHEN len(grams) > 0
            THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
            ELSE 0.0 END > 0.2 AS repetitive
FROM g
"""


@q("intra_doc_repetition", REPETITION_SQL)
def intra_doc_repetition_q(spark, sf):
    """Gopher-style WITHIN-document repetition gate (P18): fraction of
    repeated word 2-grams per doc, scan-side array expressions only —
    boilerplate and degenerate text score high and get gated before
    training."""
    scored = TX.intra_doc_repetition(load(spark, sf, "documents"), n=2)
    return scored.select(
        "doc_id",
        "dup_ngram_frac",
        (F.col("dup_ngram_frac") > 0.2).alias("repetitive"),
    )


MIX_THR = format(int(0.3 * 16**8), "08x")

MIX_SQL = f"""
SELECT doc_id, 0 AS mix_source FROM documents WHERE lang = 'en'
UNION ALL
SELECT doc_id, 1 AS mix_source FROM documents
WHERE lang <> 'en'
  AND substring(md5(CAST(doc_id AS VARCHAR) || '#9'), 1, 8) < '{MIX_THR}'
"""


@q("mix_corpora", MIX_SQL)
def mix_corpora_q(spark, sf):
    """Weighted deterministic corpus mixing (P19): keep all of the
    'en' corpus, down-sample the rest to 30% by seeded md5 threshold,
    tag with mix_source — scan-side filters + union, zero shuffles
    (the declared-ratio mixing pass of training-corpus assembly)."""
    docs = load(spark, sf, "documents")
    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    return TX.mix_corpora([en, rest], [1.0, 0.3], seed=9).select(
        "doc_id", "mix_source"
    )


SHUFFLE_SQL = """
WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#0') AS hx FROM documents),
s AS (SELECT doc_id, hx,
        CAST(('0x' || substring(hx, 1, 8))::BIGINT % 64 AS INT) AS shard
      FROM h)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
            ORDER BY hx, CAST(doc_id AS VARCHAR)) AS INT) AS rank_in_shard
FROM s
"""


@q("shuffle_shards", SHUFFLE_SQL)
def shuffle_shards_q(spark, sf):
    """Deterministic sharded shuffle for training order (P16): shard =
    hash of the seeded id (scan-side), position = per-shard window —
    how 10^10 examples shuffle WITHOUT the naive global ORDER BY
    rand() single-merge sort. Engine-portable by construction (md5
    only), hence the full SQL oracle."""
    return TX.shuffle_shards(
        load(spark, sf, "documents"), n_shards=64, seed=0
    ).select("doc_id", "shard", "rank_in_shard")


STRAT_SQL = """
WITH h AS (SELECT doc_id, lang,
             md5(CAST(doc_id AS VARCHAR) || '#7') AS hx FROM documents),
r AS (SELECT doc_id, lang,
        ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY hx, CAST(doc_id AS VARCHAR)) AS rn
      FROM h)
SELECT doc_id, lang FROM r WHERE rn <= 25
"""


@q("sample_stratified", STRAT_SQL)
def sample_stratified_q(spark, sf):
    """Per-group quota sampling (P17): at most k rows per language,
    drawn by deterministic hash order (reproducible across runs,
    partitionings, and engines) — the per-language / per-source
    balancing pass of corpus mixing. One hash exchange on the group
    key; rank-and-filter never materializes a group."""
    return TX.sample_stratified(
        load(spark, sf, "documents").select("doc_id", "lang"),
        group_col="lang",
        k=25,
        seed=7,
    )


@q(
    "doc_fingerprint",
    "SELECT doc_id, md5(concat(lang, ':', text)) AS fp FROM documents",
)
def doc_fingerprint(spark, sf):
    return load(spark, sf, "documents").select(
        "doc_id", TX.fingerprint("text", salt="lang").alias("fp")
    )


FRAME_SAMPLE_SQL = """
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
f AS (SELECT doc_id,
             UNNEST(generate_series(0, nb % 24 + 8 - 1, 4)) AS fi,
             LEAST(16, nb) AS fl
      FROM d)
SELECT doc_id, CAST(fi AS INT) AS frame_idx, CAST(fl AS INT) AS frame_len FROM f
"""


@q("multimodal_frame_sample", FRAME_SAMPLE_SQL)
def multimodal_frame_sample(spark, sf):
    """Frame-sampling fan-out over media blobs: one row per kept frame
    (mapInPandas, explicit schema). The metadata (n_frames) is a pure
    function of the payload bytes, so the fan-out cardinality and
    frame lengths are SQL-computable — the decode itself stays a
    declared stub (functions/multimodal.py)."""
    from canal_spark.functions import multimodal as MM

    media = MM.attach_media_meta(
        load(spark, sf, "documents").select(
            "doc_id", F.encode("text", "UTF-8").alias("payload")
        )
    )
    return MM.frame_sample(media, every_n=4).select("doc_id", "frame_idx", "frame_len")


#: the stub decode is DETERMINISTIC (byte length + first 8 payload
#: bytes as little-endian int64), so the full mapInPandas output is
#: SQL-replayable: per-char ord() × integer SHIFTS (power() would
#: round — the sum spans >53 mantissa bits). Assumes the ASCII corpus
#: (chars == bytes, high byte < 0x80 so feat never wraps negative);
#: a non-ASCII corpus would hash-mismatch loudly, not silently.
DECODE_STUB_SQL = """
SELECT doc_id,
  CAST(strlen(text) AS INT) AS n_bytes,
  CAST(COALESCE(list_sum(list_transform(range(1, LEAST(length(text), 8) + 1),
    i -> ord(substr(text, CAST(i AS INT), 1))
         * (CAST(1 AS BIGINT) << CAST(8*(i-1) AS INT)))), 0) AS BIGINT) AS feat
FROM documents
"""


@q("multimodal_decode_stub", DECODE_STUB_SQL)
def multimodal_decode_stub(spark, sf):
    """Multimodal binary plumbing (P13's Spark half): UTF-8 payload ->
    mapInPandas Arrow-batched 'decode'. The real decoder seam stays
    stubbed (no media libs in-sandbox), but since r5 the stub's
    deterministic output is oracle-checked row-by-row — the batching,
    schema, and byte plumbing are driver-verified, not just smoke-run."""
    from canal_spark.functions.tokens import multimodal_decode_stub as decode

    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode(docs)


@q(
    "flatmessage_roundtrip",
    f"WITH {MAPPED.strip()} "
    "SELECT lsn AS msg_id, key, op, value, epoch_us(ts) AS es FROM mapped "
    "WHERE op IN ('INSERT','UPDATE','DELETE')",
)
def flatmessage_roundtrip(spark, sf):
    """Canal FlatMessage edge (S6): encode each change event as the
    reference's flat MQ JSON (stringly-typed data maps), parse it back
    with the explicit-schema `from_json` reader, explode + re-type. The
    oracle computes the same result relationally WITHOUT the JSON hop,
    so the check proves encode -> parse -> explode is lossless."""
    from canal_spark.sources.flat_message import parse_flat_messages

    ch = events_as_changelog(spark, sf, spread=True).filter(
        F.col("op").isin("INSERT", "UPDATE", "DELETE")
    )
    flat = ch.select(
        F.to_json(
            F.struct(
                F.col("lsn").alias("id"),
                F.lit("testdb").alias("database"),
                F.lit("docs").alias("table"),
                F.array(F.lit("key")).alias("pkNames"),
                F.lit(False).alias("isDdl"),
                F.col("op").alias("type"),
                # session TZ pinned UTC, so NTZ -> instant is exact
                F.unix_micros(F.col("ts").cast("timestamp")).alias("es"),
                F.array(
                    F.create_map(
                        F.lit("key"),
                        F.col("key").cast("string"),
                        F.lit("value"),
                        F.col("value").cast("string"),
                    )
                ).alias("data"),
            )
        ).alias("msg")
    )
    rows = parse_flat_messages(flat, "msg")
    return rows.select(
        "msg_id",
        F.col("row")["key"].cast("bigint").alias("key"),
        "op",
        F.col("row")["value"].cast("double").alias("value"),
        "es",
    )


# ======================================================================
# joins beyond equi: as-of / range (⊘ in canal, SURVEY.md §2.3 J3)
# ======================================================================
ASOF_SQL = """
WITH p AS (SELECT event_id AS purchase_lsn, user_id AS key, ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id AS key, ts,
             CAST(MAX(event_id) AS BIGINT) AS click_lsn,
             arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.key, p.ts, p.purchase_lsn, c.click_lsn, c.click_value
FROM p ASOF LEFT JOIN c ON p.key = c.key AND p.ts >= c.ts
"""


ASOF_NULL_SQL = """
WITH p AS (SELECT event_id AS purchase_lsn, user_id AS key, ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id AS key, ts,
             CAST(MAX(event_id) AS BIGINT) AS click_lsn,
             CASE WHEN MAX(event_id) % 3 = 0 THEN NULL
                  ELSE arg_max(value, event_id) END AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.key, p.ts, p.purchase_lsn, c.click_lsn, c.click_value
FROM p ASOF LEFT JOIN c ON p.key = c.key AND p.ts >= c.ts
"""


@q("asof_join_nullable_values", ASOF_NULL_SQL)
def asof_join_nullable_values(spark, sf):
    """ASOF semantics under NULL right-side values (every third click's
    value nulled): the attached row must be the latest right row AS A
    WHOLE — its NULL fields included — not a per-column carry-forward
    of older non-nulls. DuckDB's native ASOF JOIN is the oracle."""
    from canal_spark.operators.joins import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"), "ts", F.col("event_id").alias("purchase_lsn")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("key"), "ts")
        .agg(
            F.max("event_id").alias("click_lsn"),
            F.when(
                F.max("event_id") % 3 == 0, F.lit(None).cast("double")
            ).otherwise(F.max_by("value", "event_id")).alias("click_value"),
        )
    )
    return asof_join(
        purchases,
        clicks,
        key="key",
        time_col="ts",
        value_cols=["click_lsn", "click_value"],
        left_cols=["purchase_lsn"],
    )


@q("asof_join_last_click", ASOF_SQL)
def asof_join_last_click(spark, sf):
    """For every purchase: the latest click of the same user at or
    before the purchase time. Scale path = union + running last()
    (one key shuffle), NOT an inequality join."""
    from canal_spark.operators.joins import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"), "ts", F.col("event_id").alias("purchase_lsn")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("key"), "ts")
        .agg(
            F.max("event_id").alias("click_lsn"),
            F.max_by("value", "event_id").alias("click_value"),
        )
    )
    return asof_join(
        purchases,
        clicks,
        key="key",
        time_col="ts",
        value_cols=["click_lsn", "click_value"],
        left_cols=["purchase_lsn"],
    )


RANGE_JOIN_SQL = """
SELECT o.o_orderkey AS orderkey, CAST(COUNT(*) AS BIGINT) AS n_ship30
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
GROUP BY o.o_orderkey
"""


@q("range_join_ship_window", RANGE_JOIN_SQL)
def range_join_ship_window(spark, sf):
    """Line items shipped within 30 days of their order date — a range
    predicate riding on a key equi-join (hash join + post-filter, no
    nested loop)."""
    from canal_spark.operators.joins import range_join_count

    orders = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderdate"
    )
    li = load(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_shipdate"
    )
    return range_join_count(
        orders,
        li,
        on="orderkey",
        right_time="l_shipdate",
        low=F.col("o_orderdate"),
        high=F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        count_alias="n_ship30",
    )


# ======================================================================
# 2.4 A5 extras: rollup / window frames
# ======================================================================
@q(
    "rollup_event_counts",
    f"WITH {MAPPED.strip()} "
    "SELECT source_partition, op, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CASE WHEN op IN ('INSERT','UPDATE','DELETE') THEN 1 ELSE 0 END) AS BIGINT) AS n_dml "
    "FROM mapped GROUP BY ROLLUP (source_partition, op)",
)
def rollup_event_counts(spark, sf):
    """Multi-level totals in one scan (per (partition, op), per
    partition, grand total) — the lineage rollup the engine runs each
    epoch, exposed as a driver query."""
    return (
        events_as_changelog(spark, sf)
        .rollup("source_partition", "op")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.col("op").isin("INSERT", "UPDATE", "DELETE").cast("long")
            ).alias("n_dml"),
        )
    )


@q(
    "running_frame_totals",
    f"WITH {MAPPED.strip()} "
    "SELECT lsn, key, "
    "CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n, "
    "ROUND(SUM(value) OVER w, 3) AS running_value "
    "FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE') "
    "WINDOW w AS (PARTITION BY key ORDER BY lsn "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
)
def running_frame_totals(spark, sf):
    """Per-key running event count and value total in lsn order — the
    analytic-frame surface (W2): explicit ROWS frame, deterministic
    because lsn is unique within a key."""
    w = (
        Window.partitionBy("key")
        .orderBy("lsn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ch = events_as_changelog(spark, sf).filter(
        F.col("op").isin("INSERT", "UPDATE", "DELETE")
    )
    return ch.select(
        "lsn",
        "key",
        F.count("*").over(w).alias("running_n"),
        F.round(F.sum("value").over(w), 3).alias("running_value"),
    )


@q(
    "ann_ivf_topk",
    "SELECT CAST(10 AS BIGINT) AS n_queries, "
    "CAST(10 AS BIGINT) AS n_planted_hits, TRUE AS planted_all_rank1",
)
def ann_ivf_topk(spark, sf):
    """IVF-bucketed top-k, driver-checked by the structural property
    the index must preserve (the r5 ann_lsh_topk pattern): a vector
    IDENTICAL to the query (planted copy, id+1e6) gets the query's
    own nearest-centroid assignment — its nprobe=1 list is by
    construction inside the query's nprobe=3 probe set — so it must
    come back as the rank-1 neighbor for all 10 queries, whatever
    centroids the seeded k-means learned. Global-recall quality is
    separately oracle-checked by ann_ivf_recall (floor 0.65); the
    centroid-specific top-k SET itself is exercised row-level in
    tests/test_joins_similarity.py."""
    emb = load(spark, sf, "embeddings", spread=True)
    qs = emb.filter(F.col("vec_id") < 10)
    planted = qs.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    topk = SIM.ivf_bucketed_topk(
        emb.unionByName(planted), qs, k=5, n_lists=8, nprobe=3
    )
    hits = topk.filter(F.col("neighbor_id") == F.col("query_id") + 1_000_000)
    return hits.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_planted_hits"),
        (F.max("rank") == 1).alias("planted_all_rank1"),
    )


@q(
    "state_diff_intersect",
    "SELECT DISTINCT user_id AS key FROM events WHERE event_id <= 5000 "
    "INTERSECT SELECT DISTINCT user_id AS key FROM events WHERE event_id > 5000",
)
def state_diff_intersect(spark, sf):
    """Set intersection (U2): keys active in both halves of the log."""
    ev = load(spark, sf, "events")
    first = ev.filter(F.col("event_id") <= 5000).select(F.col("user_id").alias("key"))
    second = ev.filter(F.col("event_id") > 5000).select(F.col("user_id").alias("key"))
    return first.intersect(second)


SESSION_SQL = """
WITH e AS (SELECT user_id AS key, ts FROM events),
m AS (SELECT key, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY key ORDER BY ts)),
s AS (SELECT key, ts,
             SUM(new_s) OVER (PARTITION BY key ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
SELECT key, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY key, sid
"""


@q("session_window_counts", SESSION_SQL)
def session_window_counts(spark, sf):
    """Session windows (5-minute inactivity gap) per user — Spark's
    native session_window vs a gaps-and-islands SQL oracle."""
    return (
        load(spark, sf, "events")
        .groupBy(
            F.col("user_id").alias("key"),
            F.session_window("ts", "5 minutes").alias("win"),
        )
        .agg(F.count("*").alias("n_events"))
        .select("key", F.col("win.start").alias("session_start"), "n_events")
    )


@q(
    "windowed_event_counts",
    "SELECT date_trunc('hour', ts) AS win_start, event_type, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2",
)
def windowed_event_counts(spark, sf):
    """Tumbling event-time windows (batch form of
    streaming/windows.py::windowed_change_counts — same aggregation,
    watermark is a no-op on a batch frame)."""
    return (
        load(spark, sf, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


@q(
    "stateful_stream_gate",
    "SELECT * FROM (VALUES ('a', CAST(5 AS BIGINT), 'UPDATE'), "
    "('a', CAST(7 AS BIGINT), 'UPDATE'), ('b', CAST(2 AS BIGINT), 'INSERT')) "
    "t(doc_id, lsn, op)",
)
def stateful_stream_gate(spark, sf):
    """Mini end-to-end applyInPandasWithState run: two micro-batches
    with a stale event and a redelivered duplicate; returns the gated
    stream. The cross-batch STATE is not SQL, but the gate's output on
    this fixed two-batch fixture is fully determined (batch order is
    pinned by file mtime + maxFilesPerTrigger=1): the stale a@3 and
    the redelivered b@2 must be dropped — a VALUES oracle checks
    exactly that (full coverage in tests/test_stateful_streaming.py)."""
    import tempfile
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from canal_spark.streaming.stateful import OUTPUT_SCHEMA, stateful_lww_gate

    tmp = tempfile.mkdtemp(prefix="canal_gate_")
    cols = ["doc_id", "lsn", "source_partition", "op", "tokens", "n_tok", "source"]
    schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("lsn", pa.int64()),
            ("source_partition", pa.int32()),
            ("op", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
        ]
    )

    def write(name, rows):
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows, columns=cols), schema=schema),
            f"{tmp}/{name}",
        )

    write("b0.parquet", [("a", 5, 0, "UPDATE", [5], 1, "src0"), ("b", 2, 0, "INSERT", [2], 1, "src0")])
    time.sleep(1.1)
    write("b1.parquet", [("a", 3, 0, "UPDATE", [3], 1, "src0"), ("a", 7, 0, "UPDATE", [7], 1, "src0"), ("b", 2, 0, "INSERT", [2], 1, "src0")])
    stream = (
        spark.readStream.schema(OUTPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    q_ = (
        stateful_lww_gate(stream)
        .writeStream.format("memory")
        .queryName("gate_evidence")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q_.awaitTermination(120)
    return spark.sql(
        "SELECT doc_id, lsn, op FROM gate_evidence ORDER BY doc_id, lsn"
    )


@q(
    "schema_evolution_replay",
    "SELECT TRUE AS added, TRUE AS renamed, TRUE AS ntok_widened, "
    "TRUE AS readable, TRUE AS has_rows",
)
def schema_evolution_replay(spark, sf):
    """Mini end-to-end over the DDL-from-stream bridge: a single
    interleaved DML+DDL log (ADD_COLUMN + RENAME_COLUMN + WIDEN_TYPE
    planted at committed-tx boundaries) replayed via run_to_completion;
    each DDL applies in position as its own epoch. The DDL protocol is
    not SQL, but the final-schema invariants are boolean scalars the
    VALUES oracle checks (r4 pattern); golden coverage in
    tests/test_ddl_stream.py."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq_

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import (
        ChangelogSpec,
        generate_changelog,
        generate_ddl_events,
    )

    tmp = tempfile.mkdtemp(prefix="canal_ddl_")
    log = generate_changelog(
        f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
    )
    pdf = pq_.read_table(log).to_pandas()
    b0 = sorted(pdf[(pdf.source_partition == 0) & pdf.tx_commit].lsn)
    b1 = sorted(pdf[(pdf.source_partition == 1) & pdf.tx_commit].lsn)
    ddl_path = generate_ddl_events(
        f"{tmp}/ddl",
        [
            {"lsn": int(b0[len(b0) // 3]) + 1, "source_partition": 0,
             "kind": "ADD_COLUMN", "payload": {"name": "quality", "type": "double"}},
            {"lsn": int(b1[len(b1) // 2]) + 1, "source_partition": 1,
             "kind": "RENAME_COLUMN", "payload": {"from": "source", "to": "origin"}},
            {"lsn": int(b0[2 * len(b0) // 3]) + 1, "source_partition": 0,
             "kind": "WIDEN_TYPE", "payload": {"name": "n_tok", "to": "bigint"}},
        ],
    )
    table = SnapshotTable.create(f"{tmp}/table", n_buckets=4)
    eng = CdcEngine(spark, log, table, lsn_budget=1_000, ddl_events_path=ddl_path)
    eng.run_to_completion()
    snap = table.snapshot()
    fields = {f["name"]: f["type"] for f in snap["schemas"][str(snap["schema_ver"])]}
    final = table.read(spark)
    n_rows = final.count()
    readable = "origin" in final.columns and "quality" in final.columns
    shutil.rmtree(tmp, ignore_errors=True)  # invariants materialized above
    return spark.createDataFrame(
        [
            (
                "quality" in fields,
                "origin" in fields and "source" not in fields,
                fields.get("n_tok") == "bigint",
                readable,
                n_rows > 0,
            )
        ],
        "added boolean, renamed boolean, ntok_widened boolean, "
        "readable boolean, has_rows boolean",
    )


# ======================================================================
# multi-table routing (SURVEY.md §2 multi-table gap; r5)
# ======================================================================
@q(
    "multi_table_replay",
    f"""WITH mapped AS (
  SELECT event_id AS lsn, user_id AS key, {OP_SQL_CASE} AS op FROM events
), applied AS (
  SELECT *, 'src' || CAST(key % 10 AS VARCHAR) AS source
  FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE')
), routed AS (
  SELECT 'low' AS tbl, * FROM applied WHERE key % 10 <= 4
  UNION ALL
  SELECT 'high' AS tbl, * FROM applied WHERE key % 10 >= 5
), lww AS (
  SELECT tbl, key, op, lsn, source,
         ROW_NUMBER() OVER (PARTITION BY tbl, key ORDER BY lsn DESC) AS rn
  FROM routed
)
SELECT tbl, CAST(key AS VARCHAR) AS doc_id,
       CAST(lsn % 1000000 AS INT) AS last_tok,
       CAST(1 AS INT) AS n_tok, source
FROM lww WHERE rn = 1 AND op <> 'DELETE'""",
)
def multi_table_replay(spark, sf):
    """One interleaved changelog -> TWO routed SnapshotTables under a
    shared atomic group epoch (canal's instance: one cursor, per-table
    adapter dispatch [C: client-adapter/rdb/.../RdbSyncService.java ::
    per-Dml.table dispatch]). The END-TO-END engine run — epoch
    planning, shared watermarks, per-route regex filter, LWW, bucketed
    MERGE, group-marker commit — against a value-level SQL oracle that
    replays each route's subscription view independently."""
    import shutil
    import tempfile

    from canal_spark.multi import MultiTableEngine, TableRoute
    from canal_spark.plans.table import SnapshotTable

    ch = load(spark, sf, "events").select(
        F.expr(OP_SQL_CASE).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % 8).cast("int").alias("source_partition"),
        F.col("event_id").alias("tx_id"),
        F.lit(True).alias("tx_commit"),
        F.col("ts"),
        F.array((F.col("event_id") % 1000000).cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"),
        F.concat(F.lit("src"), (F.col("user_id") % 10).cast("string")).alias("source"),
        F.lit(1).cast("int").alias("schema_ver"),
    )
    tmp = tempfile.mkdtemp(prefix="canal_multi_")
    try:
        ch.write.mode("overwrite").parquet(f"{tmp}/log")
        routes = [
            TableRoute(
                "low",
                SnapshotTable.create(f"{tmp}/low", n_buckets=8),
                source_whitelist="src[0-4]",
            ),
            TableRoute(
                "high",
                SnapshotTable.create(f"{tmp}/high", n_buckets=8),
                source_whitelist="src[5-9]",
            ),
        ]
        eng = MultiTableEngine(
            spark, f"{tmp}/log", routes, f"{tmp}/grp", lsn_budget=4_000
        )
        eng.run_to_completion()
        out = None
        for route in routes:
            part = route.table.read(spark, with_bucket=False).select(
                F.lit(route.name).alias("tbl"),
                "doc_id",
                F.element_at("tokens", 1).alias("last_tok"),
                "n_tok",
                "source",
            )
            out = part if out is None else out.unionByName(part)
        rows = out.collect()  # materialize before the fixture is removed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "tbl string, doc_id string, last_tok int, n_tok int, source string"
    )


# ======================================================================
# incremental view maintenance + rollback + CDF before-images (r5)
# ======================================================================
@q(
    "incremental_mv_refresh",
    f"""WITH {MAPPED.strip()},
filtered AS (SELECT * FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE')),
lww AS (
  SELECT key, op, value,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY lsn DESC) AS rn
  FROM filtered
),
final AS (
  SELECT key, CAST(FLOOR(value) AS BIGINT) AS v
  FROM lww WHERE rn = 1 AND op <> 'DELETE'
)
SELECT 'g' || CAST(v % 8 AS VARCHAR) AS source,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(v) AS BIGINT) AS sum_value
FROM final GROUP BY 1""",
)
def incremental_mv_refresh(spark, sf):
    """Incrementally-maintained materialized aggregate (operators/mv.py)
    driven by the CDF's before-images: the events log replays through
    the REAL engine in several epochs, the MV refreshes after each one
    applying only +after/-before contributions (retracting across group
    migrations when an update moves a key's value into another value
    band), and the final MV rows are checked VALUE-LEVEL against
    DuckDB's from-scratch LWW + GROUP BY. Downstream-consumer parity:
    canal FlatMessage's `old` field exists for exactly this retraction
    [C: protocol/.../FlatMessage.java :: old]."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.operators.mv import MaterializedAggregate
    from canal_spark.plans.table import SnapshotTable

    ch = load(spark, sf, "events").select(
        F.expr(OP_SQL_CASE).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % 8).cast("int").alias("source_partition"),
        F.col("event_id").alias("tx_id"),
        F.lit(True).alias("tx_commit"),
        F.col("ts"),
        F.array(F.floor("value").cast("int")).alias("tokens"),
        F.floor("value").cast("int").alias("n_tok"),
        F.concat(F.lit("g"), (F.floor("value") % 8).cast("string")).alias("source"),
        F.lit(1).cast("int").alias("schema_ver"),
    )
    tmp = tempfile.mkdtemp(prefix="canal_mv_")
    try:
        ch.write.mode("overwrite").parquet(f"{tmp}/log")
        table = SnapshotTable.create(f"{tmp}/t", n_buckets=8)
        mv = MaterializedAggregate(
            table, f"{tmp}/mv", group_col="source", value_col="n_tok"
        )
        eng = CdcEngine(spark, f"{tmp}/log", table, lsn_budget=2_500)
        while eng.run_epoch() is not None:
            mv.refresh(spark)  # incremental: one CDF delta per epoch
        rows = mv.read(spark).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "source string, cnt bigint, sum_value bigint")


@q(
    "rollback_replay_parity",
    "SELECT TRUE AS restored_state_matches, TRUE AS resumed_equals_direct, "
    "TRUE AS history_still_readable",
)
def rollback_replay_parity(spark, sf):
    """rollback_to (Iceberg rollback_to_snapshot analog): rolling back
    restores BOTH the data state and the checkpoint watermarks of the
    target epoch; a resumed engine then re-applies the undone events
    and converges to the same final state as an uninterrupted replay;
    the undone epochs stay time-travel-readable (append-only history).
    Invariants computed in Spark over a deterministic mini-replay;
    VALUES oracle driver-checks them (the r4 boolean pattern)."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    cols = ["doc_id", "tokens", "n_tok", "source"]

    def _same(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    tmp = tempfile.mkdtemp(prefix="canal_rb_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        direct = SnapshotTable.create(f"{tmp}/direct", n_buckets=4)
        CdcEngine(spark, log, direct, lsn_budget=10**9).run_to_completion()

        t = SnapshotTable.create(f"{tmp}/t", n_buckets=4)
        eng = CdcEngine(spark, log, t, lsn_budget=300)
        eng.run_epoch(), eng.run_epoch()
        e_good = t.current_epoch()
        good = t.read(spark, with_bucket=False).select(*cols)
        eng.run_epoch(), eng.run_epoch()
        bad_epoch = t.current_epoch()
        t.rollback_to(e_good)
        restored = _same(t.read(spark, with_bucket=False).select(*cols), good)
        # fresh handle resumes from the RESTORED checkpoints
        t2 = SnapshotTable(f"{tmp}/t")
        CdcEngine(spark, log, t2, lsn_budget=10**9).run_to_completion()
        resumed = _same(
            t2.read(spark, with_bucket=False).select(*cols),
            direct.read(spark, with_bucket=False).select(*cols),
        )
        history = t2.read(spark, epoch=bad_epoch, with_bucket=False).count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(restored, resumed, history)],
        "restored_state_matches boolean, resumed_equals_direct boolean, "
        "history_still_readable boolean",
    )


@q(
    "tag_retention_parity",
    "SELECT TRUE AS pinned_survives_retention, TRUE AS pinned_rows_identical, "
    "TRUE AS dropped_tag_expires",
)
def tag_retention_parity(spark, sf):
    """Snapshot tags (Iceberg tag analog): a tagged epoch outlives
    `expire_snapshots(retain_last=1)` AND `remove_orphans()` with its
    rows byte-identical (the manifest is rewritten self-contained and
    the orphan sweep sees its file references); dropping the tag
    releases the pin, so the next expire removes the manifest. The
    named-dataset-release (\"v1-train\") retention contract, checked
    over a deterministic mini-replay; VALUES oracle."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    cols = ["doc_id", "tokens", "n_tok", "source"]

    def _same(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    tmp = tempfile.mkdtemp(prefix="canal_tag_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        t = SnapshotTable.create(f"{tmp}/t", n_buckets=4)
        eng = CdcEngine(spark, log, t, lsn_budget=300)
        eng.run_epoch(), eng.run_epoch()
        pinned = t.tag("v1-train")
        want = t.read(spark, epoch=pinned, with_bucket=False).select(*cols)
        want = want.localCheckpoint(eager=True)  # pre-GC image, re-read-proof
        eng.run_to_completion()
        expired = t.expire_snapshots(retain_last=1)
        t.remove_orphans()
        survives = pinned not in expired and t.snapshot(pinned)["epoch"] == pinned
        identical = _same(
            t.read(spark, epoch=pinned, with_bucket=False).select(*cols), want
        )
        t.drop_tag("v1-train")
        dropped = pinned in t.expire_snapshots(retain_last=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(survives, identical, dropped)],
        "pinned_survives_retention boolean, pinned_rows_identical boolean, "
        "dropped_tag_expires boolean",
    )


@q(
    "flatmessage_outbox_roundtrip",
    "SELECT TRUE AS consumer_reconstructs_table, TRUE AS update_old_minimal, "
    "TRUE AS republish_noop",
)
def flatmessage_outbox_roundtrip(spark, sf):
    """FlatMessage outbox (the MQ-producer half of canal's server,
    sinks.py::FlatMessageOutbox): every committed epoch's net change
    feed published as FlatMessage JSON with canal's before-image
    semantics (UPDATE old = changed columns only, DELETE data = the
    deleted image), exactly-once via the published-watermark pointer.
    Invariants: the consumer loop (parse_flat_messages -> per-key LWW)
    reconstructs the table exactly; every UPDATE old map is minimal
    (differs from data per column, never carries the pk); rewinding
    the pointer and re-publishing rewrites a byte-identical content
    set. VALUES oracle (the r4 boolean pattern)."""
    import glob
    import json as _json
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql.window import Window

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sinks import FlatMessageOutbox
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog
    from canal_spark.sources.flat_message import parse_flat_messages

    def _same(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    tmp = tempfile.mkdtemp(prefix="canal_mq_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        t = SnapshotTable.create(f"{tmp}/t", n_buckets=4)
        eng = CdcEngine(spark, log, t, lsn_budget=500)
        outbox = FlatMessageOutbox(t, f"{tmp}/mq")
        while eng.run_epoch() is not None:
            outbox.publish(spark)

        files = sorted(glob.glob(f"{tmp}/mq/epoch=*/part-*"))
        nonempty = [f for f in files if _os.path.getsize(f) > 0]
        parsed = parse_flat_messages(
            spark.read.text(nonempty).withColumnRenamed("value", "msg")
        )
        got = (
            parsed.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy(F.col("row")["doc_id"]).orderBy(
                        F.col("es").desc()
                    )
                ),
            )
            .filter("rn = 1 AND op <> 'DELETE'")
            .select(
                F.col("row")["doc_id"].alias("doc_id"),
                F.from_json(F.col("row")["tokens"], "array<int>").alias("tokens"),
                F.col("row")["n_tok"].cast("int").alias("n_tok"),
                F.col("row")["source"].alias("source"),
            )
        )
        cols = ["doc_id", "tokens", "n_tok", "source"]
        reconstructs = _same(got, t.read(spark, with_bucket=False).select(*cols))

        # a violation: old carries the pk, or an "old" value equal to
        # the after value (i.e. a column that did not actually change)
        upd = parsed.filter("op = 'UPDATE'").select("row", "old_row")
        minimal = (
            upd.count() > 0
            and upd.filter(
                F.map_contains_key("old_row", "doc_id")
                | F.exists(
                    F.map_entries("old_row"),
                    lambda e: e["value"].eqNullSafe(
                        F.element_at(F.col("row"), e["key"])
                    ),
                )
            ).count()
            == 0
        )

        final = outbox.published_epoch()
        before = set()
        for f in glob.glob(f"{tmp}/mq/epoch={final}/part-*"):
            before.update(open(f).read().splitlines())
        with open(outbox._pointer_path, "w") as f:
            _json.dump({"epoch": final - 1}, f)
        republished = outbox.publish(spark) == [final]
        after = set()
        for f in glob.glob(f"{tmp}/mq/epoch={final}/part-*"):
            after.update(open(f).read().splitlines())
        noop = republished and after == before
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(reconstructs, minimal, noop)],
        "consumer_reconstructs_table boolean, update_old_minimal boolean, "
        "republish_noop boolean",
    )


@q(
    "cdf_capture_parity",
    "SELECT TRUE AS cow_captured_equals_diff, TRUE AS mor_captured_equals_diff, "
    "TRUE AS maintenance_range_served",
)
def cdf_capture_parity(spark, sf):
    """Write-time CDF capture (Delta change-data-files analog,
    CdcEngine(capture_changes=True) + read_changes(source=...)): the
    captured fast path — one O(sum-of-deltas) aggregate over the
    per-epoch capture files, zero table scans — must agree row-for-row
    (op, after-image, before-image, _seq) with the snapshot-diff path
    on the same replay, in both write modes, including ranges spanning
    a compaction epoch (marked provably-empty). VALUES oracle."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    def _same(x, y):
        return (
            x.columns == y.columns
            and x.exceptAll(y).count() == 0
            and y.exceptAll(x).count() == 0
        )

    tmp = tempfile.mkdtemp(prefix="canal_cdfc_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        results = {}
        for mode in ("cow", "mor"):
            t = SnapshotTable.create(f"{tmp}/{mode}", n_buckets=4)
            CdcEngine(
                spark, log, t, lsn_budget=400, write_mode=mode, capture_changes=True
            ).run_to_completion()
            final = t.current_epoch()
            results[mode] = all(
                _same(
                    t.read_changes(spark, a, b, with_before=True, source="captured"),
                    t.read_changes(spark, a, b, with_before=True, source="diff"),
                )
                for a, b in ((0, final), (1, final - 1))
            )
            if mode == "mor":
                t.compact_files(spark, target_bytes=1 << 30)
                maint = _same(
                    t.read_changes(
                        spark, 0, final + 1, with_before=True, source="captured"
                    ),
                    t.read_changes(spark, 0, final + 1, with_before=True, source="diff"),
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(results["cow"], results["mor"], maint)],
        "cow_captured_equals_diff boolean, mor_captured_equals_diff boolean, "
        "maintenance_range_served boolean",
    )


@q(
    "time_travel_timestamp",
    "SELECT TRUE AS boundaries_resolve, TRUE AS as_of_read_matches, "
    "TRUE AS pre_history_raises",
)
def time_travel_timestamp(spark, sf):
    """Timestamp time travel (Iceberg TIMESTAMP AS OF analog): every
    published snapshot is wall-clock stamped (committed_at_us);
    epoch_at(ts) resolves each recorded commit stamp back to exactly
    its epoch, a read AS OF a mid-history stamp equals the epoch read,
    and a ts before the table existed raises. VALUES oracle."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    def _same(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    tmp = tempfile.mkdtemp(prefix="canal_tt_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        t = SnapshotTable.create(f"{tmp}/t", n_buckets=4)
        eng = CdcEngine(spark, log, t, lsn_budget=400)
        eng.run_to_completion()
        final = t.current_epoch()
        stamps = {e: t.snapshot(e)["committed_at_us"] for e in range(final + 1)}
        boundaries = all(t.epoch_at(at) == e for e, at in stamps.items())
        mid = final // 2
        cols = ["doc_id", "tokens", "n_tok", "source"]
        as_of = _same(
            t.read(spark, epoch=t.epoch_at(stamps[mid]), with_bucket=False).select(
                *cols
            ),
            t.read(spark, epoch=mid, with_bucket=False).select(*cols),
        )
        try:
            t.epoch_at(stamps[0] - 1)
            raises = False
        except ValueError:
            raises = True
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(boundaries, as_of, raises)],
        "boundaries_resolve boolean, as_of_read_matches boolean, "
        "pre_history_raises boolean",
    )


@q(
    "table_replication_parity",
    "SELECT TRUE AS replica_matches_primary, TRUE AS deletes_propagated, "
    "TRUE AS resync_noop",
)
def table_replication_parity(spark, sf):
    """Change-feed table replication (operators/replicate.py — canal's
    downstream-sync use case at the table layer): a replica on a
    DIFFERENT bucket layout, synced incrementally from a capture-
    enabled primary's read_changes feed, converges to the primary's
    exact visible state (including deletes), and a re-sync at the same
    primary epoch is a no-op. VALUES oracle (the r4 boolean pattern)."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.operators.replicate import TableReplicator
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    cols = ["doc_id", "tokens", "n_tok", "source"]

    def _same(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    tmp = tempfile.mkdtemp(prefix="canal_rep_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        primary = SnapshotTable.create(f"{tmp}/p", n_buckets=8)
        eng = CdcEngine(
            spark, log, primary, lsn_budget=500, capture_changes=True
        )
        rep = TableReplicator.create_replica(primary, f"{tmp}/r", n_buckets=4)
        eng.run_epoch(), eng.run_epoch()
        rep.sync(spark)
        eng.run_to_completion()
        rep.sync(spark)
        p = primary.read(spark, with_bucket=False).select(*cols)
        r = rep.replica.read(spark, with_bucket=False).select(*cols)
        matches = _same(p, r)
        # deletes: the primary's tombstoned keys are absent on both sides
        p_keys = {x[0] for x in p.select("doc_id").collect()}
        r_keys = {x[0] for x in r.select("doc_id").collect()}
        deletes = p_keys == r_keys and primary.read(
            spark, with_bucket=False, internal=True
        ).filter("_tombstone").count() > 0
        noop = rep.sync(spark) is None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(matches, deletes, noop)],
        "replica_matches_primary boolean, deletes_propagated boolean, "
        "resync_noop boolean",
    )


@q(
    "branch_wap_parity",
    "SELECT TRUE AS staged_invisible, TRUE AS publish_is_pointer_move, "
    "TRUE AS ref_survives_expire, TRUE AS abort_resumes_to_parity",
)
def branch_wap_parity(spark, sf):
    """Branch refs + write-audit-publish (Iceberg branch /
    fast_forward analog; plans/table.py set_ref/fast_forward): readers
    pinned to `main` never see staged audit epochs; publishing is one
    atomic pointer move; the ref pins its manifest against
    expire_snapshots; and an audit FAILURE path (rollback to the
    published epoch, which rewinds checkpoints) re-replays the aborted
    events to the exact no-WAP final state. VALUES oracle."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable
    from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

    def _state(df):
        return sorted(
            (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
            for r in df.select("doc_id", "tokens", "n_tok", "source").collect()
        )

    tmp = tempfile.mkdtemp(prefix="canal_wap_")
    try:
        log = generate_changelog(
            f"{tmp}/log", ChangelogSpec(n_events=2_000, n_partitions=2, n_keys=100)
        )
        # control: the same log replayed straight through, no WAP
        ctl = SnapshotTable.create(f"{tmp}/ctl", n_buckets=4)
        CdcEngine(spark, log, ctl, lsn_budget=400).run_to_completion()
        expected = _state(ctl.read(spark, with_bucket=False))

        t = SnapshotTable.create(f"{tmp}/t", n_buckets=4)
        eng = CdcEngine(spark, log, t, lsn_budget=400)
        eng.run_epoch()
        published = t.set_ref("main")
        pub_state = _state(t.read(spark, ref="main", with_bucket=False))
        eng.run_epoch()
        eng.run_epoch()
        head = t.current_epoch()
        staged_invisible = (
            _state(t.read(spark, ref="main", with_bucket=False)) == pub_state
            and _state(t.read(spark, with_bucket=False)) != pub_state
        )
        # audit passes → publish; the ref'd read becomes the head read
        t.fast_forward("main")
        publish_move = t.ref_epoch("main") == head and _state(
            t.read(spark, ref="main", with_bucket=False)
        ) == _state(t.read(spark, epoch=head, with_bucket=False))
        # pin: point main back at the published epoch, stage the rest,
        # expire aggressively — the ref'd manifest must survive
        t.set_ref("main", published)
        eng.run_epoch()
        t.expire_snapshots(retain_last=1)
        survives = (
            _state(t.read(spark, ref="main", with_bucket=False)) == pub_state
        )
        # audit fails → abort: rollback to main (checkpoints rewind),
        # a fresh engine replays the aborted events to full parity
        t.rollback_to(published)
        eng2 = CdcEngine(spark, log, SnapshotTable(f"{tmp}/t"), lsn_budget=400)
        eng2.run_to_completion()
        eng2.table.fast_forward("main")
        abort_parity = (
            _state(eng2.table.read(spark, ref="main", with_bucket=False))
            == expected
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(staged_invisible, publish_move, survives, abort_parity)],
        "staged_invisible boolean, publish_is_pointer_move boolean, "
        "ref_survives_expire boolean, abort_resumes_to_parity boolean",
    )


SEG_DEDUP_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (
  SELECT doc_id, i AS pos,
         array_to_string(words[(i*8+1):(i*8+8)], ' ') AS seg
  FROM w, UNNEST(range(0, GREATEST(CAST(ceil(len(words)/8.0) AS INT), 1))) AS t(i)),
df AS (SELECT seg, COUNT(DISTINCT doc_id) AS ndocs FROM s GROUP BY seg)
SELECT s.doc_id,
       COALESCE(string_agg(CASE WHEN df.ndocs = 1 THEN s.seg END, ' '
                           ORDER BY s.pos), '') AS clean_text,
       CAST(COUNT(*) FILTER (df.ndocs = 1) AS INT) AS segs_kept,
       CAST(COUNT(*) FILTER (df.ndocs > 1) AS INT) AS segs_dropped
FROM s JOIN df USING (seg)
GROUP BY s.doc_id
"""


@q("dedup_segments", SEG_DEDUP_SQL)
def dedup_segments_q(spark, sf):
    """Corpus-level segment dedup (P22, CCNet paragraph-dedup analog):
    every occurrence of any 8-word segment shared by ≥2 documents is
    dropped; survivors re-join in original order. Exact duplicate
    documents lose ALL their segments (every segment shared), so this
    also subsumes boilerplate removal. FULL row-level SQL oracle."""
    return TX.dedup_segments(load(spark, sf, "documents"), seg_words=8)


# ======================================================================
# predicate DELETE — takedown / right-to-be-forgotten (r5 s6)
# ======================================================================
TAKEDOWN_SQL = f"""WITH mapped AS (
  SELECT event_id AS lsn, user_id AS key, {OP_SQL_CASE} AS op FROM events
), applied AS (
  SELECT *, 'src' || CAST(key % 10 AS VARCHAR) AS source
  FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE')
), lww AS (
  SELECT key, op, lsn, source,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY lsn DESC) AS rn
  FROM applied
)
SELECT CAST(key AS VARCHAR) AS doc_id,
       CAST(lsn % 1000000 AS INT) AS last_tok,
       CAST(1 AS INT) AS n_tok, source
FROM lww WHERE rn = 1 AND op <> 'DELETE' AND source <> 'src3'"""


@q("delete_where_takedown", TAKEDOWN_SQL)
def delete_where_takedown(spark, sf):
    """Predicate DELETE as a first-class table operation (Iceberg
    `DELETE FROM ... WHERE` CoW analog; the takedown / right-to-be-
    forgotten path of a training-data lake): replay the mapped events
    changelog through the REAL engine into a SnapshotTable, then
    `delete_where("source = 'src3'")` — a two-phase, O(affected
    buckets) CoW rewrite committed as one optimistic epoch. The oracle
    replays the same LWW final state and filters the predicate out:
    the engine's post-takedown table must match it row-for-row."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    ch = load(spark, sf, "events").select(
        F.expr(OP_SQL_CASE).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % 8).cast("int").alias("source_partition"),
        F.col("event_id").alias("tx_id"),
        F.lit(True).alias("tx_commit"),
        F.col("ts"),
        F.array((F.col("event_id") % 1000000).cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"),
        F.concat(F.lit("src"), (F.col("user_id") % 10).cast("string")).alias("source"),
        F.lit(1).cast("int").alias("schema_ver"),
    )
    tmp = tempfile.mkdtemp(prefix="canal_takedown_")
    try:
        ch.write.mode("overwrite").parquet(f"{tmp}/log")
        table = SnapshotTable.create(f"{tmp}/table", n_buckets=8)
        CdcEngine(spark, f"{tmp}/log", table, lsn_budget=10**9).run_to_completion()
        table.delete_where(spark, "source = 'src3'")
        out = table.read(spark, with_bucket=False).select(
            "doc_id",
            F.element_at("tokens", 1).alias("last_tok"),
            "n_tok",
            "source",
        )
        rows = out.collect()  # materialize before the fixture is removed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id string, last_tok int, n_tok int, source string"
    )


# ======================================================================
# column-level partial updates — canal Column#updated parity (r5 s6)
# ======================================================================
PARTIAL_SQL = f"""WITH mapped AS (
  SELECT event_id AS lsn, user_id AS key, value, props,
         {OP_SQL_CASE} AS op FROM events
), ev AS (
  SELECT key, lsn, op, value, props,
    (op = 'INSERT' OR (op = 'UPDATE' AND lsn % 3 IN (0, 2))) AS wv,
    (op = 'INSERT' OR (op = 'UPDATE' AND lsn % 3 IN (1, 2))) AS wp
  FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE')
), agg AS (
  SELECT key,
    COALESCE(MAX(CASE WHEN op = 'DELETE' THEN lsn END), -1) AS del_ord,
    MAX(CASE WHEN wv THEN lsn END) AS owv,
    MAX(CASE WHEN wp THEN lsn END) AS owp
  FROM ev GROUP BY key
), win AS (
  SELECT key,
    CASE WHEN owv > del_ord THEN owv END AS owv,
    CASE WHEN owp > del_ord THEN owp END AS owp
  FROM agg
)
SELECT w.key, v.value AS last_value, p.props AS last_props
FROM win w
LEFT JOIN ev v ON v.key = w.key AND v.lsn = w.owv
LEFT JOIN ev p ON p.key = w.key AND p.lsn = w.owp
WHERE w.owv IS NOT NULL OR w.owp IS NOT NULL"""


@q("partial_update_collapse", PARTIAL_SQL)
def partial_update_collapse(spark, sf):
    """Column-level LWW over sparse UPDATE events (canal Column#updated
    parity: an UPDATE carries only its changed columns, so row-level
    LWW would null out older still-current writes). UPDATE lsn%3=0
    writes `value`, 1 writes `props`, 2 writes both; INSERT writes all;
    DELETE kills the row and only later writes survive. The oracle
    replays the same per-column winner rule in ANSI SQL."""
    from canal_spark.operators.filters import op_filter
    from canal_spark.operators.lww import lww_collapse_partial

    ch = op_filter(events_as_changelog(spark, sf)).withColumn(
        "updated_cols",
        F.when(F.col("op") != "UPDATE", F.array(F.lit("value"), F.lit("props")))
        .when(F.col("lsn") % 3 == 0, F.array(F.lit("value")))
        .when(F.col("lsn") % 3 == 1, F.array(F.lit("props")))
        .otherwise(F.array(F.lit("value"), F.lit("props"))),
    )
    return lww_collapse_partial(
        ch, key="key", order_cols=("lsn",), payload_cols=("value", "props")
    ).select(
        "key",
        F.col("value").alias("last_value"),
        F.col("props").alias("last_props"),
    )


PARTIAL_REPLAY_SQL = f"""WITH mapped AS (
  SELECT event_id AS lsn, user_id AS key, {OP_SQL_CASE} AS op FROM events
), ev AS (
  SELECT key, lsn, op,
    (op = 'INSERT' OR (op = 'UPDATE' AND lsn % 3 IN (0, 2))) AS wt,
    (op = 'INSERT' OR (op = 'UPDATE' AND lsn % 3 IN (1, 2))) AS ws
  FROM mapped WHERE op IN ('INSERT','UPDATE','DELETE')
), agg AS (
  SELECT key,
    COALESCE(MAX(CASE WHEN op = 'DELETE' THEN lsn END), -1) AS del_ord,
    MAX(CASE WHEN wt THEN lsn END) AS owt,
    MAX(CASE WHEN ws THEN lsn END) AS ows
  FROM ev GROUP BY key
), win AS (
  SELECT key,
    CASE WHEN owt > del_ord THEN owt END AS owt,
    CASE WHEN ows > del_ord THEN ows END AS ows
  FROM agg
)
SELECT CAST(w.key AS VARCHAR) AS doc_id,
       CAST(w.owt % 1000000 AS INT) AS last_tok,
       CAST(CASE WHEN w.owt IS NOT NULL THEN 1 END AS INT) AS n_tok,
       CASE WHEN w.ows IS NOT NULL
            THEN 'src' || CAST(w.key % 10 AS VARCHAR) END AS source
FROM win w WHERE w.owt IS NOT NULL OR w.ows IS NOT NULL"""


@q("partial_update_replay", PARTIAL_REPLAY_SQL)
def partial_update_replay(spark, sf):
    """ENGINE-level sparse-row-image replay (canal Column#updated
    parity, the apply half of `partial_update_collapse`): map the
    events table to a changelog whose UPDATEs carry only the columns
    picked by lsn%3 (0 -> tokens+n_tok, 1 -> source, 2 -> all;
    unwritten columns NULL), replay it through the REAL
    CdcEngine(partial_updates=True) in multiple epochs, and read the
    final table. Column c of each stored row must equal the latest
    event that wrote c after the key's latest DELETE — carried ACROSS
    epoch boundaries by the per-column CoW coalesce, which the oracle
    replays in ANSI SQL."""
    import shutil
    import tempfile

    from canal_spark.engine import CdcEngine
    from canal_spark.plans.table import SnapshotTable

    wt = (F.col("op") == "INSERT") | (
        (F.col("op") == "UPDATE") & (F.col("lsn") % 3).isin(0, 2)
    )
    ws = (F.col("op") == "INSERT") | (
        (F.col("op") == "UPDATE") & (F.col("lsn") % 3).isin(1, 2)
    )
    ch = (
        load(spark, sf, "events")
        .select(
            F.expr(OP_SQL_CASE).alias("op"),
            F.col("user_id").cast("string").alias("doc_id"),
            F.col("event_id").alias("lsn"),
            (F.col("user_id") % 8).cast("int").alias("source_partition"),
            F.col("event_id").alias("tx_id"),
            F.lit(True).alias("tx_commit"),
            F.col("ts"),
        )
        .withColumn(
            "tokens",
            F.when(wt, F.array((F.col("lsn") % 1000000).cast("int"))),
        )
        .withColumn("n_tok", F.when(wt, F.lit(1)).cast("int"))
        .withColumn(
            "source",
            F.when(
                ws | (F.col("op") == "DELETE"),
                F.concat(F.lit("src"), (F.col("doc_id").cast("long") % 10).cast("string")),
            ),
        )
        .withColumn("schema_ver", F.lit(1).cast("int"))
        .withColumn(
            "updated_cols",
            F.when(F.col("op") == "INSERT", F.array(F.lit("tokens"), F.lit("n_tok"), F.lit("source")))
            .when(
                F.col("op") == "UPDATE",
                F.when(F.col("lsn") % 3 == 0, F.array(F.lit("tokens"), F.lit("n_tok")))
                .when(F.col("lsn") % 3 == 1, F.array(F.lit("source")))
                .otherwise(F.array(F.lit("tokens"), F.lit("n_tok"), F.lit("source"))),
            )
            .otherwise(F.array().cast("array<string>")),
        )
        .filter(F.col("op").isin("INSERT", "UPDATE", "DELETE"))
    )
    tmp = tempfile.mkdtemp(prefix="canal_partial_")
    try:
        ch.write.mode("overwrite").parquet(f"{tmp}/log")
        max_lsn = ch.agg(F.max("lsn")).collect()[0][0]
        table = SnapshotTable.create(f"{tmp}/table", n_buckets=8)
        CdcEngine(
            spark,
            f"{tmp}/log",
            table,
            lsn_budget=max(1, int(max_lsn) // 3 + 1),
            partial_updates=True,
        ).run_to_completion()
        out = table.read(spark, with_bucket=False).select(
            "doc_id",
            F.element_at("tokens", 1).alias("last_tok"),
            "n_tok",
            "source",
        )
        rows = out.collect()  # materialize before the fixture is removed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id string, last_tok int, n_tok int, source string"
    )
