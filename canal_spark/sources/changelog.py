"""Synthetic deterministic change-event log: the engine's source table.

Reference semantics being modeled (alibaba/canal, see SURVEY.md §1):
the MySQL binlog is a per-source totally-ordered stream of row-change
events with in-band transaction boundaries
[C: protocol/.../EntryProtocol.proto :: Entry/RowChange;
 parse/.../EventTransactionBuffer.java :: tx grouping].
Here the "binlog" is a partitioned Parquet change-log table:

    op:string            INSERT | UPDATE | DELETE | HEARTBEAT
    doc_id:string        key; zipf-hot (deliberate skew, FIXTURES.md A1)
    lsn:long             strictly increasing per source_partition
    source_partition:int ordering domain (binlog stream analog)
    tx_id:long           transaction id; events of one tx are contiguous
    tx_commit:boolean    true on the LAST event of a committed tx
                         (TRANSACTIONEND analog — in-band boundary)
    ts:timestamp         source commit time (executeTime analog)
    tokens:array<int32>  row image payload (input_hint shape)
    n_tok:int            = size(tokens); NULL on DELETE/HEARTBEAT
    source:string        src0..src9 (regex-filter target)
    schema_ver:int       schema version in force at this lsn

Generation is a pure function of (seed, n_events, n_partitions, n_keys):
no wall-clock, no unseeded randomness — the pandas oracle and the engine
see byte-identical input on every run (SURVEY.md §5.2).

Files are written one-per-source-partition (or chunked), rows sorted by
lsn, with small parquet row groups so LSN-range epoch slices prune at the
row-group level via pushed filters — the Spark-side analog of canal's
"seek to binlog position" [C: parse/.../AbstractEventParser.java ::
#findStartPosition].
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
TOKEN_VOCAB = 50_000
SCHEMA = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("lsn", pa.int64()),
        pa.field("source_partition", pa.int32()),
        pa.field("tx_id", pa.int64()),
        pa.field("tx_commit", pa.bool_()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("schema_ver", pa.int32()),
    ]
)


@dataclass(frozen=True)
class ChangelogSpec:
    n_events: int = 10_000
    n_partitions: int = 4
    n_keys: int = 500
    seed: int = 42
    zipf_a: float = 1.2
    delete_rate: float = 0.07
    max_tx: int = 8
    heartbeat_every_tx: int = 25
    truncate_trailing_tx: bool = True
    max_tok: int = 16
    #: sparse row images (canal Column#updated analog): UPDATE events
    #: carry only a subset of the payload columns, named in an extra
    #: `updated_cols:array<string>` column (deterministic by lsn%3:
    #: 0 -> tokens+n_tok, 1 -> source, 2 -> all); unwritten columns are
    #: NULL in the event. INSERTs always carry the full row image.
    partial_updates: bool = False


def _partition_table(p: int, n: int, spec: ChangelogSpec) -> pa.Table:
    """Build one source partition's event stream, fully vectorized."""
    rng = np.random.default_rng(spec.seed * 1_000_003 + p)

    # --- transactions over data events -------------------------------
    sizes = rng.integers(1, spec.max_tx + 1, size=max(1, n // 2 + spec.max_tx))
    csum = np.cumsum(sizes)
    n_tx = int(np.searchsorted(csum, n) + 1)
    sizes = sizes[:n_tx].copy()
    sizes[-1] -= int(csum[n_tx - 1] - n) if csum[n_tx - 1] > n else 0
    sizes = sizes[sizes > 0]
    n_tx = len(sizes)
    tx_idx = np.repeat(np.arange(n_tx, dtype=np.int64), sizes)
    ends = np.cumsum(sizes) - 1
    is_commit = np.zeros(n, dtype=bool)
    is_commit[ends] = True

    # --- data event fields --------------------------------------------
    key_idx = (rng.zipf(spec.zipf_a, size=n) - 1) % spec.n_keys
    is_del = rng.random(n) < spec.delete_rate
    is_ins = rng.random(n) < 0.4
    op = np.where(is_del, "DELETE", np.where(is_ins, "INSERT", "UPDATE"))

    # --- interleave heartbeats between transactions -------------------
    # a heartbeat is its own committed single-event tx (canal injects
    # periodic heartbeat entries for liveness [C: sink/.../HeartBeatEntry
    # EventHandler]); they advance the watermark but carry no row image.
    n_hb = n_tx // spec.heartbeat_every_tx
    # order key: data event i sits at position i; heartbeat after tx t
    # sits at (end-of-tx position + 0.5)
    hb_after_tx = (np.arange(n_hb) + 1) * spec.heartbeat_every_tx - 1
    hb_pos = ends[hb_after_tx] + 0.5
    order = np.argsort(np.concatenate([np.arange(n, dtype=np.float64), hb_pos]), kind="stable")

    total = n + n_hb
    op_all = np.concatenate([op, np.full(n_hb, "HEARTBEAT")])[order]
    key_all = np.concatenate([key_idx, np.zeros(n_hb, dtype=key_idx.dtype)])[order]
    hb_mask = np.concatenate([np.zeros(n, dtype=bool), np.ones(n_hb, dtype=bool)])[order]
    tx_all = np.concatenate([tx_idx, n_tx + np.arange(n_hb, dtype=np.int64)])[order]
    commit_all = np.concatenate([is_commit, np.ones(n_hb, dtype=bool)])[order]
    del_mask = np.concatenate([is_del, np.zeros(n_hb, dtype=bool)])[order]

    # --- positions -----------------------------------------------------
    lsn = np.cumsum(rng.integers(1, 4, size=total)).astype(np.int64)
    ts_us = BASE_TS_US + np.cumsum(rng.integers(1_000, 250_000, size=total)).astype(np.int64)

    # truncate trailing tx: clear the final commit marker so the last
    # (non-heartbeat) tx is incomplete — barrier tests (FIXTURES.md A1)
    if spec.truncate_trailing_tx and n > 0:
        last_data = np.where(~hb_mask)[0][-1]
        commit_all[tx_all == tx_all[last_data]] = False
        # nothing may follow a mid-tx stream cut: a trailing heartbeat
        # (own committed single-event tx, placed after the 25th tx)
        # would advance the watermark PAST the incomplete tx and leak
        # its events through the barrier — impossible in a real binlog,
        # where the cut ends the stream
        commit_all[last_data + 1 :] = False

    # --- payload: deterministic token arrays ---------------------------
    payload_mask = ~(hb_mask | del_mask)
    # sparse row images: UPDATE writes only the columns picked by lsn%3
    # (0 -> tokens+n_tok, 1 -> source, 2 -> all); unwritten columns are
    # NULL in the event and named out of `updated_cols`
    upd_mask = (op_all == "UPDATE") & payload_mask
    upd_case = lsn % 3
    if spec.partial_updates:
        tok_written = payload_mask & ~(upd_mask & (upd_case == 1))
        src_written = payload_mask & ~(upd_mask & (upd_case == 0))
        payload_mask = tok_written
    tok_len = np.where(payload_mask, 1 + ((key_all * 31 + lsn) % spec.max_tok), 0).astype(np.int64)
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(tok_len, out=offsets[1:])
    base = (key_all * 1009 + lsn * 31) % TOKEN_VOCAB
    flat = (np.repeat(base, tok_len) + _intra_index(tok_len)) % TOKEN_VOCAB
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(flat.astype(np.int32)),
    )
    # null-out tokens/n_tok where no payload
    valid = pa.array(payload_mask)
    tokens = pa.compute.if_else(valid, tokens, pa.nulls(total, pa.list_(pa.int32())))
    n_tok = pa.compute.if_else(valid, pa.array(tok_len.astype(np.int32)), pa.nulls(total, pa.int32()))

    doc_id = pa.compute.binary_join_element_wise(
        pa.array(np.full(total, "d")),
        pa.compute.utf8_lpad(pa.array(key_all.astype(str)), 7, "0"),
        "",
    )
    source = pa.compute.binary_join_element_wise(
        pa.array(np.full(total, "src")), pa.array((key_all % 10).astype(str)), ""
    )

    extra: dict = {}
    schema = SCHEMA
    if spec.partial_updates:
        # an UPDATE that does not write `source` carries NULL there;
        # DELETE/heartbeat rows KEEP source (the route filters key on it)
        keep_src = src_written | del_mask | hb_mask
        source = pa.compute.if_else(
            pa.array(keep_src), source, pa.nulls(total, pa.string())
        )
        # updated_cols: the canal Column#updated analog. 4 fixed shapes
        # chosen per row: INSERT / UPDATE-case-2 -> all, UPDATE-case-0
        # -> tokens+n_tok, UPDATE-case-1 -> source, DELETE/heartbeat ->
        # empty
        code = np.where(
            op_all == "INSERT",
            3,
            np.where(
                upd_mask,
                np.where(upd_case == 0, 1, np.where(upd_case == 1, 2, 3)),
                0,
            ),
        )
        shapes = [[], ["tokens", "n_tok"], ["source"], ["tokens", "n_tok", "source"]]
        lens = np.array([0, 2, 1, 3], dtype=np.int64)[code]
        offsets = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = [c for k in code for c in shapes[k]]
        extra["updated_cols"] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(flat, type=pa.string()),
        )
        schema = SCHEMA.append(pa.field("updated_cols", pa.list_(pa.string())))

    return pa.table(
        {
            "op": pa.array(op_all),
            "doc_id": doc_id,
            "lsn": pa.array(lsn),
            "source_partition": pa.array(np.full(total, p, dtype=np.int32)),
            "tx_id": pa.array(p * 1_000_000_000 + tx_all),
            "tx_commit": pa.array(commit_all),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
            "schema_ver": pa.array(np.full(total, 1, dtype=np.int32)),
            **extra,
        },
        schema=schema,
    )


def _intra_index(lengths: np.ndarray) -> np.ndarray:
    """[3,0,2] -> [0,1,2,0,1] — vectorized per-list position index."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
    return np.arange(total, dtype=np.int64) - starts


def generate_changelog(out_dir: str, spec: ChangelogSpec = ChangelogSpec()) -> str:
    """Write the changelog as one sorted parquet file per source partition."""
    os.makedirs(out_dir, exist_ok=True)
    per = [spec.n_events // spec.n_partitions] * spec.n_partitions
    per[0] += spec.n_events - sum(per)
    for p in range(spec.n_partitions):
        t = _partition_table(p, per[p], spec)
        pq.write_table(
            t,
            os.path.join(out_dir, f"part-p{p:04d}.parquet"),
            row_group_size=65_536,
            compression="snappy",
        )
    return out_dir


#: FIXTURES.md A3 — the DDL side-stream schema
DDL_EVENTS_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("source_partition", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("payload", pa.string()),
        pa.field("schema_ver", pa.int32()),
    ]
)


def generate_ddl_events(out_dir: str, ddls: list[dict]) -> str:
    """Write a ddl_events table (FIXTURES.md A3). Each dict:
    {lsn, source_partition, kind, payload(dict|str)[, schema_ver]}.
    The canal analog is the QUERY-event DDL sub-stream the parser
    extracts from the binlog [C: parse/.../ddl/DruidDdlParser.java]."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    ordered = sorted(ddls, key=lambda d: (int(d["lsn"]), int(d["source_partition"])))
    t = pa.Table.from_pydict(
        {
            "lsn": [int(d["lsn"]) for d in ordered],
            "source_partition": [int(d["source_partition"]) for d in ordered],
            "kind": [d["kind"] for d in ordered],
            "payload": [
                d["payload"] if isinstance(d["payload"], str) else json.dumps(d["payload"])
                for d in ordered
            ],
            "schema_ver": [int(d.get("schema_ver", i + 2)) for i, d in enumerate(ordered)],
        },
        schema=DDL_EVENTS_SCHEMA,
    )
    pq.write_table(t, os.path.join(out_dir, "ddl-events.parquet"))
    return out_dir


def read_changelog(spark, path: str):
    """Changelog scan — plain parquet read; epoch slicing pushes lsn/
    source_partition predicates to row-group pruning."""
    return spark.read.parquet(path)


#: Spark DDL string of the changelog schema (streaming sources need an
#: explicit schema — no inference on readStream)
CHANGELOG_DDL = (
    "op string, doc_id string, lsn long, source_partition int, tx_id long, "
    "tx_commit boolean, ts timestamp, tokens array<int>, n_tok int, "
    "source string, schema_ver int"
)
