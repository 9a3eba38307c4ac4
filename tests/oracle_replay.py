"""Independent sequential replay oracle (SURVEY.md §5.2 item 1).

The reference tree is empty (SURVEY.md §0.1), so the "reference final
state" is DEFINED by this trivially-inspectable sequential replayer:
apply committed change events one at a time in global deterministic
order (lsn, source_partition) ascending over a dict — last writer wins,
DELETE removes. ~40 lines of pure pandas, no Spark, no shared code with
the engine.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq


def replay(changelog_dir: str, source_pattern: str | None = None) -> pd.DataFrame:
    """Final table state after full replay: (doc_id, tokens, n_tok, source),
    sorted by doc_id. `source_pattern` restricts the replay to events
    whose `source` matches the regex (the per-route subscription view —
    filter EVENTS, then replay)."""
    df = pq.read_table(changelog_dir).to_pandas()

    # only complete (committed) transactions are ever applied; a tx
    # terminated by XAROLLBACK is discarded wholesale
    committed = set(df.loc[df.tx_commit, "tx_id"])
    rolled_back = set(df.loc[df.op == "XAROLLBACK", "tx_id"])
    df = df[df.tx_id.isin(committed - rolled_back)]
    df = df[df.op.isin(["INSERT", "UPDATE", "DELETE"])]
    if source_pattern is not None:
        # subscription view: tx completeness is a STREAM property (the
        # engine's barrier sees the unfiltered stream), so the route
        # filter applies after it, exactly like MultiTableEngine
        df = df[df.source.str.match(source_pattern)]

    # global deterministic order; last writer wins
    df = df.sort_values(["lsn", "source_partition"], kind="stable")

    # sparse row images (generator partial_updates=True): apply only
    # the columns each event names in `updated_cols`; INSERT resets all
    partial = "updated_cols" in df.columns
    state: dict[str, tuple] = {}
    for row in df.itertuples(index=False):
        if row.op == "DELETE":
            state.pop(row.doc_id, None)
        elif not partial:
            state[row.doc_id] = (list(row.tokens), int(row.n_tok), row.source)
        else:
            upd = set(row.updated_cols)
            if row.op == "INSERT":
                prev = (None, None, None)
            else:
                prev = state.get(row.doc_id, (None, None, None))
            toks = (
                (None if row.tokens is None else list(row.tokens))
                if "tokens" in upd
                else prev[0]
            )
            ntk = (
                (None if pd.isna(row.n_tok) else int(row.n_tok))
                if "n_tok" in upd
                else prev[1]
            )
            src = (
                (row.source if isinstance(row.source, str) else None)
                if "source" in upd
                else prev[2]
            )
            state[row.doc_id] = (toks, ntk, src)

    out = pd.DataFrame(
        [(k, v[0], v[1], v[2]) for k, v in state.items()],
        columns=["doc_id", "tokens", "n_tok", "source"],
    )
    return out.sort_values("doc_id").reset_index(drop=True)
