"""Custom stateful streaming operator: per-key cross-batch LWW gate.

Canal drops stale/duplicate events by comparing against the committed
cursor (offset high-watermark, SURVEY.md §2.9 T5); that check is
per-source-partition. Under at-least-once MQ redelivery a consumer also
needs a PER-KEY gate: an event is forwarded only if its total order
(lsn, source_partition) exceeds the greatest order already seen for its
key — across micro-batches, which requires a state store.

Spark mapping: `applyInPandasWithState` — grouped Arrow-batched pandas
state function (the documented custom-stateful-operator path; no
per-row Python, state is one int64 per key). State scales with
#distinct keys, partitioned by the groupBy hash — hot keys cost one
state row like any other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from canal_spark.operators.lww import SP_BITS

OUTPUT_SCHEMA = (
    "doc_id string, lsn long, source_partition int, op string, "
    "tokens array<int>, n_tok int, source string"
)
STATE_SCHEMA = "max_ord long"


def _gate(key, pdf_iter, state: GroupState):
    import pandas as pd

    import numpy as np

    max_ord = state.get[0] if state.exists else -1
    out = []
    for pdf in pdf_iter:
        ords = (
            pdf["lsn"].to_numpy(dtype=np.int64) * (1 << SP_BITS)
            + pdf["source_partition"].to_numpy(dtype=np.int64)
        )
        # the gate is monotone: after this batch the threshold is the
        # running max, so within a batch every event above the INCOMING
        # threshold that is also a new running max passes; processing
        # in ascending ord makes [7, 3] forward only 7 after state 5
        # while [3, 7] forwards both 3 and 7.
        order = np.argsort(ords, kind="stable")
        keep = []
        for i in order:
            if ords[i] > max_ord:
                keep.append(int(i))
                max_ord = int(ords[i])
        if keep:
            out.append(pdf.iloc[sorted(keep)])
    state.update((max_ord,))
    if out:
        yield pd.concat(out)


def stateful_lww_gate(changes: DataFrame) -> DataFrame:
    """Streaming DataFrame -> streaming DataFrame forwarding only events
    strictly newer (per key) than anything previously forwarded."""
    return changes.groupBy("doc_id").applyInPandasWithState(
        _gate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
