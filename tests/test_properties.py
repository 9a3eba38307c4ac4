"""Property-based invariants (hypothesis, SURVEY.md §5.2):

- LWW collapse == the trivially-correct pandas argmax oracle for ANY
  event set;
- row-order / cross-partition permutation never changes the outcome
  (events may arrive interleaved arbitrarily across source partitions
  — only the per-partition lsn order carries meaning);
- shuffle-partition count never changes the outcome (plan-level
  parallelism invariance; the cross-JVM local[8]/local[32] variant is
  scripts/scaling_bench.py's job).

Examples are kept small and few: each runs a real Spark job.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from canal_spark.operators.lww import lww_collapse

PAYLOAD = ("op", "tokens", "n_tok", "source")


@st.composite
def event_sets(draw):
    """A list of change events with per-partition monotone lsn."""
    n = draw(st.integers(min_value=1, max_value=60))
    next_lsn = {}
    events = []
    for i in range(n):
        part = draw(st.integers(min_value=0, max_value=3))
        lsn = next_lsn.get(part, 0) + draw(st.integers(min_value=1, max_value=3))
        next_lsn[part] = lsn
        key = f"doc{draw(st.integers(min_value=0, max_value=9))}"
        op = draw(st.sampled_from(["INSERT", "UPDATE", "DELETE"]))
        toks = draw(st.lists(st.integers(min_value=0, max_value=999), max_size=5))
        events.append(
            {
                "doc_id": key,
                "lsn": lsn,
                "source_partition": part,
                "op": op,
                "tokens": toks,
                "n_tok": len(toks),
                "source": f"src{part}",
            }
        )
    return events


def pandas_lww_oracle(events: list[dict]) -> pd.DataFrame:
    """Winner per key = max (lsn, source_partition); trivially correct."""
    df = pd.DataFrame(events)
    idx = (
        df.assign(rank=list(zip(df.lsn, df.source_partition)))
        .groupby("doc_id")["rank"]
        .idxmax()
    )
    return df.loc[idx.values].reset_index(drop=True)


def _spark_df(spark, events):
    return spark.createDataFrame(
        pd.DataFrame(events),
        "doc_id string, lsn long, source_partition int, op string, "
        "tokens array<int>, n_tok int, source string",
    )


def _collapse_to_pandas(spark, events):
    out = (
        lww_collapse(_spark_df(spark, events), key="doc_id", payload_cols=PAYLOAD)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["tokens"] = out["tokens"].map(lambda a: list(a) if a is not None else a)
    return out


COMMON = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(events=event_sets())
@settings(**COMMON)
def test_lww_matches_pandas_argmax_oracle(spark, events):
    got = _collapse_to_pandas(spark, events)
    exp = (
        pandas_lww_oracle(events)
        .sort_values("doc_id")
        .reset_index(drop=True)[list(got.columns)]
    )
    pd.testing.assert_frame_equal(
        got, exp.astype(got.dtypes.to_dict()), check_dtype=False
    )


@given(events=event_sets(), seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(**COMMON)
def test_lww_invariant_under_row_permutation(spark, events, seed):
    import random

    shuffled = events[:]
    random.Random(seed).shuffle(shuffled)
    pd.testing.assert_frame_equal(
        _collapse_to_pandas(spark, events), _collapse_to_pandas(spark, shuffled)
    )


@given(events=event_sets(), parts=st.sampled_from([1, 3, 7, 16]))
@settings(**COMMON)
def test_lww_invariant_under_physical_partitioning(spark, events, parts):
    base = _collapse_to_pandas(spark, events)
    re = (
        lww_collapse(
            _spark_df(spark, events).repartition(parts),
            key="doc_id",
            payload_cols=PAYLOAD,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    re["tokens"] = re["tokens"].map(lambda a: list(a) if a is not None else a)
    pd.testing.assert_frame_equal(base, re[list(base.columns)])


@given(
    events=event_sets(),
    k=st.integers(min_value=0, max_value=60),
)
@settings(**COMMON)
def test_mor_resolution_is_lww_homomorphism(spark, events, k):
    """The merge-on-read read algebra: LWW-collapse each slice of an
    ARBITRARY split into fragments, union the fragments, resolve by
    max `_seq` per key — must equal LWW over the whole event set. This
    is the invariant that makes fragment appends + read-side
    resolution equivalent to the monolithic collapse for every epoch
    slicing."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    k = min(k, len(events))
    slices = [e for e in (events[:k], events[k:]) if e]
    frags = [
        lww_collapse(_spark_df(spark, s), key="doc_id", payload_cols=PAYLOAD, with_seq=True)
        for s in slices
    ]
    union = frags[0]
    for f in frags[1:]:
        union = union.unionByName(f)
    w = Window.partitionBy("doc_id").orderBy(F.desc("_seq"))
    resolved = (
        union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seq")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    resolved["tokens"] = resolved["tokens"].map(
        lambda a: list(a) if a is not None else a
    )
    base = _collapse_to_pandas(spark, events)
    pd.testing.assert_frame_equal(base, resolved[list(base.columns)])
