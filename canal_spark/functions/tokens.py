"""Vectorized (Arrow/pandas) UDFs — the sanctioned slow path.

Per input_hint (BASELINE.json:15) ALL custom compute is vectorized
pandas/Arrow — never per-row Python. Canal's analog is the
user-supplied row predicate/transform surface
[C: filter/.../aviater/AviaterELFilter.java] — here it is a pandas_udf
over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.IntegerType())
def char_len_udf(text: pd.Series) -> pd.Series:
    """Vectorized char count (oracle: LENGTH(text)) — proves the Arrow
    round trip is lossless vs the JVM-side equivalent."""
    return text.str.len().astype("int32")


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def token_clip_udf(tokens: pd.Series) -> pd.Series:
    """Token-array normalization: clip ids into [0, 32000) — an
    arbitrary-but-deterministic array transform over Arrow batches
    (each element arrives as a numpy array; vectorized clip)."""
    return tokens.map(
        lambda a: None if a is None else np.minimum(np.asarray(a, dtype=np.int32), 31_999)
    )


def multimodal_decode_stub(df, binary_col: str = "payload", batch_schema: str | None = None):
    """Multimodal column plumbing: treat media as opaque binary +
    typed metadata, "decode" via mapInPandas in Arrow batches.

    The actual image/audio decode is STUBBED (decode libs absent in
    this environment — marked clearly); the Spark-side contract is
    real: schema, batching, partition preservation are what a decoder
    plugs into. The fake feature is deterministic: the first 8 bytes
    of the payload as int64, plus the byte length.
    """
    out_schema = batch_schema or "doc_id long, n_bytes int, feat long"

    def decode(batches):
        for pdf in batches:
            payloads = pdf[binary_col]
            # >>> STUB: real decoders (PIL/torchaudio/av) go here <<<
            n_bytes = payloads.map(len).astype("int32")
            feat = payloads.map(
                lambda b: int.from_bytes(bytes(b[:8]).ljust(8, b"\0"), "little", signed=True)
            ).astype("int64")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bytes": n_bytes, "feat": feat}
            )

    return df.mapInPandas(decode, schema=out_schema)
