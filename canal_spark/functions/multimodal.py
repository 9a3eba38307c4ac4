"""Multimodal column plumbing: media as opaque binary + typed metadata.

The Spark-side contract is fully real — schemas, Arrow batch shapes,
fan-out, blob-aware partitioning — while the pixel/sample decode itself
is STUBBED behind a try-import (no image/audio libraries exist in this
environment; the seam is marked and raises cleanly when a real decoder
is requested but unavailable). A training-data pipeline plugs PIL /
pyav / torchaudio into the marked spots without touching any plan.

Scale notes (the part that matters at 100 TB):
- media blobs ride in a `binary` column next to a typed `media_meta`
  struct; filters on metadata (kind, dims, duration) are JVM-side and
  push down — the blob column is only read by stages that decode;
- Arrow transfer of big blobs is bounded two ways: rows per batch
  (`spark.sql.execution.arrow.maxRecordsPerBatch`) and partition
  sizing by BYTES, not rows (`repartition_for_blobs` below) — 10k rows
  of 10 MB each in one task is an OOM, not a plan;
- frame sampling is a fan-out (one row per kept frame) expressed with
  mapInPandas so the decoder amortizes per-blob setup across the
  batch; the output schema is explicit (never inferred).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: typed metadata carried beside every media blob
MEDIA_META_DDL = (
    "struct<kind:string, width:int, height:int, sample_rate:int, "
    "n_frames:int, codec:string>"
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    kind: str = "video",
) -> DataFrame:
    """Derive a deterministic `media_meta` struct from the payload (in
    production this comes from the container header — ffprobe etc.;
    here it is a pure function of the bytes so tests and oracles can
    recompute it)."""
    nb = F.length(F.col(payload_col))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            (F.pmod(nb, F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(nb, F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(16_000).alias("sample_rate"),
            (F.pmod(nb, F.lit(24)) + 8).cast("int").alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).cast(MEDIA_META_DDL),
    )


def frame_sample(
    df: DataFrame,
    every_n: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    real_decoder: bool = False,
) -> DataFrame:
    """One output row per sampled frame (indices 0, every_n, 2*every_n,
    … below media_meta.n_frames): the UDTF-shaped fan-out a video
    pipeline needs. Decode is stubbed: each 'frame' is a deterministic
    16-byte window of the payload; with real_decoder=True a real
    container demuxer (pyav) is required and its absence raises."""
    if real_decoder:
        try:
            import av  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "real frame decode needs pyav, which is not installed in "
                "this environment; the stub path (real_decoder=False) "
                "exercises identical Spark plumbing"
            ) from e

    out_schema = f"{id_col} long, frame_idx int, frame_len int, frame binary"

    def sample(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            nf = pdf["media_meta"].map(lambda m: m["n_frames"]).to_numpy(dtype=np.int64)
            counts = -(-nf // every_n)  # frames kept per doc (ceil)
            # vectorized fan-out: repeat doc rows by their kept-frame
            # count, intra-doc index -> sampled frame index
            rep = np.repeat(np.arange(len(pdf)), counts)
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            frame_idx = (np.arange(len(rep)) - starts) * every_n
            # >>> STUB: real per-frame decode (av.open(...)) goes here;
            # the stub frame is a deterministic 16-byte window <<<
            windows = pdf[payload_col].map(lambda b: bytes(b)[:16]).to_numpy(dtype=object)
            frames = windows[rep]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[rep],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_len": np.fromiter(
                        (len(w) for w in windows), dtype=np.int32, count=len(windows)
                    )[rep],
                    "frame": frames,
                }
            )

    return df.mapInPandas(sample, schema=out_schema)


def resize_thumbnail(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    payload_col: str = "payload",
    real_decoder: bool = False,
) -> DataFrame:
    """Adds `thumb: binary` of exactly width*height bytes — the
    resize/feature-extract shape. Stub output is a deterministic byte
    pattern derived from the payload (cycled), so tests can assert
    content, not just shape; real path needs PIL."""
    if real_decoder:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "real image resize needs Pillow, which is not installed "
                "in this environment"
            ) from e

    import pyspark.sql.types as T

    n_out = width * height

    @F.pandas_udf(T.BinaryType())
    def _thumb(payload: pd.Series) -> pd.Series:
        # >>> STUB: real decode+resize (PIL Image.resize) here <<<
        def fake(b):
            b = bytes(b)
            if not b:
                return bytes(n_out)
            reps = -(-n_out // len(b))
            return (b * reps)[:n_out]

        return payload.map(fake)

    return df.withColumn("thumb", _thumb(F.col(payload_col)))


def repartition_for_blobs(
    df: DataFrame,
    target_partition_bytes: int = 256 << 20,
    payload_col: str = "payload",
) -> DataFrame:
    """Partition by BYTES, not rows: one cheap aggregate estimates the
    total blob volume, then repartitions so each task carries roughly
    `target_partition_bytes` of media. Row-count-based partitioning is
    wrong for media (row sizes span 4 orders of magnitude)."""
    total = df.agg(F.sum(F.length(F.col(payload_col)))).first()[0] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)
