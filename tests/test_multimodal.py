"""Multimodal plumbing: typed metadata, frame-sample fan-out, resize
shapes, blob-aware partitioning. Decode itself is stubbed (declared);
everything Spark-side — schemas, batch shapes, counts, partitioning —
is asserted for real."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from canal_spark.functions import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return MM.attach_media_meta(
        spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", F.encode("text", "UTF-8").alias("payload")
        )
    ).cache()


def test_media_meta_schema_and_determinism(media):
    f = dict(media.dtypes)["media_meta"]
    assert "n_frames:int" in f.replace(" ", "") and "kind:string" in f.replace(" ", "")
    a = media.select("doc_id", "media_meta").collect()
    b = media.select("doc_id", "media_meta").collect()
    assert a == b


def test_frame_sample_fanout_counts(media):
    every = 4
    frames = MM.frame_sample(media, every_n=every)
    got = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    exp = {
        r["doc_id"]: -(-r["nf"] // every)  # ceil(n_frames / every)
        for r in media.select("doc_id", F.col("media_meta.n_frames").alias("nf")).collect()
    }
    assert got == exp
    # frame indices are the sampled arithmetic sequence
    one = frames.filter(F.col("doc_id") == min(got)).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == list(range(0, exp[min(got)] * every, every))


def test_frame_bytes_deterministic_window(media):
    frames = MM.frame_sample(media, every_n=8)
    joined = frames.join(media.select("doc_id", "payload"), "doc_id")
    bad = joined.filter(
        F.col("frame") != F.substring(F.col("payload"), 1, 16)
    ).count()
    assert bad == 0
    assert frames.filter(F.col("frame_len") != F.length("frame")).count() == 0


def test_resize_thumbnail_shape_and_content(media):
    out = MM.resize_thumbnail(media, width=8, height=8)
    assert out.filter(F.length("thumb") != 64).count() == 0
    # deterministic content: thumb is the payload cycled to 64 bytes
    row = out.select("payload", "thumb").first()
    b = bytes(row["payload"])
    exp = (b * (-(-64 // len(b))))[:64] if b else bytes(64)
    assert bytes(row["thumb"]) == exp


def test_real_decoder_gate_raises_cleanly(media):
    with pytest.raises(NotImplementedError, match="pyav"):
        MM.frame_sample(media, real_decoder=True)
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.resize_thumbnail(media, real_decoder=True)


def test_repartition_for_blobs_sizes_by_bytes(media):
    tiny = MM.repartition_for_blobs(media, target_partition_bytes=64 << 20)
    assert tiny.rdd.getNumPartitions() == 1  # corpus ≪ 64 MB -> one task
    fine = MM.repartition_for_blobs(media, target_partition_bytes=16 << 10)
    assert fine.rdd.getNumPartitions() > 1  # 16 KB target -> many tasks
