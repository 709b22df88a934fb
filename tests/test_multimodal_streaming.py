"""Multimodal binary-column plumbing + Structured Streaming equivalence."""

import pytest
from pyspark.sql import functions as F

from feapder_spark.operators import multimodal as MM
from feapder_spark.streaming import events as SE

SF = "/root/testdata/sf0.001"


def test_media_decode_plumbing(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = MM.media_from_documents(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    decoded = MM.decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == docs.count()
    by_id = {r.media_id: r for r in rows}
    # deterministic fake decode: dims in range, features 8 floats in [0,1)
    for r in rows[:20]:
        assert 64 <= r.width < 128 and 64 <= r.height < 128
        assert len(r.features) == 8 and all(0 <= f < 1 for f in r.features)
    # n_bytes == utf-8 byte length of the text
    doc0 = docs.filter(F.col("doc_id") == 0).first()
    assert by_id["0"].n_bytes == len(doc0.text.encode("utf-8"))
    # repeated decode is bit-identical (pure function of payload)
    again = {r.media_id: r for r in MM.decode_media(media, fake=True).collect()}
    assert again["0"] == by_id["0"]


def test_media_decode_real_path_raises(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(2)
    media = MM.media_from_documents(docs)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        MM.decode_media(media, fake=False).collect()


def test_resize_and_frame_plans(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    decoded = MM.decode_media(MM.media_from_documents(docs), fake=True).cache()
    resized = MM.resize_images(decoded, max_dim=96).collect()
    assert resized and all(max(r.out_w, r.out_h) <= 96 for r in resized)
    frames = MM.frame_sample_plan(decoded, max_frames=8).collect()
    assert frames and all(1 <= len(r.frame_indices) <= 8 for r in frames)
    decoded.unpersist()


def test_streaming_matches_batch(spark):
    stream_res = SE.run_stream_once(spark, SF, window="1 hour")
    batch_res = SE.batch_equivalent(spark, SF, window="1 hour")
    s = {(r.window_start, r.event_type): (r.n, r.value_sum) for r in stream_res.collect()}
    b = {(r.window_start, r.event_type): (r.n, r.value_sum) for r in batch_res.collect()}
    assert s == b and len(s) > 0
