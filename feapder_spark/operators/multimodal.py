"""Multimodal columns — image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing is real and tested: schema, partitioning, Arrow
batch shapes, and the ``mapInPandas`` decode/feature/resize/frame-sample
signatures are exactly what a production pipeline uses.  The *codec* step is
stubbed: this image ships no pillow/torchaudio/ffmpeg, so ``fake=False``
raises ``NotImplementedError`` at the exact call site where a real decoder
plugs in, and ``fake=True`` produces a deterministic, engine-portable
"decode" (dimensions/features derived from the payload's md5) so the
distributed plumbing can be verified end-to-end and against a SQL oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = "media_id STRING, kind STRING, payload BINARY, meta MAP<STRING, STRING>"
DECODED_DDL = (
    "media_id STRING, kind STRING, width INT, height INT, n_bytes INT, "
    "features ARRAY<FLOAT>, decode_partition INT"
)

KINDS = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents corpus: payload =
    utf-8 text bytes, kind = doc_id mod 3.  (Test/bench input builder —
    production reads real blobs from object storage.)"""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a codec: dims from the payload md5 (hex
    chars → ascii mod), 8 features from digest bytes scaled to [0,1)."""
    d = hashlib.md5(payload).hexdigest()
    width = 64 + ord(d[0]) % 64
    height = 64 + ord(d[1]) % 64
    raw = hashlib.md5(payload).digest()
    features = [b / 256.0 for b in raw[:8]]
    return width, height, features


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas).

    Real decoders (PIL.Image.open / soundfile / pyav) would slot into the
    marked branch; batch shape, output schema and partitioning are identical
    either way.
    """

    def decode_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                blob = bytes(payload)
                if not fake:
                    # real codec integration point (pillow/torchaudio/pyav)
                    raise NotImplementedError(
                        "real media decode requires pillow/torchaudio/pyav — "
                        "not available in this image; use fake=True"
                    )
                width, height, features = _fake_decode(blob)
                rows.append((media_id, kind, width, height, len(blob), features, pid))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_bytes", "features", "decode_partition"],
            )

    # media blobs are large: partition by count, not bytes-in-plan.
    # Project to exactly the columns the decode touches BEFORE the Python
    # boundary (guide §4.1) — mapInPandas is opaque to column pruning, so an
    # un-projected frame would ship (and shuffle) the meta map for nothing.
    n_parts = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.select("media_id", "kind", "payload")
        .repartition(n_parts)
        .mapInPandas(decode_map, schema=DECODED_DDL)
    )


def resize_images(decoded: DataFrame, max_dim: int = 96) -> DataFrame:
    """Resize planning: pure column math (the actual pixel work would live
    in the decode UDF) — keeps aspect ratio, caps the longer side."""
    scale = F.least(F.lit(1.0), F.lit(max_dim) / F.greatest("width", "height"))
    return decoded.filter(F.col("kind") == "image").select(
        "media_id",
        F.round(F.col("width") * scale).cast("int").alias("out_w"),
        F.round(F.col("height") * scale).cast("int").alias("out_h"),
    )


def frame_sample_plan(decoded: DataFrame, fps: int = 1, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plan for videos: frame indices as an array column
    (ffmpeg would consume this plan inside the decode UDF)."""
    n_frames = F.least(F.lit(max_frames), (F.col("n_bytes") % 32 + 1).cast("int"))
    return decoded.filter(F.col("kind") == "video").select(
        "media_id",
        F.sequence(F.lit(0), n_frames - 1).alias("frame_indices"),
    )
