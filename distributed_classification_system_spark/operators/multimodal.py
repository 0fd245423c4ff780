"""Multimodal column operators for large-scale training-data pipelines.

Media (image/audio/video) is carried as an opaque ``binary`` column with a
typed metadata struct — the Spark-native shape for a 100 TB corpus: the
bytes never leave the JVM until a vectorized UDF needs them, scans prune
to metadata-only when the payload isn't touched, and partitioning is by
content hash so decode work spreads evenly.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is a seam: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a deterministic fake decoder is selected
(the default for tests/benches). Everything around the seam — schemas,
Arrow batch shape, ``mapInPandas`` plumbing, batching, partitioning — is
real and tested; swapping in a real codec changes one function.

Reference mapping: the reference's payload is exactly this shape — opaque
image bytes fetched per item and fed to a model
(ml-service/controllers/classification_controller.py:37-58, 60-106); we
replace the per-item S3 fetch + PIL decode with columnar binary + batched
decode UDFs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # jpeg|png|wav|mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, False),
    ]
)

IMAGE_FEATURES = "media_id long, feat array<float>, decode_w int, decode_h int"
AUDIO_FRAMES = "media_id long, frame_idx int, rms double"


def gen_media(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    sha256 streams (stand-in for real encoded frames), metadata typed."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.sha2(F.concat(F.lit(f"media-{seed}-"), F.col("id")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.when(F.col("id") % 3 == 0, F.lit("image"))
            .when(F.col("id") % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
            .alias("media_type"),
            F.when(F.col("id") % 3 == 0, F.lit("jpeg")).otherwise(F.lit("wav")).alias("format"),
            F.when(F.col("id") % 3 == 0, (F.pmod(F.col("id"), 4) * 64 + 128)).cast("int").alias("width"),
            F.when(F.col("id") % 3 == 0, (F.pmod(F.col("id"), 3) * 64 + 128)).cast("int").alias("height"),
            F.when(F.col("id") % 3 != 0, (F.pmod(F.col("id"), 10) * 1000 + 500)).cast("int").alias("duration_ms"),
            F.when(F.col("id") % 3 == 1, F.lit(16000)).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: expands the payload
    into a (h, w) float array via a seeded byte stream. Same signature and
    batch shape a PIL/turbojpeg decoder would have."""
    need = width * height
    stream = bytearray()
    block = payload or b"\x00"
    while len(stream) < need:
        block = hashlib.sha256(block).digest()
        stream.extend(block)
    arr = np.frombuffer(bytes(stream[:need]), dtype=np.uint8).astype(np.float32)
    return arr.reshape(height, width) / 255.0


def decode_image(payload: bytes, width: int, height: int, fake: bool = True) -> np.ndarray:
    if fake:
        return _fake_decode_image(payload, width, height)
    raise NotImplementedError(
        "real image codecs (PIL/libjpeg) are not installed in this "
        "environment; plug a decoder in here — the surrounding Spark "
        "plumbing (schema, mapInPandas batching, partitioning) is unchanged"
    )


def image_features(media: DataFrame, target: int = 8, fake_decode: bool = True) -> DataFrame:
    """Decode → resize → feature-extract over the image rows, as an
    Arrow-batched ``mapInPandas`` (one decoder instance per batch, no
    per-row Python dispatch). Feature = mean-pooled ``target×target``
    grid, the classic thumbnail embedding."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                w = int(row.width) if row.width == row.width else 128
                h = int(row.height) if row.height == row.height else 128
                img = decode_image(row.payload, w, h, fake=fake_decode)
                # center-crop to a multiple of target, then mean-pool
                ch, cw = (h // target) * target, (w // target) * target
                img = img[:ch, :cw]
                pooled = img.reshape(target, ch // target, target, cw // target).mean(axis=(1, 3))
                out.append(
                    {
                        "media_id": row.media_id,
                        "feat": pooled.flatten().astype(np.float32),
                        "decode_w": w,
                        "decode_h": h,
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "feat", "decode_w", "decode_h"])

    imgs = media.filter(F.col("meta.media_type") == "image").select(
        "media_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    # decode is CPU-heavy: spread by content, not arrival order
    imgs = imgs.repartition(imgs.sparkSession.sparkContext.defaultParallelism, "media_id")
    return imgs.mapInPandas(run, IMAGE_FEATURES)


def audio_frame_stats(media: DataFrame, frame_ms: int = 250, fake_decode: bool = True) -> DataFrame:
    """Frame-sample audio payloads and compute per-frame RMS — the
    frame-sampling plumbing (explode per frame, deterministic frame
    count from duration) is real; the sample decode is the same seam."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                n_frames = max(1, int(row.duration_ms) // frame_ms)
                samples = decode_image(row.payload, 64, n_frames, fake=fake_decode)
                rms = np.sqrt((samples**2).mean(axis=1))
                for i, v in enumerate(rms):
                    out.append({"media_id": row.media_id, "frame_idx": i, "rms": float(v)})
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "rms"])

    auds = media.filter(F.col("meta.media_type") == "audio").select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    auds = auds.repartition(auds.sparkSession.sparkContext.defaultParallelism, "media_id")
    return auds.mapInPandas(run, AUDIO_FRAMES)


def media_inventory(media: DataFrame) -> DataFrame:
    """Metadata-only rollup: never touches the payload column — the scan
    prunes to the meta struct (check ReadSchema in the plan)."""
    return media.groupBy(F.col("meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("meta.width").isNotNull(), F.col("meta.width") * F.col("meta.height")).otherwise(0)).alias("total_pixels"),
        F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("total_duration_ms"),
    )
