"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector derived from the payload bytes. Everything Spark-side — schema,
batch iteration, partitioning, UDF signatures — is real and tested, so
swapping in a real decoder (PIL/torchaudio/ffmpeg) is a one-function
change at the marked point.

At scale: mapInPandas streams Arrow batches through the Python worker;
binary payloads never materialize on the driver, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds worker memory.
Partition by a size-aware key (e.g. bytes // 256MB) before heavy decode
stages so task runtimes stay balanced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """STUB: real deployments plug PIL/torchvision here.

    ``fake=True`` yields a deterministic 8-dim feature from the sha256 of
    the payload so the distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; call with fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Binary media rows -> feature rows via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # single pass over the payload column: one sha256 per row feeds
            # both the hex digest and the (stubbed) feature, instead of three
            # independent .map traversals
            n_bytes: list[int] = []
            sha_hex: list[str | None] = []
            features: list[list[float] | None] = []
            for b in pdf["payload"]:
                if b is None:
                    n_bytes.append(0)
                    sha_hex.append(None)
                    features.append(None)
                    continue
                n_bytes.append(len(b))
                if fake:
                    digest = hashlib.sha256(b).digest()
                    sha_hex.append(digest.hex())
                    features.append([x / 255.0 for x in digest[:8]])
                else:
                    sha_hex.append(hashlib.sha256(b).hexdigest())
                    features.append(decode_image(b, fake=False))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": n_bytes,
                    "content_sha256": sha_hex,
                    "feature": features,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode a (media_id, frame_ts_ms) row
    per sample point from the metadata — pure JVM (sequence+explode); the
    actual frame extraction would be a mapInPandas decode over this plan."""
    return df.filter(F.col("duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as an opaque
    payload so the media pipeline can run on the synthetic testdata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Resize stage: binary in -> binary out with new dimensions, via
    Arrow-batched mapInPandas (the standard pre-processing step before a
    vision encoder). The pixel work is STUBBED like decode_image (no
    image libs here): ``fake=True`` emits a deterministic payload derived
    from the source bytes + target size, so batch shape, schema, and
    null/dimension handling are tested end-to-end; a real deployment
    replaces only the inner function with PIL/torchvision."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads: list[bytes | None] = []
            for b in pdf["payload"]:
                if b is None:
                    payloads.append(None)
                elif fake:
                    seed = hashlib.sha256(
                        bytes(b) + f":{target_w}x{target_h}".encode()
                    ).digest()
                    payloads.append(seed * 4)  # deterministic 128-byte stand-in
                else:
                    payloads.append(decode_image(b, fake=False))  # pragma: no cover
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "width": target_w,
                    "height": target_h,
                    "payload": payloads,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def balance_by_size(
    df: DataFrame,
    payload_col: str = "payload",
    target_partition_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Repartition media rows so each task carries ~target bytes of
    payload, not ~equal row counts — with megabyte images next to
    kilobyte thumbnails, row-balanced tasks straggle. One lightweight
    count job sizes the layout; the shuffle key is a hash of the payload
    length + id so large objects spread uniformly."""
    total = df.select(
        F.sum(F.coalesce(F.length(payload_col), F.lit(0))).alias("b")
    ).collect()[0].b or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n, F.xxhash64(F.coalesce(F.length(payload_col), F.lit(0)), F.col("media_id")))
