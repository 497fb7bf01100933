"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step PROBES for Pillow at call time (inside the worker
closure) and uses it when importable — no hard dependency; without it,
``fake=True`` produces a deterministic feature vector derived from the
payload bytes and ``fake=False`` raises the documented
NotImplementedError (this container ships no image/audio libs).
Everything Spark-side — schema, batch iteration, partitioning, UDF
signatures — is real and tested either way; audio/video decoders
(torchaudio/ffmpeg) would slot into the same ``_decode_real`` seam.

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


def _pil():
    """Probe for Pillow AT CALL TIME (inside the executor-side closure,
    so availability is decided where the decode actually runs). Returns
    the PIL.Image module or None — never a hard dependency."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _use_fake(fake: bool | None) -> bool:
    """Resolve the three-state decode mode: True/False are explicit;
    None means auto — use the real decoder iff Pillow is importable."""
    if fake is None:
        return _pil() is None
    return bool(fake)


def _decode_real(payload: bytes) -> list[float]:
    """Real image decode -> deterministic 8-dim feature (per-channel RGB
    mean + std, aspect ratio, bounded pixel count). Raises
    NotImplementedError when Pillow is absent — the documented env-gated
    stub boundary."""
    image_mod = _pil()
    if image_mod is None:
        raise NotImplementedError(
            "image decoding requires Pillow, not present in this "
            "container; call with fake=True for the deterministic stub"
        )
    import io

    import numpy as np

    img = image_mod.open(io.BytesIO(payload)).convert("RGB")
    arr = np.asarray(img, dtype=np.float64) / 255.0
    means = arr.mean(axis=(0, 1))
    stds = arr.std(axis=(0, 1))
    aspect = img.width / max(img.height, 1)
    n_pixels = arr.shape[0] * arr.shape[1]  # pixels, not pixel*channel
    return [
        *(float(x) for x in means),
        *(float(x) for x in stds),
        float(aspect),
        float(min(1.0, n_pixels / 1e6)),
    ]


def _resize_real(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize -> PNG re-encode; NotImplementedError without Pillow."""
    image_mod = _pil()
    if image_mod is None:
        raise NotImplementedError(
            "image resizing requires Pillow, not present in this "
            "container; call with fake=True for the deterministic stub"
        )
    import io

    img = image_mod.open(io.BytesIO(payload)).convert("RGB")
    out = io.BytesIO()
    img.resize((target_w, target_h)).save(out, format="PNG")
    return out.getvalue()


def decode_image(payload: bytes, fake: bool | None = False) -> list[float]:
    """Image payload -> 8-dim feature vector.

    ``fake=True`` yields a deterministic feature from the sha256 of the
    payload so the distributed plumbing is testable end-to-end;
    ``fake=False`` decodes with Pillow when importable (probe-and-use —
    no hard dependency) and raises NotImplementedError otherwise;
    ``fake=None`` auto-selects (real iff Pillow present).
    """
    if _use_fake(fake):
        digest = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in digest[:8]]
    return _decode_real(payload)


def extract_features(df: DataFrame, fake: bool | None = True) -> DataFrame:
    """Binary media rows -> feature rows via Arrow-batched mapInPandas.

    ``fake=None`` auto-probes for Pillow ONCE, on the driver, and ships
    the resolved boolean into the worker closure — on a heterogeneous
    cluster (Pillow on some workers only) a per-executor probe would
    silently mix real RGB-stat features with sha256-stub features under
    one schema (ADVICE r5). Workers that then lack Pillow fail loudly
    via _decode_real's NotImplementedError rather than downgrading.
    True/False force a mode. The registered bench/oracle query pins
    fake=True so its output stays engine-portable regardless of
    installed libraries."""
    use_fake = _use_fake(fake)

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
                if use_fake:
                    digest = hashlib.sha256(b).digest()
                    sha_hex.append(digest.hex())
                    features.append([x / 255.0 for x in digest[:8]])
                else:
                    sha_hex.append(hashlib.sha256(b).hexdigest())
                    features.append(_decode_real(b))
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
    df: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool | None = True
) -> DataFrame:
    """Resize stage: binary in -> binary out with new dimensions, via
    Arrow-batched mapInPandas (the standard pre-processing step before a
    vision encoder). ``fake=True`` emits a deterministic payload derived
    from the source bytes + target size, so batch shape, schema, and
    null/dimension handling are tested end-to-end; ``fake=False`` (or
    auto via None, probed in the worker) resizes with Pillow when
    importable and raises the documented NotImplementedError otherwise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_fake = _use_fake(fake)
        for pdf in batches:
            payloads: list[bytes | None] = []
            for b in pdf["payload"]:
                if b is None:
                    payloads.append(None)
                elif use_fake:
                    seed = hashlib.sha256(
                        bytes(b) + f":{target_w}x{target_h}".encode()
                    ).digest()
                    payloads.append(seed * 4)  # deterministic 128-byte stand-in
                else:
                    payloads.append(_resize_real(bytes(b), target_w, target_h))
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
