"""Multimodal (image/audio/video) column plumbing (north-star
requirement).

Design: media travels as an opaque ``binary`` column plus a typed
metadata struct; per-item compute (decode, resize, feature extraction,
frame sampling) runs as Arrow-batched ``mapInPandas`` so the Python
media libraries see contiguous byte batches, while everything around it
(partitioning, filtering on metadata, joins to labels) stays JVM-side.

The actual codec work needs libraries this container does not ship
(PIL/ffmpeg/soundfile), so the decode kernel is STUBBED: by default it
raises NotImplementedError; with ``fake=True`` it produces a
deterministic synthetic decode so the full pipeline — schema, batch
iteration, partition sizing, output assembly — is exercised end-to-end
in tests. The Spark-side plumbing is real; only the innermost
bytes→pixels call is a placeholder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the decode stage: one row per media item.
DECODE_SCHEMA = (
    "item_id bigint, n_bytes bigint, sha256 string, "
    "width int, height int, n_channels int, mean_intensity double"
)


def attach_media_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """JVM-side metadata over the opaque bytes: size + content hash.
    Cheap, codegen'd, and enough for exact-dup removal and size
    filtering without ever decoding."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.col(binary_col).alias("media"),
        F.length(F.col(binary_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(binary_col), 256).alias("sha256"),
    )


def _decode_bytes(payload: bytes, fake: bool) -> tuple[int, int, int, float]:
    """bytes → (width, height, channels, mean_intensity).

    STUB: real decode requires an image codec library not present in
    this environment. The ``fake`` path derives deterministic values
    from the payload so tests exercise real data flow.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio codec library (e.g. PIL, "
            "ffmpeg); install one and replace _decode_bytes"
        )
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    mean = (sum(payload[:64]) / max(1, min(n, 64))) / 255.0
    return width, height, channels, round(mean, 6)


def decode_media(df: DataFrame, fake: bool = False, batch_hint: int | None = None) -> DataFrame:
    """The decode stage: mapInPandas over (item_id, media) batches.

    Arrow delivers each partition as pandas DataFrames of raw bytes;
    output rows carry decoded metadata + features. At scale the
    partition size (spark.sql.files.maxPartitionBytes) bounds executor
    memory per batch — media bytes never concentrate on the driver.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "item_id": [],
                "n_bytes": [],
                "sha256": [],
                "width": [],
                "height": [],
                "n_channels": [],
                "mean_intensity": [],
            }
            for item_id, payload in zip(pdf["item_id"], pdf["media"]):
                payload = bytes(payload)
                w, h, c, m = _decode_bytes(payload, fake)
                out["item_id"].append(item_id)
                out["n_bytes"].append(len(payload))
                out["sha256"].append(hashlib.sha256(payload).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(c)
                out["mean_intensity"].append(m)
            yield pd.DataFrame(out)

    return df.select("item_id", "media").mapInPandas(decode, DECODE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame"
    (byte offset stride stands in for time stride — the real kernel
    would seek keyframes). Demonstrates the 1→N row expansion shape
    (posexplode of a generated offsets array) that video pipelines
    need, entirely JVM-side."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(F.length("media") - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return df.select(
        "item_id",
        F.length("media").cast("bigint").alias("n_bytes"),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
