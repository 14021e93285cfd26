"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data pipeline op (task brief): images/audio/video travel as
``binary`` columns with a metadata struct; decode / feature-extraction
/ resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages.
The image/audio codec libraries are NOT in this container, so the
decode kernels are STUBBED (deterministic fakes clearly marked), while
the Spark-side plumbing — schema, batch shape, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: Standard multimodal row: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), True),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def _decode_image_stub(payload: bytes) -> dict:
    """STUB decode: real deployments plug Pillow/libvips here. The
    deterministic fake derives pseudo-dimensions from the payload hash
    so downstream plumbing (schema, grouping, joins) is fully
    exercisable without codec libraries."""
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired; replace _decode_image_stub"
        )
    except ImportError:
        pass
    import hashlib

    # deterministic digest (Python's hash() is salted per process)
    h = int.from_bytes(
        hashlib.md5(payload or b"").digest()[:4], "big"
    ) & 0x7FFFFFFF
    return {
        "decoded_width": 64 + h % 512,
        "decoded_height": 64 + (h >> 9) % 512,
        "n_bytes": len(payload or b""),
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), True),
        StructField("decoded_width", IntegerType(), True),
        StructField("decoded_height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), True),
    ]
)


def extract_media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches (payload bytes stay in Arrow
    buffers — no per-row Python round trip for the non-binary columns);
    partitioning is preserved, so co-partitioned joins against the
    source remain shuffle-free.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out[
                ["media_id", "kind", "decoded_width", "decoded_height", "n_bytes"]
            ]

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video rows: explode (media_id, frame_ts)
    pairs natively from duration metadata — the decode of each frame is
    the stubbed kernel's job; the plan (which frames, how many rows) is
    pure Catalyst."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_integrity_rules(df: DataFrame):
    """Validation rules for media tables, fused like any rule suite:
    payload present, positive dimensions for images, positive duration
    for audio/video, known kind."""
    from datacheck_spark.rules.compiler import CompiledRule
    from datacheck_spark.schema import Severity

    kind = F.col("kind")
    return [
        CompiledRule(
            "payload_present",
            "payload present",
            Severity.ERROR,
            F.col("payload").isNotNull() & (F.length(F.col("payload")) > 0),
        ),
        CompiledRule(
            "kind_known",
            "kind known",
            Severity.ERROR,
            kind.isin(["image", "audio", "video"]),
            kind,
        ),
        CompiledRule(
            "image_dims_positive",
            "image dims positive",
            Severity.WARNING,
            (kind != "image")
            | (
                F.col("width").isNotNull()
                & (F.col("width") > 0)
                & F.col("height").isNotNull()
                & (F.col("height") > 0)
            ),
        ),
        CompiledRule(
            "av_duration_positive",
            "audio/video duration positive",
            Severity.WARNING,
            (~kind.isin(["audio", "video"]))
            | (F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)),
        ),
    ]


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payloads
    derived from seeded hashes — no external data)."""
    base = spark.range(n).select(
        F.format_string("m_%05d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(
            F.repeat(
                F.conv(F.abs(F.xxhash64("id", F.lit(seed))).cast("string"), 10, 16),
                4,
            ),
            "UTF-8",
        ).alias("payload"),
        (64 + F.pmod(F.abs(F.xxhash64("id", F.lit(seed + 1))), 1024)).cast(
            "int"
        ).alias("width"),
        (64 + F.pmod(F.abs(F.xxhash64("id", F.lit(seed + 2))), 1024)).cast(
            "int"
        ).alias("height"),
        F.when(
            F.pmod(F.col("id"), 3) > 0,
            (1000 + F.pmod(F.abs(F.xxhash64("id", F.lit(seed + 3))), 10000)).cast("int"),
        ).alias("duration_ms"),
    )
    return base
