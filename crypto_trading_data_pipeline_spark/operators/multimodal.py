"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas functions.

The decode step itself (image decode, resampling, frame extraction) needs
libs this container doesn't ship (PIL/ffmpeg/torchcodec), so decoders are
STUBBED: ``decoder=None`` uses a deterministic fake that derives features
from the bytes, and passing an unavailable real decoder raises
NotImplementedError. Everything Spark-side is real and tested: schemas,
mapInPandas signatures, Arrow batch shapes, partition sizing.

Scale design:
- binary payloads ride in their own column; metadata queries never touch
  them (parquet column pruning keeps scans cheap);
- decode runs in ``mapInPandas`` — one Arrow batch per call, vectorized,
  no per-row Python overhead; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  stays flat regardless of corpus size;
- repartition BEFORE decode by target parallelism, because decode is
  CPU-bound and upstream partitioning reflects IO, not compute.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", IntegerType()),
    ]
)


def attach_media(df: DataFrame, *, id_col: str, bytes_col: str, kind: str, mime: str) -> DataFrame:
    """Wrap an existing binary column into the canonical media record."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(bytes_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(F.col(bytes_col).cast("binary")).cast("long").alias("n_bytes"),
    )


def _fake_image_decode(payload: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a real image decoder: derives pseudo
    width/height/luma from the payload bytes. Replaced wholesale by a real
    decoder (PIL etc.) in production — the Spark plumbing is identical."""
    n = payload.map(len)
    first = payload.map(lambda b: b[0] if len(b) else 0)
    last = payload.map(lambda b: b[-1] if len(b) else 0)
    return pd.DataFrame(
        {
            "width": (16 + (n % 1024)).astype("int32"),
            "height": (16 + ((n * 7 + first) % 1024)).astype("int32"),
            "mean_luma": ((first.astype("int64") + last) % 256).astype("int32"),
        }
    )


def extract_image_features(
    media: DataFrame,
    *,
    decoder: Callable[[pd.Series], pd.DataFrame] | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow-batched).

    ``decoder`` maps a pandas Series of payload bytes to a DataFrame with
    width/height/mean_luma. None -> deterministic fake (container has no
    image libs); the real-decoder path raises until one is installed.
    """
    if decoder is None:
        decoder = _fake_image_decode
    elif getattr(decoder, "__name__", "") == "pil_decode":  # pragma: no cover
        raise NotImplementedError("real image decoding requires PIL; not in this container")

    src = media.select("media_id", "payload")
    if parallelism is not None:
        # Decode is CPU-bound: spread batches across the target core count
        # instead of inheriting IO-shaped partitioning.
        src = src.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decoder(pdf["payload"])
            feats.insert(0, "media_id", pdf["media_id"].values)
            yield feats

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
