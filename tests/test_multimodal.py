"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub."""

from __future__ import annotations

from ssafynews_data_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_assets,
    fabricate_assets,
    media_decode_features,
)
from ssafynews_data_spark.schemas import MEDIA_ASSET
from ssafynews_data_spark.sources.readers import load_table


def test_fabricated_assets_schema(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = fabricate_assets(docs)
    assert [f.name for f in assets.schema.fields] == [f.name for f in MEDIA_ASSET.fields]
    row = assets.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_type in {"image", "audio", "video"}


def test_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = sorted((r.asset_id, tuple(r.feat)) for r in decode_assets(fabricate_assets(docs)).collect())
    b = sorted((r.asset_id, tuple(r.feat)) for r in decode_assets(fabricate_assets(docs)).collect())
    assert a == b
    assert all(len(f) == 8 for _, f in a)


def test_decoded_schema_contract(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = decode_assets(fabricate_assets(docs))
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert {r.n_frames for r in rows} <= {1, 4}


def test_media_feature_rollup(spark, sf_dir):
    rows = media_decode_features(spark, sf_dir).collect()
    types = {r.media_type for r in rows}
    assert types == {"image", "audio", "video"}
    assert sum(r.n_assets for r in rows) == load_table(spark, sf_dir, "documents").count()
