"""Multimodal plumbing tests: schema, batch shape, determinism,
partition-invariance, and the clearly-marked decode stubs.

The decode/resize compute is stubbed (no image libs in this env,
multimodal/ops.py module docstring) — these tests pin down the part
that must be real at 100 TB: Arrow-batched mapInPandas stages with
typed schemas whose output does not depend on how the input is
partitioned.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdataprojectspring16_spark.multimodal.ops import (
    FEATURE_DIM,
    decode_images,
    extract_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from bigdataprojectspring16_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    return with_binary_payload(load_table(spark, SF_DIR, "documents")).cache()


def test_payload_schema_and_bytes(assets):
    schema = dict(assets.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<media_type:string,n_bytes:int")
    row = assets.select(
        (F.length("payload") == F.col("meta.n_bytes")).alias("ok")
    ).agg(F.min("ok")).first()
    assert row[0] is True


def test_decode_fake_is_deterministic_and_partition_invariant(assets):
    a = sorted(decode_images(assets).collect())
    b = sorted(decode_images(assets.repartition(7)).collect())
    assert a == b
    assert all(r.width >= 16 and r.height >= 16 and 1 <= r.channels <= 3 for r in a)


def test_decode_real_is_a_marked_stub(assets):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_images(assets, real=True)


def test_features_shape_and_normalization(assets):
    feats = extract_features(assets)
    rows = feats.limit(20).collect()
    assert feats.columns == ["doc_id", "n_bytes", "mean_byte", "features"]
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram
    # partition-invariant
    n1 = feats.agg(F.sum(F.element_at("features", 1))).first()[0]
    n2 = extract_features(assets.repartition(5)).agg(
        F.sum(F.element_at("features", 1))
    ).first()[0]
    assert abs(n1 - n2) < 1e-9


def test_resize_fits_max_side(assets):
    resized = resize_images(decode_images(assets), max_side=64)
    bad = resized.where((F.col("width") > 64) | (F.col("height") > 64)).count()
    assert bad == 0
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_images(decode_images(assets), real=True)


def test_frame_sampling_explodes_one_to_many(assets):
    frames = sample_frames(assets, frame_size=64, every=4)
    n_assets = assets.count()
    n_frames = frames.count()
    assert n_frames > n_assets  # 1:N explode
    # every sampled frame index is a multiple of `every`
    assert frames.where(F.col("frame_idx") % 4 != 0).count() == 0
    # frame bytes reassemble into a prefix of the payload
    one = frames.where(F.col("frame_idx") == 0).select(
        "doc_id", F.length("frame_bytes").alias("len0")
    )
    assert one.where(F.col("len0") > 64).count() == 0


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_fixture_corpus_is_pure_ascii(sf_dir):
    """Pin the invariant the multimodal_features ORACLE leans on
    (ADVICE r4): the oracle reconstructs payload bytes per-character
    via ascii(substring(text, i, 1)) while the Spark side hashes the
    UTF-8 encoding — equivalent ONLY while every fixture character is
    single-byte ASCII. A future multi-byte fixture must fail HERE,
    at the named invariant, not as a confusing hash mismatch.
    """
    import duckdb

    n = duckdb.sql(
        f"""
        SELECT count(*) FROM '{sf_dir}/documents.parquet'
        WHERE octet_length(encode(text)) <> length(text)
        """
    ).fetchone()[0]
    assert n == 0, f"{n} non-ASCII document(s) in {sf_dir}"
