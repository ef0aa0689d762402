"""Multimodal plumbing tests: binary payload contract, Arrow-batched
mapInPandas feature extraction, frame-sampling explode, codec stub."""

from __future__ import annotations

import pytest

from scalable_etl_spark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    extract_media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "héllo")], ["doc_id", "text"]
    )
    return attach_fake_media(df)


def test_payload_schema(media):
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_meta"].startswith("struct<media_type:string")


def test_extract_features_deterministic(media):
    rows = {r.doc_id: r for r in extract_media_features(media).collect()}
    b = "hello world".encode()
    assert rows[1].n_bytes == len(b)
    assert rows[1].header_hex == b[:4].hex()
    assert rows[1].byte_sum_mod == sum(b) % 997
    # Empty payload edge: zero bytes, empty header, zero checksum.
    assert (rows[2].n_bytes, rows[2].header_hex, rows[2].byte_sum_mod) == (0, "", 0)
    # Multi-byte utf-8 counts bytes, not characters.
    assert rows[3].n_bytes == len("héllo".encode()) == 6


def test_sample_frames_shape(media):
    out = sample_frames(media, every_ms=4)
    one = out.filter(out.doc_id == 1).collect()  # 11 bytes -> 3 frames
    assert [(r.frame_idx, r.frame_ms) for r in one] == [(0, 0), (1, 4), (2, 8)]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_grouped_zscore(spark):
    from scalable_etl_spark.operators.multimodal import grouped_zscore

    df = spark.createDataFrame(
        [
            (1, "en", 10.0),
            (2, "en", 20.0),
            (3, "en", 30.0),
            (4, "de", 7.0),
            (5, "de", 7.0),  # zero-variance group -> zscore 0.0
        ],
        ["doc_id", "lang", "n_chars"],
    )
    out = {r.doc_id: r.zscore for r in grouped_zscore(df, "lang", "n_chars").collect()}
    import math

    s = math.sqrt(200 / 3)  # population std of {10,20,30}
    assert out[1] == pytest.approx(round(-10 / s, 6))
    assert out[2] == 0.0
    assert out[3] == pytest.approx(round(10 / s, 6))
    assert out[4] == 0.0 and out[5] == 0.0
