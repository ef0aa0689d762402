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


def test_sample_frame_bytes_reassembles(media):
    from scalable_etl_spark.operators.multimodal import sample_frame_bytes

    out = sample_frame_bytes(media, n_frames=4).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.frame_idx)):
        by_doc.setdefault(r.doc_id, b"")
        by_doc[r.doc_id] += bytes(r.frame_bytes)
    # Frames are a partition of the payload: concatenation round-trips.
    assert by_doc[1] == b"hello world"
    assert by_doc[2] == b""
    assert by_doc[3] == "héllo".encode()
    assert all(len([r for r in out if r.doc_id == d]) == 4 for d in by_doc)


def test_resize_media_fixed_size(media):
    from scalable_etl_spark.operators.multimodal import resize_media

    rows = {r.doc_id: bytes(r.resized) for r in resize_media(media, 2, 3).collect()}
    b = b"hello world"
    assert rows[1] == bytes(b[len(b) * j // 6] for j in range(6))
    assert len(rows[1]) == 6 and len(rows[3]) == 6
    assert rows[2] == b""  # empty payload stays empty
