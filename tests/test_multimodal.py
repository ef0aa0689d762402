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
    # lossy WebP now decodes natively (operators/vp8.py); a corrupt
    # VP8 chunk must still fail loudly with a codec error, not an
    # arbitrary IndexError from deep in the bitstream machinery
    with pytest.raises(ValueError, match="VP8"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 8)
    # genuinely environment-blocked: unknown magic (e.g. video)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x00\x00\x18ftypmp42 not an image")


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


# ---------------------------------------------- real netpbm decoding


def test_decode_p6_roundtrip():
    import numpy as np
    from scalable_etl_spark.operators.multimodal import (
        decode_image, synthetic_ppm, SYN_W, SYN_H,
    )

    img = decode_image(synthetic_ppm(42))
    assert img.shape == (SYN_H, SYN_W, 3)
    expect = np.array(
        [(42 * 7 + j * 13) % 256 for j in range(48)], dtype=np.uint8
    ).reshape(SYN_H, SYN_W, 3)
    assert (img == expect).all()


def test_decode_p5_grayscale_and_comments():
    from scalable_etl_spark.operators.multimodal import decode_image

    payload = b"P5\n# a comment\n# another\n 3  2 \n255\n" + bytes(range(6))
    img = decode_image(payload)
    assert img.shape == (2, 3)
    assert list(img.flat) == [0, 1, 2, 3, 4, 5]


def test_decode_rejects_unknown_magic_and_truncation():
    import pytest
    from scalable_etl_spark.operators.multimodal import decode_image

    # JPEG magic now dispatches to the native decoder; a malformed
    # stream (no SOF/SOS) must fail loudly, not decode garbage
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4\n255\n\x00\x01")  # pixel data cut short


def test_decode_rejects_crlf_after_maxval():
    import pytest
    from scalable_etl_spark.operators.multimodal import decode_image

    # CRLF between maxval and pixel data would shift the pixel offset
    # by one byte; the decoder must fail loudly, not decode garbage.
    payload = b"P5\n3 2\n255\r\n" + bytes(range(6))
    with pytest.raises(ValueError, match="CRLF"):
        decode_image(payload)


def test_decode_audio_rejects_malformed_wav():
    import pytest
    from scalable_etl_spark.operators.multimodal import (
        decode_audio,
        synthetic_wav,
    )

    wav = synthetic_wav(7)
    # fmt chunk declaring 0 channels -> explicit error, not a numpy
    # reshape crash.
    zero_ch = wav.replace(
        (1).to_bytes(2, "little") + (8000).to_bytes(4, "little"),
        (0).to_bytes(2, "little") + (8000).to_bytes(4, "little"),
        1,
    )
    with pytest.raises(ValueError, match="0 channels"):
        decode_audio(zero_ch)
    # data chunk declared longer than the payload -> truncation error,
    # not a silently short sample count.
    with pytest.raises(ValueError, match="truncated"):
        decode_audio(wav[:-10])


def test_media_pixel_stats_decodes_for_real(spark):
    from scalable_etl_spark.queries_llm import media_pixel_stats

    rows = media_pixel_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    fmts = {r.fmt for r in rows}
    assert fmts == {"ppm", "png", "jpeg", "webp"}, (
        "all four native codecs must be exercised"
    )
    dims = {
        "ppm": (4, 4, 3),
        "png": (4, 5, 3),
        "jpeg": (16, 16, 1),
        "webp": (4, 6, 3),
    }
    for r in rows:
        assert (r.width, r.height, r.n_channels) == dims[r.fmt]
        assert 0 <= r.avg_pixel <= 255


def test_media_pixel_stats_lossy_decodes_for_real(spark):
    from scalable_etl_spark.operators.vp8_fixtures import (
        PAYLOADS,
        YUV_SUMS,
    )
    from scalable_etl_spark.queries_llm import media_pixel_stats_lossy

    rows = media_pixel_stats_lossy(spark, "/root/testdata/sf0.001").collect()
    assert rows
    # the per-source sums are combinations of the pinned fixture sums
    n = len(PAYLOADS)
    assert n == len(YUV_SUMS) == 8
    total = sum(r.sum_yuv for r in rows)
    docs = sum(r.n_images for r in rows)
    assert docs > 0 and total > 0


def test_native_decoder_seam_in_spark(spark):
    """Task: pluggable native-codec swap-in. decode_image_stats with
    decoder=webp_native.native_webp_decoder() must produce EXACTLY the
    rows of the pure-python default over lossless WebP payloads (both
    decoders are exact there). Skipped where libwebp is absent — the
    pure-python path is the hermetic default either way."""
    import pytest
    from scalable_etl_spark.operators import webp_native
    from scalable_etl_spark.operators.multimodal import (
        attach_synthetic_webp,
        decode_image_stats,
    )

    if not webp_native.available():
        pytest.skip("libwebp not loadable")
    d = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = attach_synthetic_webp(d)
    pure = {
        r.doc_id: (r.width, r.height, r.n_channels, r.pixel_sum)
        for r in decode_image_stats(media).collect()
    }
    native = {
        r.doc_id: (r.width, r.height, r.n_channels, r.pixel_sum)
        for r in decode_image_stats(
            media, decoder=webp_native.native_webp_decoder()
        ).collect()
    }
    assert pure == native and len(pure) == 12


def test_decode_wav_roundtrip_and_chunk_walk():
    import numpy as np
    import pytest
    from scalable_etl_spark.operators.multimodal import (
        decode_audio, synthetic_wav,
    )

    sr, s = decode_audio(synthetic_wav(7))
    assert sr == 8000 and s.shape == (64, 1)
    expect = (7 * 31 + np.arange(64) * 17) % 65536 - 32768
    assert (s[:, 0] == expect).all()

    # Extra chunk before fmt/data must be skipped (word-aligned walk).
    wav = synthetic_wav(7)
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFO\x00" + b"\x00"
    patched = wav[:12] + extra + wav[12:]
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    sr2, s2 = decode_audio(patched)
    assert sr2 == 8000 and (s2 == s).all()

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04 mp3 bytes here")


def test_audio_energy_stats_decodes_for_real(spark):
    from scalable_etl_spark.queries_llm import audio_energy_stats

    rows = audio_energy_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert (r.sample_rate, r.n_samples) == (8000, 64)
        assert r.total_energy > 0


def test_decode_png_every_filter_and_shape():
    """encode_png assigns filter y%5, so a 5+-row image exercises
    None/Sub/Up/Average/Paeth; roundtrip must be bit-exact for every
    channel count, and the synthetic contract must match its closed
    form."""
    import numpy as np

    from scalable_etl_spark.operators.multimodal import (
        decode_png,
        encode_png,
        synthetic_png,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for h, w in ((1, 1), (5, 3), (9, 17)):
            a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            a = a[:, :, 0] if ch == 1 else a
            out = decode_png(encode_png(a))
            assert out.shape == a.shape and (out == a).all()
    img = decode_image(synthetic_png(123))
    want = np.array(
        [(123 * 11 + j * 19) % 256 for j in range(60)], dtype=np.uint8
    ).reshape((5, 4, 3))
    assert (img == want).all()


def test_decode_png_rejects_unsupported():
    """Palette, 16-bit, interlace, truncation: loud errors, not wrong
    pixels."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from scalable_etl_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    def png_with_ihdr(w, h, depth, ctype, interlace=0):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        idat = zlib.compress(b"\x00" * ((w + 1) * h))
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(png_with_ihdr(2, 2, 16, 0))
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png(png_with_ihdr(2, 2, 8, 3))
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(png_with_ihdr(2, 2, 8, 0, interlace=1))
    good = encode_png(np.zeros((3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(good[:-8])  # truncated: IEND gone
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a\x00" + good[8:])


def test_decode_png_ignores_suggested_palette():
    """A PLTE chunk on a TRUECOLOR PNG is a legal suggested palette
    (mandatory only for color type 3) and must not block decoding."""
    import numpy as np

    from scalable_etl_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    good = encode_png(a)
    # splice a suggested palette between IHDR and IDAT
    idat_at = good.index(b"IDAT") - 4
    plte = _png_chunk(b"PLTE", bytes(range(12)))
    patched = good[:idat_at] + plte + good[idat_at:]
    out = decode_png(patched)
    assert (out == a).all()


# ---------------------------------------------------------------------------
# Fused encode+decode operators: the single-Python-stage spellings must
# produce row-identical statistics to the per-leg attach_*/decode_*
# composition they optimize away (payloads never cross the JVM in the
# fused form, so equality here is the proof the fusion changed the
# execution shape, not the values).


def test_fused_image_stats_equals_legacy(spark):
    from pyspark.sql import functions as F

    from scalable_etl_spark.operators.multimodal import (
        attach_synthetic_jpeg,
        attach_synthetic_png,
        attach_synthetic_ppm,
        attach_synthetic_webp,
        decode_image_stats,
        fused_image_stats,
    )

    d = spark.createDataFrame(
        [(i, f"src{i % 2}") for i in range(6)], ["doc_id", "source"]
    )
    legacy = (
        decode_image_stats(attach_synthetic_ppm(d))
        .withColumn("fmt", F.lit("ppm"))
        .unionByName(
            decode_image_stats(attach_synthetic_png(d)).withColumn(
                "fmt", F.lit("png")
            )
        )
        .unionByName(
            decode_image_stats(attach_synthetic_jpeg(d)).withColumn(
                "fmt", F.lit("jpeg")
            )
        )
        .unionByName(
            decode_image_stats(attach_synthetic_webp(d)).withColumn(
                "fmt", F.lit("webp")
            )
        )
        .join(d, "doc_id")
    )
    fused = fused_image_stats(d)
    cols = ["doc_id", "source", "fmt", "width", "height",
            "n_channels", "pixel_sum"]
    got = sorted(map(tuple, fused.select(*cols).collect()))
    want = sorted(map(tuple, legacy.select(*cols).collect()))
    assert got == want


def test_fused_yuv_stats_equals_legacy(spark):
    from scalable_etl_spark.operators.multimodal import (
        attach_lossy_webp,
        decode_yuv_stats,
        fused_yuv_stats,
    )

    d = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(10)], ["doc_id", "source"]
    )
    legacy = decode_yuv_stats(attach_lossy_webp(d)).join(d, "doc_id")
    fused = fused_yuv_stats(d)
    cols = ["doc_id", "source", "width", "height", "yuv_sum"]
    got = sorted(map(tuple, fused.select(*cols).collect()))
    want = sorted(map(tuple, legacy.select(*cols).collect()))
    assert got == want


def test_fused_video_frame_stats_equals_legacy(spark):
    from scalable_etl_spark.operators.multimodal import (
        attach_synthetic_avi,
        decode_video_frame_stats,
        fused_video_frame_stats,
    )

    d = spark.createDataFrame(
        [(i, f"src{i % 2}") for i in range(4)], ["doc_id", "source"]
    )
    legacy = decode_video_frame_stats(
        attach_synthetic_avi(d), every=2
    ).join(d, "doc_id")
    fused = fused_video_frame_stats(d, every=2)
    cols = ["doc_id", "source", "fps", "n_frames", "width", "height",
            "frame_idx", "luma_sum"]
    got = sorted(map(tuple, fused.select(*cols).collect()))
    want = sorted(map(tuple, legacy.select(*cols).collect()))
    assert got == want
