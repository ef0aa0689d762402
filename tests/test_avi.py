"""MJPEG-in-AVI container codec (operators/avi.py): real RIFF AVI
write + parse with per-frame baseline-JPEG decode, the video half of
the former MP3/video NotImplementedError boundary. The reference has
no media path (its ingest filters to .txt/.json, ingest_job.py:54);
this engine decodes video columns under the oracle gate."""

from __future__ import annotations

import numpy as np
import pytest

from scalable_etl_spark.operators.avi import (
    VIDEO_FPS,
    decode_mjpeg_avi,
    encode_mjpeg_avi,
    synthetic_mjpeg_avi,
    video_const_value,
    video_n_frames,
)


def _frames(vals, h=16, w=16):
    return [np.full((h, w), v, dtype=np.uint8) for v in vals]


def test_roundtrip_exact():
    """Constant-gray frames survive the lossy JPEG leg bit-exactly
    (the jpeg_const_value classes), and the container carries fps,
    frame count, and geometry faithfully."""
    frames = _frames([104, 128, 152])
    payload = encode_mjpeg_avi(frames, fps=10)
    got = decode_mjpeg_avi(payload)
    assert (got["fps"], got["n_frames"]) == (10, 3)
    assert (got["width"], got["height"]) == (16, 16)
    for i, f in enumerate(frames):
        assert np.array_equal(got["frames"][i], f), f"frame {i}"


def test_sampled_decode_subset():
    """frame_indices decodes ONLY the sampled frames; their pixels
    equal the full decode's."""
    payload = encode_mjpeg_avi(_frames([104, 106, 108, 110, 112]))
    full = decode_mjpeg_avi(payload)
    part = decode_mjpeg_avi(payload, frame_indices=(0, 2, 4))
    assert set(part["frames"]) == {0, 2, 4}
    assert part["n_frames"] == 5  # metadata still covers every chunk
    for i in (0, 2, 4):
        assert np.array_equal(part["frames"][i], full["frames"][i])
    # empty sample = pure metadata walk, zero JPEG decodes
    meta = decode_mjpeg_avi(payload, frame_indices=())
    assert meta["frames"] == {} and meta["n_frames"] == 5


def test_odd_sized_frame_chunks_pad():
    """RIFF chunks are even-padded; a JPEG payload of ODD length
    (gray 128 encodes to an odd byte count) must not desync the walk
    for the frames after it."""
    from scalable_etl_spark.operators.jpeg import encode_jpeg

    frames = _frames([104, 128, 152])
    assert len(encode_jpeg(frames[1])) % 2 == 1, "fixture lost oddness"
    payload = encode_mjpeg_avi(frames)
    got = decode_mjpeg_avi(payload)
    assert got["n_frames"] == 3
    for i, f in enumerate(frames):
        assert np.array_equal(got["frames"][i], f)


def test_container_validation():
    payload = encode_mjpeg_avi(_frames([104, 106]))
    with pytest.raises(ValueError, match="RIFF"):
        decode_mjpeg_avi(b"nope" + payload[4:])
    # truncation inside movi: loud, not silently fewer frames
    # (-40 would only drop the idx1; cut into the frame chunks)
    with pytest.raises(ValueError, match="truncated|declares"):
        decode_mjpeg_avi(payload[: len(payload) - 120])
    # frame count contradiction between avih and movi
    bad = bytearray(payload)
    i = bad.find(b"avih")
    # dwTotalFrames is the 5th DWORD of the avih body (i+8 skips
    # fourcc+size)
    bad[i + 8 + 16 : i + 8 + 20] = (9).to_bytes(4, "little")
    with pytest.raises(ValueError, match="declares 9 frames"):
        decode_mjpeg_avi(bytes(bad))
    # geometry contradiction: header says 8x8, frames are 16x16
    bad = bytearray(payload)
    i = bad.find(b"avih")
    bad[i + 8 + 32 : i + 8 + 36] = (8).to_bytes(4, "little")
    with pytest.raises(ValueError, match="contradicts"):
        decode_mjpeg_avi(bytes(bad))


def test_non_mjpg_handler_raises_not_implemented():
    """A compressed codec fourcc is a loud boundary, not wrong pixels
    (same contract as MP3 audio)."""
    payload = bytearray(encode_mjpeg_avi(_frames([104])))
    i = payload.find(b"strh") + 8 + 4  # fccHandler after fccType
    payload[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_mjpeg_avi(bytes(payload))


def test_synthetic_clip_closed_form():
    """synthetic_mjpeg_avi matches the oracle closed form the graded
    query evaluates: n_frames = 2 + id%3, frame luma = 256 *
    (104 + 2*((id+f)%25)), 16x16 @ 10 fps."""
    for doc_id in (0, 1, 2, 7, 74, 75, 76, 12345):
        got = decode_mjpeg_avi(synthetic_mjpeg_avi(doc_id))
        assert got["n_frames"] == video_n_frames(doc_id)
        assert (got["fps"], got["width"], got["height"]) == (
            VIDEO_FPS, 16, 16,
        )
        for f, img in got["frames"].items():
            want = video_const_value(doc_id, f)
            assert img.min() == img.max() == want, (doc_id, f)
    # class memoization: same payload object for ids 75 apart
    assert synthetic_mjpeg_avi(3) is synthetic_mjpeg_avi(78)


def test_video_frame_stats_spark(spark):
    """The mapInPandas sampling stage: one row per SAMPLED frame
    (0, 2, ...), exact luma sums, no shuffle before the aggregate."""
    from scalable_etl_spark.operators.multimodal import (
        attach_synthetic_avi,
        decode_video_frame_stats,
    )

    df = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = decode_video_frame_stats(
        attach_synthetic_avi(df), every=2
    ).collect()
    want = []
    for d in range(12):
        n = video_n_frames(d)
        for f in range(0, n, 2):
            want.append((d, f, n, 256 * video_const_value(d, f)))
    got = sorted((r.doc_id, r.frame_idx, r.n_frames, r.luma_sum)
                 for r in rows)
    assert got == sorted(want)
    assert all(r.width == 16 and r.height == 16 and r.fps == 10
               for r in rows)
