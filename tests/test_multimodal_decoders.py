"""Pure-Python unit tests for the real (codec-free) media decoders —
no SparkSession needed, so these run in milliseconds and pin the byte
layouts independently of the oracle comparison."""

from __future__ import annotations

import struct

from kafka_connect_sse_spark.operators.multimodal import (
    FRAME_STRIDE,
    decode_ppm,
    decode_wav,
    sample_y4m_frames,
)


def test_decode_ppm_known_image():
    # 2x1 image: pixels (1,2,3) and (10, 20, 30)
    payload = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 10, 20, 30])
    f = decode_ppm(payload)
    assert (f["width"], f["height"]) == (2, 1)
    assert (f["r_sum"], f["g_sum"], f["b_sum"]) == (11, 22, 33)
    # 2x2 nearest-neighbor thumbnail of a 2x1 image samples row 0 twice
    assert f["thumb_sum"] == 2 * (1 + 2 + 3 + 10 + 20 + 30)


def test_decode_wav_known_samples():
    samples = [100, -200, 300]
    data = struct.pack("<3h", *samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 16000, 2, 16,
        b"data", len(data),
    )
    f = decode_wav(hdr + data)
    assert f["n_samples"] == 3
    assert f["duration_us"] == 3 * 125
    assert f["amp_sum"] == 200
    assert f["sq_sum"] == 100**2 + 200**2 + 300**2
    assert f["peak"] == 300


def test_sample_y4m_keeps_strided_frames():
    w = h = 2
    plane = 3 * w * h
    frames = [bytes([fi] * plane) for fi in range(7)]
    payload = b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )
    out = sample_y4m_frames(payload)
    kept = [fi for fi, _, _ in out]
    assert kept == [fi for fi in range(7) if fi % FRAME_STRIDE == 0]
    for fi, luma_sum, frame_bytes in out:
        assert luma_sum == fi * w * h  # luma plane = first w*h bytes
        assert frame_bytes == plane
