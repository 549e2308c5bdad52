"""Multimodal binary operators: real BMP/PPM/RAWV kernels (numpy-only),
stub behavior for compressed codecs, Arrow-batch plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from voluptuous_spark.multimodal import (
    _fake_image_decode,
    decode_bmp24,
    decode_image,
    decode_ppm,
    decode_rawv_frame,
    decode_rawv_header,
    encode_bmp24,
    encode_rawv,
    image_features,
    image_resize,
    resize_nearest,
    video_frame_sample,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# pure codec round-trips (no Spark)


def test_bmp_roundtrip():
    for h, w in [(7, 5), (16, 16), (3, 9)]:  # odd widths hit row padding
        a = _img(h, w, seed=h * w)
        assert np.array_equal(decode_bmp24(encode_bmp24(a)), a)


def test_bmp_rejects_corruption():
    a = encode_bmp24(_img(8, 8))
    with pytest.raises(ValueError):
        decode_bmp24(a[:30])
    with pytest.raises(ValueError):
        decode_bmp24(b"XX" + a[2:])


def test_ppm_decode():
    a = _img(4, 6, seed=3)
    buf = b"P6\n6 4\n255\n" + a.tobytes()
    assert np.array_equal(decode_ppm(buf), a)
    assert np.array_equal(decode_image(buf), a)


def test_decode_image_dispatch_rejects_compressed():
    # JPEG: no stdlib decoder exists
    with pytest.raises(ValueError, match="unsupported image codec"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg payload")
    # PNG magic prefix but corrupt signature/stream: loud per-payload error
    with pytest.raises(ValueError, match="bad PNG magic"):
        decode_image(b"\x89PNG fake payload")


def test_png_roundtrip():
    from voluptuous_spark.multimodal import decode_png, encode_png

    for h, w in [(7, 5), (16, 16), (3, 9)]:
        a = _img(h, w, seed=h * w + 1)
        buf = encode_png(a)
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(decode_png(buf), a)
        assert np.array_equal(decode_image(buf), a)


def test_png_filters_and_rgba():
    import struct
    import zlib

    from voluptuous_spark.multimodal import decode_png

    # hand-build a PNG exercising Sub/Up/Average/Paeth filters + RGBA
    h, w, bpp = 4, 3, 4
    a = _img(h, w, seed=9)
    rgba = np.dstack([a, np.full((h, w), 255, np.uint8)]).astype(np.int32)

    def filt(y, ft):
        line = rgba[y].reshape(-1)
        prev = rgba[y - 1].reshape(-1) if y else np.zeros(w * bpp, np.int32)
        out = np.zeros(w * bpp, np.int32)
        for x in range(w * bpp):
            aa = line[x - bpp] if x >= bpp else 0
            bb = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                out[x] = line[x] - aa
            elif ft == 2:
                out[x] = line[x] - bb
            elif ft == 3:
                out[x] = line[x] - ((aa + bb) >> 1)
            else:  # Paeth
                p = aa + bb - cc
                pa, pb, pc = abs(p - aa), abs(p - bb), abs(p - cc)
                pred = aa if (pa <= pb and pa <= pc) else (
                    bb if pb <= pc else cc)
                out[x] = line[x] - pred
        return bytes([ft]) + (out & 0xFF).astype(np.uint8).tobytes()

    raw = b"".join(filt(y, ft) for y, ft in zip(range(h), (1, 2, 3, 4)))

    def chunk(tag, payload):
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", crc)

    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(buf), a)  # alpha dropped


def test_resize_nearest():
    a = _img(8, 8, seed=1)
    r = resize_nearest(a, (4, 4))
    assert r.shape == (4, 4, 3)
    assert np.array_equal(r[0, 0], a[0, 0])  # corner preserved
    up = resize_nearest(a, (16, 16))
    assert up.shape == (16, 16, 3)


def test_rawv_roundtrip():
    frames = np.stack([_img(6, 4, seed=i) for i in range(5)])
    buf = encode_rawv(frames, fps=2)
    assert decode_rawv_header(buf) == (6, 4, 2, 5)
    for i in range(5):
        assert np.array_equal(decode_rawv_frame(buf, i), frames[i])
    with pytest.raises(ValueError):
        decode_rawv_frame(buf, 5)
    with pytest.raises(ValueError):
        decode_rawv_header(buf[:10])


# ---------------------------------------------------------------------------
# Spark operators


@pytest.fixture()
def media_df(spark):
    bmp = encode_bmp24(_img(12, 10, seed=7))
    ppm = b"P6\n6 4\n255\n" + _img(4, 6, seed=3).tobytes()
    rows = [
        ("m1", bmp, 2000),
        ("m2", ppm, 3500),
        ("m3", b"\x89PNG fake payload", 1500),  # compressed: stubbed
        ("m4", b"x", None),  # truncated payload
    ]
    return spark.createDataFrame(
        rows, "id string, bytes binary, dur_ms int"
    )


def test_image_features_real_kernels(media_df):
    out = {r["id"]: r for r in image_features(media_df).collect()}
    assert out["m1"]["err"] is None
    assert (out["m1"]["height"], out["m1"]["width"]) == (12, 10)
    assert (out["m2"]["height"], out["m2"]["width"]) == (4, 6)
    # compressed codec -> per-row error, not a job failure
    assert out["m3"]["err"] is not None and out["m3"]["height"] is None
    assert out["m4"]["err"] is not None


def test_image_features_custom_decode(media_df):
    # plumbing accepts any decode callable (PIL on a real cluster)
    out = {
        r["id"]: r
        for r in image_features(
            media_df, decode=_fake_image_decode
        ).collect()
    }
    assert out["m3"]["err"] is None  # fake codec decodes anything >=4B


def test_image_resize_real(media_df, spark):
    out = {
        r["id"]: r for r in image_resize(media_df, (5, 5)).collect()
    }
    assert (out["m1"]["h"], out["m1"]["w"]) == (5, 5)
    resized = decode_bmp24(out["m1"]["resized"])
    assert resized.shape == (5, 5, 3)
    assert out["m3"]["err"] is not None and out["m3"]["resized"] is None


def test_video_frame_sample_real_frames(spark):
    frames = np.stack([_img(6, 4, seed=i) for i in range(8)])
    rawv = encode_rawv(frames, fps=2)  # 8 frames @2fps = 4000ms
    df = spark.createDataFrame(
        [("v1", rawv, 3500), ("v2", b"\x00mp4 fake", 2500)],
        "id string, bytes binary, dur_ms int",
    )
    out = video_frame_sample(df, every_ms=1000)
    v1 = out.filter(F.col("id") == "v1").orderBy("ts_ms").collect()
    assert [r["ts_ms"] for r in v1] == [0, 1000, 2000, 3000]
    assert [r["frame_idx"] for r in v1] == [0, 2, 4, 6]  # ts*fps/1000
    got = decode_bmp24(v1[1]["frame"])
    assert np.array_equal(got, frames[2])  # real pixels round-trip
    # unknown codec: metadata fan-out with err set, frame NULL
    v2 = out.filter(F.col("id") == "v2").orderBy("ts_ms").collect()
    assert [r["ts_ms"] for r in v2] == [0, 1000, 2000]
    assert all(r["frame"] is None and r["err"] for r in v2)
    assert "bytes" not in out.columns
