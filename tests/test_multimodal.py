"""Multimodal column plumbing: binary columns + metadata, mapInPandas batch
contract, stubbed decode kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_platform_spark.functions.multimodal import (
    attach_media_metadata,
    audio_features,
    decode_image_features,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes([10, 20, 30] * 100)),
        (2, bytes([200] * 5000)),
        (3, b""),
        (4, bytes(range(256))),
    ]
    return spark.createDataFrame(rows, ["media_id", "content"])


def test_attach_media_metadata(media):
    out = attach_media_metadata(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 300
    assert rows[3]["n_bytes"] == 0
    assert rows[1]["content_fingerprint"] >= 0
    # identical content -> identical fingerprint; distinct -> distinct
    assert rows[1]["content_fingerprint"] != rows[2]["content_fingerprint"]


def test_decode_image_features_batch_contract(media):
    out = decode_image_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,width:int,height:int,mean_brightness:double>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[3]["width"] == 0  # empty blob
    assert 64 <= rows[1]["width"] < 256
    # deterministic fake: same input -> same output
    rows2 = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert rows == rows2


def test_audio_features(media):
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert rows[2]["duration_sec"] == pytest.approx(5000 / 32000)
    assert rows[3]["duration_sec"] == 0.0
    assert 0.0 <= rows[1]["energy"] <= 1.0


def test_resize_stub_raises_cleanly(media):
    """The stub kernel must fail with NotImplementedError at execution (not
    at plan time), proving the plumbing is a real executable plan."""
    plan = resize_images(media, 224, 224, kernel="stub")
    assert "content" in plan.columns  # plan builds fine
    with pytest.raises(Exception, match="NotImplementedError|Pillow"):
        plan.collect()


def test_resize_real_nulls_undecodable(media):
    """Default (real) resize kernel degrades row-wise on non-PPM/BMP bytes
    instead of failing the batch."""
    rows = resize_images(media, 32, 32).collect()
    assert len(rows) > 0
    assert all(r["content"] is None for r in rows)


def test_blob_dropped_before_shuffle(media):
    """Feature extraction output carries no binary column — safe to shuffle."""
    out = decode_image_features(media)
    assert "content" not in out.columns
    agg = out.groupBy().agg(F.avg("mean_brightness")).collect()
    assert agg[0][0] is not None


def test_video_frame_sampling_fake_kernel(spark):
    """Fake frame kernel: one blob → N frame rows at the declared cadence;
    frame count tracks blob size at the nominal bitrate."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_platform_spark.functions.multimodal import sample_video_frames

    rows = [(1, b"x" * 1024), (2, b"y" * 100), (3, b"")]
    df = spark.createDataFrame(rows, ["media_id", "content"])
    frames = sample_video_frames(df, every_n_seconds=1.0, kernel="fake").collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 4          # 1024 bytes / 256 Bps = 4 s -> 4 frames
    assert len(by_id[2]) == 1          # sub-second clip still yields 1 frame
    assert len(by_id[3]) == 1
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(r["content"] is not None for r in by_id[1])


# ---------------------------------------------------------------------------
# REAL kernels: pure-numpy PPM/BMP/WAV codecs (functions/codecs.py)
# ---------------------------------------------------------------------------


def test_codec_roundtrips():
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (codecs.decode_ppm(codecs.encode_ppm(img)) == img).all()
    assert (codecs.decode_bmp24(codecs.encode_bmp24(img)) == img).all()
    # PPM header comments per the netpbm spec
    with_comment = b"P6\n# a comment\n5 7\n255\n" + img.tobytes()
    assert (codecs.decode_ppm(with_comment) == img).all()

    stereo = rng.randint(-32768, 32767, (400, 2)).astype("<i2")
    dec, rate = codecs.decode_wav_pcm16(codecs.encode_wav_pcm16(stereo, 8000))
    assert rate == 8000 and (dec == stereo).all()


def test_real_image_features_exact(spark):
    """Real PPM/BMP decode through Spark: exact expected width/height/mean."""
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs
    from ecommerce_analytics_platform_spark.functions.multimodal import (
        decode_image_features,
    )

    # 2x2 image with known pixels: mean = (0+60+120+255)*3ch.../12
    img = np.array(
        [[[0, 0, 0], [60, 60, 60]], [[120, 120, 120], [255, 255, 255]]], dtype=np.uint8
    )
    expected_mean = round((0 + 60 + 120 + 255) * 3 / 12 / 255.0, 6)
    rows = [
        (1, bytearray(codecs.encode_ppm(img))),
        (2, bytearray(codecs.encode_bmp24(img))),
        (3, bytearray(b"\xff\xd8garbage-jpeg")),  # undecodable → nulls
        (4, bytearray(codecs.encode_png(img))),  # real compressed-format path
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in
           decode_image_features(df, kernel="real").collect()}
    for mid in (1, 2, 4):
        assert got[mid]["width"] == 2 and got[mid]["height"] == 2
        assert got[mid]["mean_brightness"] == expected_mean
    assert got[3]["width"] is None and got[3]["mean_brightness"] is None


def test_real_resize_roundtrip(spark):
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs
    from ecommerce_analytics_platform_spark.functions.multimodal import resize_images

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (8, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_bmp24(img)))], "media_id long, content binary"
    )
    out = resize_images(df, 3, 4, kernel="real").collect()[0]
    assert (out["width"], out["height"]) == (3, 4)
    resized = codecs.decode_ppm(bytes(out["content"]))
    assert (resized == codecs.resize_nearest(img, 3, 4)).all()


def test_real_wav_features_exact(spark):
    """Constant-amplitude PCM16 → exact RMS and duration."""
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs
    from ecommerce_analytics_platform_spark.functions.multimodal import audio_features

    const = np.full(16000, 16384, dtype="<i2")  # 1 s at 16 kHz, amp 0.5
    wav = codecs.encode_wav_pcm16(const, 16000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not-audio"))], "media_id long, content binary"
    )
    got = {r["media_id"]: r for r in audio_features(df, kernel="real").collect()}
    assert got[1]["duration_sec"] == 1.0
    assert got[1]["energy"] == 0.5
    assert got[2]["duration_sec"] is None


def test_png_roundtrip_all_color_types():
    """Round-trip through the pure-numpy PNG codec (zlib DEFLATE is the
    stdlib's) for gray / gray+alpha / RGB / RGBA."""
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        out = codecs.decode_png(codecs.encode_png(img))
        assert out.shape == (13, 9, c)
        assert (out == img).all(), f"channels={c}"
    gray2d = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(gray2d))[:, :, 0] == gray2d).all()
    assert codecs.sniff_format(codecs.encode_png(gray2d)) == "png"
    assert (codecs.decode_image(codecs.encode_png(gray2d))[:, :, 0] == gray2d).all()


def test_png_unfilter_all_filter_types():
    """Independence check for the decoder's unfilter: FORWARD-filter known
    scanlines per the RFC 2083 definitions in the test itself (Sub, Up,
    Average, Paeth), build the PNG by hand, and assert the decoder
    recovers the original pixels."""
    import struct
    import zlib

    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs

    rng = np.random.default_rng(11)
    h, w, c = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    flat = img.reshape(h, w * c).astype(np.int32)
    bpp, stride = c, w * c

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    filters = [0, 1, 2, 3, 4]
    raw = bytearray()
    for y, ftype in enumerate(filters):
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        line = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = line[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1, 4: paeth(left, up, ul)}[ftype]
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw += enc.astype(np.uint8).tobytes()

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (codecs.decode_png(png) == img).all()


def test_png_rejects_unsupported_cleanly():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from ecommerce_analytics_platform_spark.functions import codecs

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = codecs.encode_png(img)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    interlaced = (
        good[:8]
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + good[8 + 25 :]
    )
    with _pytest.raises(ValueError, match="interlaced"):
        codecs.decode_png(interlaced)
    with _pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"JUNK" * 4)
    # corrupt CRC must be detected, not silently decoded
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # IEND CRC byte
    with _pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(bad))


def test_gif_roundtrip_animation():
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs

    rng = np.random.default_rng(5)
    # ≤256 colors across all frames: small value alphabet
    frames = (rng.integers(0, 5, size=(4, 9, 6, 3), dtype=np.uint8) * 50)
    gif = codecs.encode_gif(frames, delay_cs=20)
    dec, delays = codecs.decode_gif(gif)
    assert dec.shape == frames.shape
    assert (dec == frames).all()
    assert delays == [0.2] * 4
    assert codecs.sniff_format(gif) == "gif"


def test_gif_subrect_transparency_disposal():
    """Hand-built 2-frame GIF exercising paths the encoder never emits:
    a sub-rect second frame at (1,1), a transparent index (underlying
    canvas must show through), and disposal=2 (restore background) after
    frame 1 — built byte-by-byte from the GIF89a spec."""
    import struct

    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs
    from ecommerce_analytics_platform_spark.functions.codecs import _lzw_encode_fixed

    # global palette: 0=black(bg), 1=red, 2=green, 3=blue
    pal = b"\x00\x00\x00" + b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"
    hdr = b"GIF89a" + struct.pack("<HHBBB", 3, 3, 0x80 | 0x01, 0, 0) + pal

    def frame(left, top, w, h, indices, gce=None):
        out = b""
        if gce is not None:
            out += b"\x21\xf9\x04" + gce + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0) + b"\x02"
        stream = _lzw_encode_fixed(np.array(indices, dtype=np.uint8), 2)
        out += bytes([len(stream)]) + stream + b"\x00"
        return out

    # frame 1: full 3x3 all red, disposal=2 (restore bg after), delay 10cs
    f1 = frame(0, 0, 3, 3, [1] * 9, gce=bytes([0x08]) + struct.pack("<H", 10) + b"\x00")
    # frame 2: 2x2 at (1,1): [green, transparent(0); blue, green]
    f2 = frame(
        1, 1, 2, 2, [2, 0, 3, 2],
        gce=bytes([0x01]) + struct.pack("<H", 5) + b"\x00",
    )
    gif = hdr + f1 + f2 + b"\x3b"
    dec, delays = codecs.decode_gif(gif)
    assert dec.shape == (2, 3, 3, 3)
    assert (dec[0] == [255, 0, 0]).all()  # frame 1 all red
    # frame 2: bg restored (black) everywhere except the sub-rect;
    # transparent cell shows the restored background
    exp = np.zeros((3, 3, 3), dtype=np.uint8)
    exp[1, 1] = [0, 255, 0]
    exp[1, 2] = [0, 0, 0]      # transparent -> background (black)
    exp[2, 1] = [0, 0, 255]
    exp[2, 2] = [0, 255, 0]
    assert (dec[1] == exp).all()
    assert delays == [0.1, 0.05]


def test_gif_interlaced_frame():
    """Interlaced flag: rows arrive in 8/8-4/4-2/1-2 pass order; the
    decoder must undo the permutation."""
    import struct

    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs
    from ecommerce_analytics_platform_spark.functions.codecs import _lzw_encode_fixed

    h, w = 9, 2
    img_rows = np.arange(h, dtype=np.uint8) % 4  # row y has index y%4
    pass_order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    interlaced = np.repeat(img_rows[pass_order], w)  # rows in pass order
    pal = b"\x00\x00\x00\x55\x55\x55\xaa\xaa\xaa\xff\xff\xff"
    gif = (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x01, 0, 0) + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40) + b"\x02"
    )
    stream = _lzw_encode_fixed(interlaced, 2)
    gif += bytes([len(stream)]) + stream + b"\x00" + b"\x3b"
    dec, _ = codecs.decode_gif(gif)
    expected = (img_rows * 0x55)[:, None, None].repeat(w, axis=1).repeat(3, axis=2)
    assert (dec[0] == expected).all()


def test_real_video_frame_sampling_gif(spark):
    """Spark-side real kernel: animated GIF in, sampled frames out as PPM
    bytes that decode back to the exact source frames."""
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs
    from ecommerce_analytics_platform_spark.functions.multimodal import (
        sample_video_frames,
    )

    frames = np.zeros((5, 4, 4, 3), dtype=np.uint8)
    for i in range(5):
        frames[i] = (i * 40) % 256
    gif = codecs.encode_gif(frames, delay_cs=25)  # 0.25s per frame
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"not-a-gif"))],
        "media_id long, content binary",
    )
    got = sample_video_frames(df, every_n_seconds=0.5, kernel="real").collect()
    by_idx = {r["frame_idx"]: r for r in got}
    # frames at t=0.0, 0.5, 1.0 → indices 0, 2, 4; undecodable row 2 → nothing
    assert sorted(by_idx) == [0, 2, 4]
    assert all(r["media_id"] == 1 for r in got)
    assert by_idx[2]["frame_ts_sec"] == 0.5
    dec = codecs.decode_ppm(bytes(by_idx[4]["content"]))
    assert (dec == frames[4]).all()


def test_png_palette_decode():
    """Hand-built color-type-3 PNG: PLTE lookup, tRNS alpha expansion."""
    import struct
    import zlib

    import numpy as np

    from ecommerce_analytics_platform_spark.functions import codecs

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    # 2x2 indices [[0,1],[2,1]]; palette red/green/blue; index 0 transparent
    raw = b"\x00\x00\x01" + b"\x00\x02\x01"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", b"\xff\x00\x00\x00\xff\x00\x00\x00\xff")
        + chunk(b"tRNS", b"\x00")
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = codecs.decode_png(png)
    assert out.shape == (2, 2, 4)
    assert (out[0, 0] == [255, 0, 0, 0]).all()      # transparent red
    assert (out[0, 1] == [0, 255, 0, 255]).all()
    assert (out[1, 0] == [0, 0, 255, 255]).all()
    # without tRNS: plain RGB
    png_rgb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", b"\xff\x00\x00\x00\xff\x00\x00\x00\xff")
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert codecs.decode_png(png_rgb).shape == (2, 2, 3)


# ---------------------------------------------------------------------------
# Baseline JPEG (functions/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_dct_pair_exact():
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import jpeg

    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(jpeg.idct2(jpeg.dct2(b)), b, atol=1e-9)
    # Parseval: orthonormal transform preserves energy
    assert np.isclose((jpeg.dct2(b) ** 2).sum(), (b**2).sum())


def test_jpeg_roundtrip_tolerances():
    """JPEG is lossy — assert quantization-bounded errors per content
    class: constant blocks near-exact, smooth gradients ≤2, 4:2:0 on
    smooth chroma ≤8, noise bounded by the q90 quantization step."""
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import jpeg

    const = np.full((16, 24, 3), [200, 30, 90], dtype=np.uint8)
    assert np.abs(
        jpeg.decode_jpeg(jpeg.encode_jpeg(const, quality=90)).astype(int) - const
    ).max() <= 1

    gy, gx = np.meshgrid(np.linspace(0, 255, 32), np.linspace(0, 255, 40), indexing="ij")
    smooth = np.stack([gx, gy, (gx + gy) / 2], axis=-1).astype(np.uint8)
    assert np.abs(
        jpeg.decode_jpeg(jpeg.encode_jpeg(smooth, quality=95)).astype(int) - smooth
    ).max() <= 3
    assert np.abs(
        jpeg.decode_jpeg(jpeg.encode_jpeg(smooth, quality=95, subsample=True)).astype(int)
        - smooth
    ).max() <= 10

    rng = np.random.default_rng(2)
    noise = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    assert np.abs(
        jpeg.decode_jpeg(jpeg.encode_jpeg(noise, quality=90)).astype(int) - noise
    ).max() <= 60

    gray = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quality=92))
    assert dec.shape == (12, 12, 1)
    assert np.abs(dec[:, :, 0].astype(int) - gray).max() <= 40


def test_jpeg_restart_markers_do_not_change_pixels():
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    a = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    b = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, restart_interval=3))
    assert (a == b).all()


def test_jpeg_rejects_progressive_and_garbage():
    import pytest as _pytest

    from ecommerce_analytics_platform_spark.functions import jpeg

    import numpy as np
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = bytearray(jpeg.encode_jpeg(img))
    sof = good.index(b"\xff\xc0")
    good[sof + 1] = 0xC2  # pretend progressive
    with _pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode_jpeg(bytes(good))
    with _pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"nope")


def test_jpeg_through_spark_real_kernel(spark):
    """decode_image_features routes JPEG by magic; brightness within the
    lossy tolerance of the source mean."""
    import numpy as np

    from ecommerce_analytics_platform_spark.functions import jpeg
    from ecommerce_analytics_platform_spark.functions.multimodal import (
        decode_image_features,
    )

    img = np.full((16, 16, 3), 120, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(jpeg.encode_jpeg(img, quality=90)))],
        "media_id long, content binary",
    )
    row = decode_image_features(df, kernel="real").collect()[0]
    assert (row["width"], row["height"]) == (16, 16)
    assert abs(row["mean_brightness"] - 120 / 255.0) < 0.01
