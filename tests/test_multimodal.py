"""Multimodal decode: pure-stdlib BMP/WAV codecs (r6) and the Arrow
mapInPandas plumbing around them.

The encoders exist to PLANT deterministic test media; the decoders are the
real operators. Tests cover the spec corners an oracle hash would surface
only cryptically: BMP row padding, top-down (negative-height) BMPs, 32bpp,
PPM comments, stereo WAV — plus the loud NotImplementedError contract for
compressed formats (PIL/ffmpeg absent from this container)."""

from __future__ import annotations

import struct

import pytest

from realtime_market_data_pipeline_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_bmp_roundtrip_padding_matters():
    # width 5 → row 15 bytes → 1 pad byte per row; padding must be
    # excluded from pixel_sum
    b = mm.make_bmp(7, 5, 3)
    d = mm.decode_image(b)
    assert (d["width"], d["height"], d["bpp"]) == (5, 3, 24)
    assert d["pixel_sum"] == 3 * 5 * sum((7 + y) % 256 for y in range(3))
    # corrupt a PAD byte: decoded sum must not change
    stride = 16
    off = 14 + 40 + stride - 1  # last byte of first stored row = pad
    b2 = b[:off] + b"\xff" + b[off + 1 :]
    assert mm.decode_image(b2)["pixel_sum"] == d["pixel_sum"]
    # corrupt a PIXEL byte: decoded sum must change
    off = 14 + 40
    b3 = b[:off] + bytes([(b[off] + 1) % 256]) + b[off + 1 :]
    assert mm.decode_image(b3)["pixel_sum"] == d["pixel_sum"] + (
        (b[off] + 1) % 256 - b[off]
    )


def test_bmp_top_down_and_32bpp():
    # top-down: negative height in the info header, no row reversal
    w, h = 3, 2
    row = bytes([10]) * (w * 3) + b"\x00" * ((-w * 3) % 4)
    px = row * h
    fh = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(px), 0, 0, 0, 0)
    d = mm.decode_image(fh + ih + px)
    assert (d["width"], d["height"], d["pixel_sum"]) == (w, h, 10 * w * 3 * h)
    # 32bpp: 4 channels, rows naturally 4-aligned (no padding)
    px32 = bytes([1, 2, 3, 4]) * (w * h)
    ih32 = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(px32), 0, 0, 0, 0
    )
    d32 = mm.decode_image(fh + ih32 + px32)
    assert (d32["bpp"], d32["pixel_sum"]) == (32, 10 * w * h)


def test_ppm_with_comment():
    ppm = b"P6\n# a comment\n3 2 255\n" + bytes(range(18))
    d = mm.decode_image(ppm)
    assert (d["width"], d["height"], d["pixel_sum"]) == (3, 2, sum(range(18)))


def test_wav_roundtrip_and_stereo():
    b = mm.make_wav(5, 12, 9000)
    d = mm.decode_audio(b)
    samples = [((5 * 31 + i * 17) % 65536) - 32768 for i in range(12)]
    assert d == {
        "format": "wav",
        "sample_rate": 9000,
        "n_channels": 1,
        "n_samples": 12,
        "sample_sum": sum(samples),
        "sample_peak": max(abs(s) for s in samples),
    }
    # stereo: 2 interleaved channels — n_samples counts FRAMES, the
    # sum/peak fold over every interleaved sample
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 100, -200, 300, -400))
    d2 = mm.decode_audio(buf.getvalue())
    assert (d2["n_channels"], d2["n_samples"]) == (2, 2)
    assert (d2["sample_sum"], d2["sample_peak"]) == (-200, 400)


def test_compressed_formats_still_raise():
    # JPEG still needs PIL/opencv; PNG decodes as of r7 (decode_png), but
    # garbage after a PNG signature must fail LOUDLY, not mis-decode
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(ValueError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    # indexed-color (palette) PNG raises NotImplementedError, not garbage
    import zlib as _zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    pal_png = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", _zlib.compress(b"\x00\x00"))
        + mm._png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color_type=3"):
        mm.decode_image(pal_png)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x04" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        mm.decode_video_frames(b"\x00" * 32, 2)
    # compressed BMP (BI_RLE8) raises, not mis-decodes
    fh = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 1, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="compressed BMP"):
        mm.decode_image(fh + ih)


def test_plant_and_decode_media_distributed(spark):
    """End-to-end through Spark: plant real payloads over the sf0.001
    documents spine, decode via mapInPandas, spot-check against the local
    codec — and pin the shuffle-free plan (decode must never exchange
    payload bytes)."""
    from realtime_market_data_pipeline_spark.io import load_table

    docs = load_table(spark, SF, "documents")
    decoded = mm.decode_media(mm.plant_media(docs))
    plan = decoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "media decode plan must be shuffle-free"
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == docs.count()
    for did in (0, 1, 42, 43):
        r = rows[did]
        if did % 2 == 0:
            d = mm.decode_image(
                mm.make_bmp(did, (did % 13) + 4, (did % 11) + 4)
            )
            assert (r["width"], r["height"], r["pixel_sum"]) == (
                d["width"],
                d["height"],
                d["pixel_sum"],
            )
            assert r["sample_rate"] is None
        else:
            d = mm.decode_audio(
                mm.make_wav(did, (did % 23) + 8, 8000 + (did % 5) * 1000)
            )
            assert (
                r["sample_rate"],
                r["n_samples"],
                r["sample_sum"],
                r["sample_peak"],
            ) == (
                d["sample_rate"],
                d["n_samples"],
                d["sample_sum"],
                d["sample_peak"],
            )
            assert r["width"] is None
