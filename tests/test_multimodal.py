"""Real multimodal decode tests — byte-level fixtures built by hand so
every assertion is byte-for-byte against independently-computed values
(no codec library on either side). Covers VERDICT r1 item 5: one real
format per modality (BMP/PPM pixels, WAV samples) behind the same
mapInPandas stages the stubs used.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from andb_spark.operators.multimodal import (
    decode_audio,
    decode_audio_samples,
    decode_image,
    decode_image_pixels,
    encode_ppm,
    resize_payloads,
    resize_pixels,
)


def make_bmp(px: np.ndarray) -> bytes:
    """Serialize (h, w, 3) RGB as bottom-up 24-bit BI_RGB BMP with the
    spec's 4-byte row padding — independent of the decoder under test."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in px[::-1]:  # bottom-up
        line = bytearray()
        for r, g, b in row.astype(int):
            line += bytes((b, g, r))  # BGR storage
        line += b"\x00" * (stride - len(line))
        raster += line
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + dib + bytes(raster)


def make_wav(samples: np.ndarray, rate: int, channels: int) -> bytes:
    """PCM16 RIFF/WAVE serializer, independent of the decoder."""
    data = (samples * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


PX = np.array(
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
     [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
    dtype=np.uint8,
)  # 2 rows x 3 cols


def test_bmp_header_and_pixel_decode_byte_for_byte():
    payload = make_bmp(PX)
    assert decode_image(payload) == ("bmp", 3, 2)
    out = decode_image_pixels(payload)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, PX)


def test_ppm_p6_round_trip_and_p3():
    p6 = encode_ppm(PX)
    assert decode_image(p6) == ("ppm", 3, 2)
    assert np.array_equal(decode_image_pixels(p6), PX)
    # P3 ascii with a comment line in the header
    body = " ".join(str(v) for v in PX.flatten())
    p3 = ("P3\n# comment\n3 2\n255\n" + body).encode()
    assert decode_image(p3) == ("ppm", 3, 2)
    assert np.array_equal(decode_image_pixels(p3), PX)


def test_png_gif_jpeg_header_metadata():
    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 640, 480, 8, 2, 0, 0, 0
    )
    assert decode_image(png) == ("png", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    assert decode_image(gif) == ("gif", 320, 200)
    # JPEG: SOI, APP0 (skipped via length), SOF0 with dims
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 768, 1024)
        + b"\x03\x00\x00\x00"
    )
    assert decode_image(jpeg) == ("jpeg", 1024, 768)
    with pytest.raises(NotImplementedError):
        decode_image(b"not an image")


def test_resize_pixels_nearest_neighbor():
    big = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(8, 4, 3)
    out = resize_pixels(big, 4)
    assert out.shape == (4, 2, 3)
    # nearest-neighbor gather: rows 0,2,4,6 and cols 0,2
    assert np.array_equal(out, big[::2][:, ::2])
    same = resize_pixels(big, 100)  # no upscale
    assert same is big


def test_wav_metadata_and_sample_decode():
    t = np.arange(480) / 48.0
    samples = np.stack([np.sin(t), np.cos(t)], axis=1).astype(np.float32) * 0.5
    payload = make_wav(samples, 48000, 2)
    assert decode_audio(payload) == ("wav", 48000, 2, 10)  # 480/48000 s
    out, rate = decode_audio_samples(payload)
    assert rate == 48000 and out.shape == (480, 2)
    # byte-exact vs the independent int16 quantization
    expect = (samples * 32768.0).clip(-32768, 32767).astype("<i2") / 32768.0
    assert np.array_equal(out, expect.astype(np.float32))
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 16)


def test_distributed_real_resize_stage(spark):
    """resize_payloads runs the real decode→resize→encode per payload
    inside mapInPandas; verify output payloads decode byte-for-byte to
    the independently-resized pixels."""
    big = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    rows = [(1, bytearray(make_bmp(big))), (2, bytearray(encode_ppm(PX)))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in resize_payloads(df, max_side=4).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 4)
    assert np.array_equal(
        decode_image_pixels(bytes(out[1]["payload"])), big[::2][:, ::2]
    )
    # already small: pass-through geometry, re-encoded as ppm
    assert (out[2]["width"], out[2]["height"]) == (3, 2)
    assert np.array_equal(decode_image_pixels(bytes(out[2]["payload"])), PX)


def test_resize_degenerate_strip_and_jpeg_fill_bytes():
    """Review-findings regressions: 1xN strips must not divide by zero,
    and JPEG 0xFF fill bytes / standalone RST markers must not derail
    the SOF scan."""
    strip = np.arange(1 * 1000 * 3, dtype=np.uint8).reshape(1, 1000, 3)
    out = resize_pixels(strip, 4)
    assert out.shape == (1, 4, 3)
    # fill bytes before APP0 and a standalone RST marker before SOF0
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill bytes
        + b"\xe0" + struct.pack(">H", 4) + b"\x00\x00"
        + b"\xff\xd0"  # standalone RST0, no length
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 10, 20) + b"\x03\x00\x00\x00"
    )
    assert decode_image(jpeg) == ("jpeg", 20, 10)


def test_wav_malformed_payloads_raise_cleanly():
    import pytest as _pytest

    bad = b"RIFF" + struct.pack("<I", 4) + b"WAVE"  # no fmt/data
    with _pytest.raises(ValueError, match="fmt/data"):
        decode_audio(bad)
    with _pytest.raises(ValueError, match="fmt/data"):
        decode_audio_samples(bad)
    # declared zero sample rate
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with _pytest.raises(ValueError, match="sample rate"):
        decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_encode_bmp_decode_roundtrip():
    from andb_spark.operators.multimodal import encode_bmp

    rng = np.random.default_rng(7)
    # width chosen so rows need padding (5*3=15 → stride 16)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert decode_image(data) == ("bmp", 5, 4)
    np.testing.assert_array_equal(decode_image_pixels(data), px)


def test_encode_wav_decode_roundtrip():
    from andb_spark.operators.multimodal import encode_wav

    samples = np.array([[0.0, 0.5], [-0.25, 1.0], [0.125, -1.0]])
    data = encode_wav(samples, 16000)
    codec, rate, channels, duration_ms = decode_audio(data)
    assert (codec, rate, channels) == ("wav", 16000, 2)
    out, rate2 = decode_audio_samples(data)
    assert rate2 == 16000 and out.shape == (3, 2)
    # half-up quantization: floor(x*32767 + 0.5) / 32768
    expect = np.floor(samples * 32767 + 0.5) / 32768.0
    np.testing.assert_allclose(out, expect.astype(np.float32))


def test_synth_corpora_closed_forms(spark):
    """The closed forms the oracle states must hold through the REAL
    encode→decode round trip for a probe of ids."""
    from andb_spark.operators.multimodal import (
        audio_sample_stats,
        image_pixel_stats,
        synthesize_audio_corpus,
        synthesize_image_corpus,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 1, 63, 64, 199, 457)],
                                "doc_id bigint")
    img = {
        r["doc_id"]: r
        for r in image_pixel_stats(synthesize_image_corpus(ids)).collect()
    }
    for d in (0, 1, 63, 64, 199, 457):
        w, h, base = 4 + d % 13, 3 + d % 11, d % 200
        assert (img[d]["width"], img[d]["height"]) == (w, h)
        assert img[d]["sum_px"] == 3 * (
            h * w * base + w * (h * (h - 1) // 2) + h * (w * (w - 1) // 2)
        )
    aud = {
        r["doc_id"]: r
        for r in audio_sample_stats(synthesize_audio_corpus(ids)).collect()
    }
    for d in (0, 1, 63, 64, 199, 457):
        assert aud[d]["sample_rate"] == (8000, 16000, 22050, 44100)[d % 4]
        assert aud[d]["channels"] == 1 + d % 2
        assert aud[d]["n_frames"] == 100 + d % 50
        assert aud[d]["first_amp_q"] == int((d % 64) / 64.0 * 32767 + 0.5)


def test_wav_frame_count_is_exact_not_reconstructed():
    """100 frames @ 44100 Hz: duration_ms*rate//1000 would report 88;
    the frame count must come straight from the data chunk."""
    import numpy as np

    from andb_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        wav_frame_count,
    )

    wav = encode_wav(np.zeros((100, 1), np.float64), 44100)
    assert wav_frame_count(wav) == 100
    _, rate, _, duration_ms = decode_audio(wav)
    assert duration_ms * rate // 1000 == 88  # the bug this guards


def test_encode_wav_clips_out_of_range_samples():
    import numpy as np

    from andb_spark.operators.multimodal import (
        decode_audio_samples,
        encode_wav,
    )

    wav = encode_wav(np.array([[1.5], [-1.5], [0.5]], np.float64), 8000)
    samples, _ = decode_audio_samples(wav)
    raw = np.floor(samples * 32768.0 + 0.5).astype(int).ravel()
    # saturated, not wrapped: 1.5 -> 32767, -1.5 -> -32768
    assert raw[0] == 32767 and raw[1] == -32768


def test_embed_image_pixels_moments_brute_force(spark):
    """The REAL feature extractor's integer moments must equal a
    brute-force numpy recomputation over an independently-serialized
    BMP (make_bmp, not the engine's encoder)."""
    from andb_spark.operators.multimodal import (
        embed_image_pixels,
        pixel_embedding_expr,
    )

    payload = make_bmp(PX)
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "doc_id bigint, payload binary")
    row = embed_image_pixels(df).collect()[0]
    px = PX.astype(np.int64)
    h, w = px.shape[:2]
    assert row["sum_px"] == px.sum()
    assert row["sumsq_px"] == (px * px).sum()
    assert row["row_mom"] == sum(
        r * px[r].sum() for r in range(h)
    )
    assert row["col_mom"] == sum(
        c * px[:, c].sum() for c in range(w)
    )
    assert (row["min_px"], row["max_px"]) == (px.min(), px.max())
    assert row["center_px"] == px[(h - 1) // 2, (w - 1) // 2, 0]
    # The Catalyst-side bridge: moments → array<double> embedding the
    # ANN operators consume, no second Python pass.
    emb = (
        embed_image_pixels(df)
        .select(pixel_embedding_expr().alias("embedding"))
        .collect()[0]["embedding"]
    )
    assert len(emb) == 8 and all(isinstance(x, float) for x in emb)
    assert emb[3] == px.min() / 255.0 and emb[4] == px.max() / 255.0


def test_encode_png_decode_roundtrip():
    """PNG is the REAL compressed-codec path (stdlib zlib DEFLATE +
    numpy unfiltering — README 'Multimodal codec boundary'): an
    encode→decode round trip must be pixel-exact, and the metadata
    header parse must agree with the raster."""
    import numpy as np

    from andb_spark.operators.multimodal import (
        decode_image,
        decode_image_pixels,
        encode_png,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    data = encode_png(px)
    fmt, w, h = decode_image(data)
    assert (fmt, w, h) == ("png", 53, 37)
    assert np.array_equal(decode_image_pixels(data), px)


def test_png_all_filter_types_decode():
    """Hand-filter scanlines with every PNG filter type (0 None, 1 Sub,
    2 Up, 3 Average, 4 Paeth — spec §6) and check the decoder's
    unfilter reconstructs the original raster. The engine's own
    encoder only emits filter 0, so this is the only coverage of the
    left/up-recursive reconstruction real-world PNGs use."""
    import struct
    import zlib

    import numpy as np

    from andb_spark.operators.multimodal import decode_png_pixels

    rng = np.random.default_rng(7)
    h, w, nch = 10, 9, 3
    px = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
    flat = px.reshape(h, w * nch).astype(np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = []
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        ftype = y % 5
        row = flat[y]
        filt = np.zeros(w * nch, np.int32)
        for x in range(w * nch):
            a = row[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                    4: paeth(int(a), int(b), int(c))}[ftype]
            filt[x] = (row[x] - pred) % 256
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png_pixels(data), px)


def test_png_color_types_and_policy_boundaries():
    """Gray (0) and gray+alpha (4) replicate to RGB, RGBA (6) drops
    alpha; interlaced and 16-bit payloads raise the declared-policy
    NotImplementedError (README 'Multimodal codec boundary')."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from andb_spark.operators.multimodal import decode_png_pixels

    def mk(w, h, depth, ctype, interlace, raster):
        def chunk(typ, body):
            return (struct.pack(">I", len(body)) + typ + body
                    + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(
                ">IIBBBBB", w, h, depth, ctype, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(raster))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (4, 5, 1), dtype=np.uint8)
    raster = b"".join(b"\x00" + g[y].tobytes() for y in range(4))
    out = decode_png_pixels(mk(5, 4, 8, 0, 0, raster))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))

    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    raster = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    out = decode_png_pixels(mk(4, 3, 8, 6, 0, raster))
    assert np.array_equal(out, rgba[:, :, :3])

    with _pytest.raises(NotImplementedError, match="codec policy"):
        decode_png_pixels(mk(5, 4, 8, 0, 1, raster))
    with _pytest.raises(NotImplementedError, match="codec policy"):
        decode_png_pixels(mk(5, 4, 16, 0, 0, raster))
