"""Real pure-Python PNG/WAV codecs (VERDICT r2 item 3): the multimodal
kernels genuinely decode in-container; digest fakes remain only for
payloads that are neither PNG nor WAV."""

import random
import struct
import zlib

import pytest

from tachyon_spark.functions import codecs


def _random_pixels(w, h, ch, seed=7):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * ch))


def test_png_round_trip_rgb():
    w, h = 7, 5
    pix = _random_pixels(w, h, 3)
    data = codecs.png_encode(w, h, pix, 3)
    assert codecs.is_png(data)
    w1, h1, ch, out = codecs.png_decode(data)
    assert (w1, h1, ch) == (w, h, 3)
    assert out == pix


def test_png_round_trip_gray_and_rgba():
    for ch in (1, 4):
        w, h = 4, 3
        pix = _random_pixels(w, h, ch, seed=ch)
        w1, h1, ch1, out = codecs.png_decode(codecs.png_encode(w, h, pix, ch))
        assert (w1, h1, ch1, out) == (w, h, ch, pix)


def test_png_decode_all_filter_types():
    # Hand-built 3x5 grayscale PNG exercising filters 0..4; expected pixels
    # derived by applying the spec's reconstruction by hand.
    w, h, ch = 3, 5, 1
    rows_filtered = [
        (0, [10, 20, 30]),  # none -> 10 20 30
        (1, [5, 5, 5]),  # sub: 5, 10, 15
        (2, [1, 2, 3]),  # up: 6, 12, 18
        (3, [4, 4, 4]),  # avg: 4+(0+6)/2=7, 4+(7+12)/2=13, 4+(13+18)/2=19
        (4, [1, 1, 1]),  # paeth: a/b/c predictors
    ]
    expected = [
        [10, 20, 30],
        [5, 10, 15],
        [6, 12, 18],
        [7, 13, 19],
        # paeth row: prev=[7,13,19]; px0: p(0,7,0)=b 7 ->8; px1: a=8,b=13,c=7:
        # p=14 pa=6 pb=1 pc=7 -> b 13 ->14; px2: a=14,b=19,c=13: p=20 pa=6
        # pb=1 pc=7 -> b 19 ->20
        [8, 14, 20],
    ]
    raw = b"".join(bytes([f]) + bytes(row) for f, row in rows_filtered)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        codecs.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w1, h1, ch1, out = codecs.png_decode(data)
    assert (w1, h1, ch1) == (w, h, ch)
    assert list(out) == [v for row in expected for v in row]


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.png_decode(b"hello")


def test_resize_nearest_exact():
    # 2x2 RGB -> 4x4: each source pixel becomes a 2x2 block
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    out = codecs.resize_nearest(pix, 2, 2, 3, 4, 4)
    assert out[0:3] == bytes([255, 0, 0]) and out[3:6] == bytes([255, 0, 0])
    assert out[6:9] == bytes([0, 255, 0])
    assert out[-3:] == bytes([9, 9, 9])


def test_wav_round_trip():
    samples = [0, 1000, -1000, 32767, -32768, 5]
    data = codecs.wav_encode(16000, samples)
    assert codecs.is_wav(data)
    rate, ch, out = codecs.wav_decode(data)
    assert (rate, ch, out) == (16000, 1, samples)


def test_extract_features_real_png_and_wav(spark):
    from tachyon_spark.functions.multimodal import extract_features

    png = codecs.png_encode(2, 2, bytes([0, 0, 0, 255, 255, 255, 0, 0, 0, 255, 255, 255]), 3)
    wav = codecs.wav_encode(8000, [0, 16384, -16384, 0])
    other = b"just text"
    df = spark.createDataFrame(
        [("p", "image", png, None), ("w", "audio", wav, None), ("o", "image", other, None)],
        "content_id string, modality string, payload binary, meta string",
    )
    rows = {r.content_id: r for r in extract_features(df).collect()}
    # PNG: mean of each channel = 127.5/255, first 8-bin lum hist split 2/2
    feat_p = rows["p"].feature
    assert abs(feat_p[2] - 0.5) < 1e-6 and abs(feat_p[3] - 0.5) < 1e-6
    assert abs(feat_p[0] - 2 / 4096) < 1e-9  # width feature
    # WAV: peak = 16384/32768 = 0.5
    feat_w = rows["w"].feature
    assert abs(feat_w[4] - 0.5) < 1e-6
    # non-media payload keeps the digest-fake path (first byte of sha256)
    import hashlib

    d = hashlib.sha256(other).digest()
    assert abs(rows["o"].feature[0] - d[0] / 255.0) < 1e-9


def test_resize_images_real_png(spark):
    from tachyon_spark.functions.multimodal import resize_images

    pix = _random_pixels(6, 4, 3, seed=3)
    png = codecs.png_encode(6, 4, pix, 3)
    df = spark.createDataFrame(
        [("a", "image", png, None)],
        "content_id string, modality string, payload binary, meta string",
    )
    out = resize_images(df, 3, 2).collect()[0]
    w1, h1, ch, got = codecs.png_decode(bytes(out.payload))
    assert (w1, h1, ch) == (3, 2, 3)
    assert got == codecs.resize_nearest(pix, 6, 4, 3, 3, 2)


def test_apng_roundtrip():
    from tachyon_spark.functions import codecs

    frames = [bytes(range(f, f + 16)) for f in range(3)]
    data = codecs.apng_encode(4, 4, frames, 1, delay_ms=50)
    assert codecs.is_apng(data)
    assert codecs.is_png(data)  # APNG is a valid PNG stream
    w, h, ch, out = codecs.apng_decode(data)
    assert (w, h, ch) == (4, 4, 1)
    assert [d for d, _ in out] == [50, 50, 50]
    assert [p for _, p in out] == frames
    # a plain PNG is not an APNG, and apng_decode rejects it
    still = codecs.png_encode(4, 4, frames[0], 1)
    assert not codecs.is_apng(still)
    import pytest

    with pytest.raises(ValueError, match="acTL"):
        codecs.apng_decode(still)
    # png_decode on an APNG yields frame 0 (IDAT carries it)
    assert codecs.png_decode(data)[3] == frames[0]


def test_apng_rgb_and_unsupported_regions():
    import struct

    import pytest

    from tachyon_spark.functions import codecs

    rgb = [bytes(range(48)), bytes(range(48, 96))]
    data = codecs.apng_encode(4, 4, rgb, 3, delay_ms=100)
    w, h, ch, out = codecs.apng_decode(data)
    assert (w, h, ch) == (4, 4, 3) and [p for _, p in out] == rgb
    # corrupt an fcTL to a sub-frame region -> rejected, not mis-decoded
    idx = data.index(b"fcTL")
    body = bytearray(data[idx + 4 : idx + 30])
    struct.pack_into(">I", body, 4, 2)  # frame width 2 != image width 4
    bad = data[: idx + 4] + bytes(body) + data[idx + 30 :]
    with pytest.raises(ValueError, match="sub-frame"):
        codecs.apng_decode(bad)
