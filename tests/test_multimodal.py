import hashlib

from pyspark.sql import functions as F

from tachyon_spark.functions.multimodal import (
    FEATURES_SCHEMA,
    FRAMES_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [
        ("img1", "image", b"\x89PNGfake1", ("image/png", 64, 64, None, None)),
        ("img2", "image", b"\x89PNGfake2", ("image/png", 32, 32, None, None)),
        ("vid1", "video", b"RIFFfakevideo", ("video/mp4", 640, 480, 2500, None)),
        ("aud1", "audio", b"ID3fakeaudio", ("audio/mp3", None, None, 1000, 44100)),
        ("nul1", "image", None, ("image/png", 1, 1, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_rows(spark):
    media = _media(spark)
    feats = extract_features(media)
    assert feats.schema == FEATURES_SCHEMA
    rows = {r.content_id: r for r in feats.collect()}
    assert len(rows) == 5
    assert rows["img1"].n_bytes == len(b"\x89PNGfake1")
    assert rows["img1"].sha256 == hashlib.sha256(b"\x89PNGfake1").hexdigest()
    assert len(rows["img1"].feature) == 16
    assert all(0.0 <= x <= 1.0 for x in rows["img1"].feature)
    # determinism: same payload → same feature
    assert rows["nul1"].n_bytes == 0 and rows["nul1"].sha256 is None


def test_resize_images_filters_modality(spark):
    out = resize_images(_media(spark), 8, 8)
    rows = out.collect()
    assert {r.content_id for r in rows} == {"img1", "img2", "nul1"}
    assert all(len(r.payload) == 32 for r in rows)  # sha256 digest length


def test_sample_frames_explodes_video(spark):
    frames = sample_frames(_media(spark), every_ms=1000)
    assert frames.schema == FRAMES_SCHEMA
    rows = sorted(frames.collect(), key=lambda r: r.frame_idx)
    assert [r.content_id for r in rows] == ["vid1", "vid1"]  # 2500ms → 2 frames
    assert [r.frame_ts_ms for r in rows] == [0, 1000]
    assert rows[0].frame != rows[1].frame


def test_media_from_documents(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "web")], "doc_id long, text string, source string"
    )
    m = media_from_documents(docs)
    # nullability differs on derived frames; names+types are the contract
    assert m.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    row = m.head()
    assert bytes(row.payload) == b"hello world"
    assert row.meta.duration_ms == 110


def test_sample_frames_real_apng(spark):
    from pyspark.sql import functions as F

    from tachyon_spark.functions import codecs
    from tachyon_spark.functions.multimodal import sample_frames

    f0, f1, f2 = (bytes([v] * 16) for v in (10, 120, 240))
    apng = codecs.apng_encode(4, 4, [f0, f1, f2], 1, delay_ms=100)
    media = spark.createDataFrame(
        [("v1", "video", bytearray(apng), ("image/apng", 4, 4, 300, None)),
         ("v2", "video", bytearray(b"not a video"), (None, None, None, 2000, None))],
        "content_id string, modality string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,sample_rate:int>",
    )
    rows = {(r.content_id, r.frame_idx): r for r in sample_frames(media, 100).collect()}
    # APNG: real frames at the sampled instants, re-encoded as PNG
    for i, fx in enumerate((f0, f1, f2)):
        r = rows[("v1", i)]
        assert r.frame_ts_ms == i * 100
        assert codecs.png_decode(bytes(r.frame))[3] == fx
    # sampling finer than the frame rate repeats the active frame
    fine = [r for r in sample_frames(media, 50).collect() if r.content_id == "v1"]
    assert len(fine) == 6
    assert codecs.png_decode(bytes(sorted(fine, key=lambda r: r.frame_idx)[1].frame))[3] == f0
    # non-APNG payloads keep the digest-fake path (duration-driven count)
    fakes = [r for r in sample_frames(media, 100).collect() if r.content_id == "v2"]
    assert len(fakes) == 20 and len(bytes(fakes[0].frame)) == 32


def test_audio_spectral_pure_tone(spark):
    """A pure k-cycle sine over the 64-sample window concentrates power in
    bin k: dominant_bin == k and the centroid sits at k."""
    import math

    from tachyon_spark.functions import codecs
    from tachyon_spark.functions.multimodal import audio_spectral

    def tone(k, amp=8000):
        return [int(amp * math.sin(2 * math.pi * k * t / 64)) for t in range(64)]

    rows = [
        ("5", codecs.wav_encode(16000, tone(5))),
        ("12", codecs.wav_encode(8000, tone(12))),
        ("0", codecs.wav_encode(16000, [100] * 64)),  # constant: silent bins
    ]
    media = spark.createDataFrame(rows, "content_id string, payload binary")
    out = {r.content_id: r for r in audio_spectral(media).collect()}
    assert out["5"].dominant_bin == 5
    assert abs(out["5"].spectral_centroid - 5) < 0.1
    assert out["12"].dominant_bin == 12
    assert out["12"].sample_rate == 8000  # decode really read the header
    assert out["0"].dominant_bin == 0 and out["0"].spectral_centroid == 0.0


def test_image_phash_invariants(spark):
    """pHash is invariant to uniform brightness shifts (DCT AC band) and
    distinguishes structurally different images."""
    from tachyon_spark.functions import codecs
    from tachyon_spark.functions.multimodal import image_phash

    import random

    def img(seed, shift=0):
        rnd = random.Random(seed)
        vals = [rnd.randrange(50, 150) for _ in range(64)]
        raw = bytes(v + shift for v in vals for _ in range(3))
        return codecs.png_encode(8, 8, raw, 3)

    rows = [
        ("a", img(1)),
        ("a_bright", img(1, shift=40)),  # same structure, uniformly brighter
        ("b", img(2)),
    ]
    media = spark.createDataFrame(rows, "content_id string, payload binary")
    out = {r.content_id: r for r in image_phash(media).collect()}
    assert out["a"].width == 8 and out["a"].height == 8
    # a uniform brightness shift only moves DC, which the band excludes
    assert out["a"].phash == out["a_bright"].phash
    assert out["a_bright"].gray_mean == out["a"].gray_mean + 40.0
    # structurally different content hashes differently
    assert out["a"].phash != out["b"].phash
    assert 0 < out["a"].phash < (1 << 15)
