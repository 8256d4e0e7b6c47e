"""Multimodal plumbing: schemas, Arrow batch shapes, flat-map frame
sampling, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M
from spark_delta_lakehouse_nyctaxi_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media_table(spark, n=48).persist()


def test_media_table_schema(media):
    assert media.schema == M.MEDIA_SCHEMA
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_shape_and_determinism(media):
    feats = M.extract_features(media)
    assert feats.schema == M.FEATURES_SCHEMA
    n = media.count()
    assert feats.count() == n * M.FEATURE_DIM
    # deterministic: same input → same values across runs
    a = {(r.media_id, r.feature): r.value for r in feats.collect()}
    b = {(r.media_id, r.feature): r.value for r in M.extract_features(media).collect()}
    assert a == b


def test_resize_only_images_fixed_payload_size(media):
    out = M.resize_images(media, 32, 32).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(len(bytes(r.payload)) == 32 * 32 for r in out)
    assert all((r.width, r.height) == (32, 32) for r in out)


def test_frame_sampling_flatmap(media):
    frames = M.sample_frames(media, every_s=2.0)
    per_media = frames.groupBy("media_id").count().collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(per_media) == n_videos
    assert all(r["count"] >= 1 for r in per_media)


def test_real_codecs_gated(media):
    # real=True now DECODES WAV/BMP payloads for real (see
    # test_wav/bmp_codec_* below); the synthetic corpus here carries
    # sha256 junk, so the per-payload dispatch raises at EXECUTION for
    # unsupported formats — and resize/frames stay eagerly gated
    # (compressed formats need PIL/ffmpeg).
    with pytest.raises(Exception, match="PIL|ffmpeg"):
        M.extract_features(media, real=True).collect()
    # real resize works for BMP payloads; the sha256-junk corpus fails
    # at decode time (see test_real_bmp_resize_nearest_neighbor for
    # the working path)
    with pytest.raises(Exception, match="BMP"):
        M.resize_images(media, 8, 8, real=True).collect()
    with pytest.raises(Exception, match="AVI"):
        M.sample_frames(media, real=True).collect()


def test_asof_join_semantics(spark):
    from pyspark.sql import Row

    left = spark.createDataFrame(
        [Row(k="a", lts=10, lid=1), Row(k="a", lts=20, lid=2), Row(k="b", lts=5, lid=3)]
    )
    right = spark.createDataFrame(
        [Row(k="a", rts=10, v="x"), Row(k="a", rts=15, v="y"), Row(k="b", rts=9, v="z")]
    )
    out = asof_join(left, right, by=["k"], left_ts="lts", right_ts="rts", right_value_cols=["v"])
    got = {r.lid: (r.v, r.rts_right) for r in out.collect()}
    # lid=1: ties at equal ts match (inclusive); lid=2: latest prior;
    # lid=3: no prior right row → nulls
    assert got == {1: ("x", 10), 2: ("y", 15), 3: (None, None)}


def test_wav_codec_round_trip_and_validation():
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    s = (np.arange(777) * 13 % 4001) - 2000
    assert (M.decode_wav(M.encode_wav(s)) == s).all()
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"nope" * 10)
    # stereo/8-bit fmt refused
    bad = bytearray(M.encode_wav(s))
    bad[22] = 2  # channels = 2
    with pytest.raises(ValueError, match="PCM16 mono"):
        M.decode_wav(bytes(bad))


def test_bmp_codec_round_trip_incl_row_padding():
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    # width 33 → 99-byte rows padded to 100: the padding/bottom-up flip
    # is exactly what a naive reader breaks on
    px = (np.arange(33 * 7).reshape(7, 33) * 5 % 256).astype("uint8")
    assert (M.decode_bmp(M.encode_bmp(px)) == px).all()
    with pytest.raises(ValueError, match="BMP"):
        M.decode_bmp(b"XX" + b"\x00" * 60)
    # unrecognized magic still raises honestly (only compressed video
    # remains gated now that JPEG decodes for real)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        M.decode_real(b"\x00\x01\x02\x03....")


def test_real_bmp_resize_nearest_neighbor(spark):
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    px = (np.arange(32 * 32).reshape(32, 32) % 256).astype("uint8")
    rows = [
        (
            1,
            "image",
            bytearray(M.encode_bmp(px)),
            {"width": 32, "height": 32, "sample_rate": None,
             "duration_s": None, "format": "bmp"},
        )
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.resize_images(media, 8, 8, real=True).collect()
    assert len(out) == 1 and out[0].width == 8 and out[0].height == 8
    got = M.decode_bmp(bytes(out[0].payload))
    # nearest-neighbor: output pixel (r, c) = source (r*32//8, c*32//8)
    want = px[np.ix_((np.arange(8) * 32) // 8, (np.arange(8) * 32) // 8)]
    assert (got == want).all()


def test_png_codec_round_trip_all_filters_and_validation():
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    # 11 rows with filter_cycle → every filter type (0-4) exercised ≥ 2×
    px = (np.arange(33 * 11).reshape(11, 33) * 7 % 256).astype("uint8")
    assert (M.decode_png(M.encode_png(px)) == px).all()
    # CRC corruption detected
    bad = bytearray(M.encode_png(px))
    bad[40] ^= 0xFF  # inside IDAT
    with pytest.raises(Exception, match="CRC|error"):
        M.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="PNG"):
        M.decode_png(b"\x89PNX" + b"\x00" * 40)


def test_png_truecolor_round_trip(spark):
    """r5: truecolor (color type 2) PNG — lossless bit-exact round
    trip through all five cycling filters with bpp-offset unfiltering,
    plus honest refusal of unsupported color types."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (11, 33, 3)).astype(np.uint8)
    enc = M.encode_png(px)
    dec = M.decode_png(enc)
    assert dec.shape == (11, 33, 3) and (dec == px).all()
    assert (M.decode_png(M.encode_png(px, filter_cycle=False)) == px).all()
    # gradient content (filter-friendly) also exact, and compresses
    r, c = np.divmod(np.arange(16 * 24), 24)
    grad = np.stack([(r * 3) % 256, (c * 5) % 256, (r + c) % 256], -1)
    grad = grad.astype(np.uint8).reshape(16, 24, 3)
    assert (M.decode_png(M.encode_png(grad)) == grad).all()
    # decode_real dispatch ravels color pixels
    assert M.decode_real(enc).shape == (11 * 33 * 3,)
    # RGBA input refused at encode; palette color type refused at decode
    with pytest.raises(ValueError, match="RGB"):
        M.encode_png(np.zeros((4, 4, 4), dtype=np.uint8))
    import struct as S
    import zlib as Z
    ihdr = S.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)  # palette type 3
    chunk = lambda t, d: S.pack(">I", len(d)) + t + d + S.pack(
        ">I", Z.crc32(t + d) & 0xFFFFFFFF
    )
    fake = M._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", Z.compress(b"\x00" * 20))
    with pytest.raises(ValueError, match="truecolor"):
        M.decode_png(fake)


def test_avi_codec_round_trip_and_real_sampling(spark):
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    fr = (np.arange(6 * 7 * 33).reshape(6, 7, 33) * 3 % 256).astype("uint8")
    out, fps = M.decode_avi(M.encode_avi(fr, fps=4))
    assert fps == 4 and (out == fr).all()
    with pytest.raises(ValueError, match="AVI"):
        M.decode_avi(b"RIFFxxxxWAVE")
    # real sampling honors the container's own frame rate
    rows = [
        (
            7,
            "video",
            bytearray(M.encode_avi(fr, fps=4)),
            {"width": 33, "height": 7, "sample_rate": None,
             "duration_s": 1.5, "format": "avi"},
        )
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in M.sample_frames(media, every_s=0.5, real=True).collect()
    )
    # every_s * fps = 2 → original frame ids 0, 2, 4
    assert [i for i, _ in got] == [0, 2, 4]
    assert got[1][1] == fr[2].tobytes()


def test_jpeg_codec_round_trip_bounds_and_validation():
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    # flat image: DC-only blocks reconstruct bit-exactly at quant=1
    for v in (0, 127, 255):
        px = np.full((24, 40), v, dtype=np.uint8)
        assert (M.decode_jpeg(M.encode_jpeg(px)) == v).all()
    # textured (non-multiple-of-8 dims → edge-replicate padding + unpad)
    px = (np.arange(29 * 37).reshape(29, 37) * 7 % 256).astype("uint8")
    dec = M.decode_jpeg(M.encode_jpeg(px))
    assert dec.shape == (29, 37)
    assert np.abs(dec - px).max() <= 1.5  # quant=1 envelope (measured 1.0)
    # coarser quantization: error scales with the step, stream shrinks
    dec8 = M.decode_jpeg(M.encode_jpeg(px, quant=8))
    assert np.abs(dec8 - px).max() <= 8.0
    assert len(M.encode_jpeg(px, quant=8)) < len(M.encode_jpeg(px))
    # validation: magic, progressive SOF, color, restart intervals
    with pytest.raises(ValueError, match="SOI"):
        M.decode_jpeg(b"\x89PNG" + b"\x00" * 40)
    with pytest.raises(ValueError, match="baseline"):
        M.decode_jpeg(b"\xff\xd8\xff\xc2\x00\x04\x00\x00")
    enc = bytearray(M.encode_jpeg(px))
    sof = enc.find(b"\xff\xc0")
    bad = bytearray(enc)
    bad[sof + 9] = 3  # claims 3 components but carries specs for 1
    with pytest.raises(ValueError, match="truncated SOF"):
        M.decode_jpeg(bytes(bad))
    # dispatch: FFD8 magic reaches the JPEG decoder
    assert M.decode_real(bytes(enc)).shape == (29 * 37,)


def test_jpeg_fill_bytes_and_standalone_markers():
    """ADVICE r4: spec-compliant streams may pad 0xFF fill bytes before
    any marker (B.1.1.2) and carry standalone length-less markers (TEM
    0x01); the walk must skip both instead of misparsing a bogus
    2-byte length."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    px = (np.arange(16 * 16).reshape(16, 16) % 256).astype(np.uint8)
    enc = M.encode_jpeg(px)
    ref = M.decode_jpeg(enc)
    # inject a 0xFF fill run + a TEM standalone marker after SOI
    padded = enc[:2] + b"\xff\xff\xff" + b"\xff\x01" + enc[2:]
    assert (M.decode_jpeg(padded) == ref).all()
    # fill bytes immediately before an interior marker (DQT)
    dqt = enc.index(b"\xff\xdb")
    padded2 = enc[:dqt] + b"\xff\xff" + enc[dqt:]
    assert (M.decode_jpeg(padded2) == ref).all()


def test_jpeg_stuffing_and_dc_chain():
    """A mid-gray image whose DC coefficients produce 0xFF bytes in the
    entropy stream exercises byte stuffing; 16+ blocks exercise the DC
    difference chain across block rows."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    enc = M.encode_jpeg(px)
    assert b"\xff\x00" in enc  # stuffing actually happened
    assert np.abs(M.decode_jpeg(enc) - px).max() <= 1.5


def test_mjpeg_avi_round_trip_and_gating(spark):
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    # flat frames exact, textured bounded, DIB path untouched
    flat = np.stack(
        [np.full((16, 24), (i * 31 + 9) % 251, dtype=np.uint8) for i in range(5)]
    )
    out, fps = M.decode_avi(M.encode_avi(flat, fps=4, codec="MJPG"))
    assert fps == 4 and (out == flat).all()
    rng = np.random.default_rng(3)
    tex = rng.integers(0, 256, (4, 16, 24)).astype(np.uint8)
    out2, _ = M.decode_avi(M.encode_avi(tex, fps=2, codec="MJPG"))
    assert np.abs(out2 - tex).max() <= 1.5
    # inter-frame codecs still refuse with a guided message
    bad = bytearray(M.encode_avi(tex, codec="MJPG"))
    i = bad.find(b"MJPG")
    bad[i : i + 4] = b"H264"
    with pytest.raises(ValueError, match="ffmpeg"):
        M.decode_avi(bytes(bad))
    with pytest.raises(ValueError, match="codec"):
        M.encode_avi(tex, codec="H264")
    # real frame sampling over an MJPG container honors its frame rate
    rows = [
        (
            3,
            "video",
            bytearray(M.encode_avi(flat, fps=4, codec="MJPG")),
            {"width": 24, "height": 16, "sample_rate": None,
             "duration_s": 1.25, "format": "mjpeg-avi"},
        )
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = sorted(
        (r.frame_idx, bytes(r.frame))
        for r in M.sample_frames(media, every_s=0.5, real=True).collect()
    )
    assert [i for i, _ in got] == [0, 2, 4]
    assert got[1][1] == flat[2].tobytes()


def test_jpeg_color_round_trip_and_validation():
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    rng = np.random.default_rng(11)
    # flat colors (DC-only planes) reconstruct exactly — including the
    # YCbCr→RGB inverse
    for rgb in ((0, 0, 0), (255, 255, 255), (200, 30, 90), (7, 255, 128)):
        c = np.zeros((16, 24, 3), dtype=np.uint8)
        c[:] = rgb
        assert (M.decode_jpeg(M.encode_jpeg(c)) == c).all(), rgb
    # arbitrary color content stays within the quant=1 envelope
    c = rng.integers(0, 256, (21, 35, 3)).astype(np.uint8)
    dec = M.decode_jpeg(M.encode_jpeg(c))
    assert dec.shape == (21, 35, 3)
    # per-plane IDCT error (±1) amplifies through the chroma inverse
    # (1.772·Cb term) — measured ≤ 3 on noise
    assert np.abs(dec - c).max() <= 4.0
    # grayscale path unchanged
    g = rng.integers(0, 256, (15, 17)).astype(np.uint8)
    assert np.abs(M.decode_jpeg(M.encode_jpeg(g)) - g).max() <= 1.5
    # malformed color shapes refused
    with pytest.raises(ValueError, match="RGB"):
        M.encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))
    # chroma-subsampled streams refused honestly (flip a sampling byte)
    enc = bytearray(M.encode_jpeg(c))
    sof = enc.find(b"\xff\xc0")
    # FFC0 len(2) prec(1) h(2) w(2) nc(1) → comp1 id at +10, sampling +11
    enc[sof + 11] = 0x22  # Y sampling 2x2 => 4:2:0
    with pytest.raises(ValueError, match="4:4:4|subsampling"):
        M.decode_jpeg(bytes(enc))


def test_gif_codec_round_trip_and_conformance():
    """r5: real GIF89a LZW — round trips across table-straining
    patterns, plus an externally-authored 1×1 byte vector (decoder
    conformance beyond self-consistency) and honest gates."""
    import numpy as np
    import pytest

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    pal = np.stack(
        [(np.arange(256) * 7) % 256, (np.arange(256) * 13) % 256,
         (np.arange(256) * 29) % 256], axis=-1,
    ).astype(np.uint8)
    rng = np.random.default_rng(3)
    for idx in [
        rng.integers(0, 256, (7, 13)).astype(np.uint8),
        np.full((50, 50), 42, np.uint8),            # max-compression runs
        np.tile(np.arange(16, dtype=np.uint8), (64, 16)),  # deep strings
        rng.integers(0, 256, (128, 128)).astype(np.uint8),  # 12-bit codes
    ]:
        dec = M.decode_gif(M.encode_gif(idx, pal))
        assert dec.shape == (*idx.shape, 3) and (dec == pal[idx]).all()
    # decode_real dispatches on the GIF magic
    one = np.array([[5]], dtype=np.uint8)
    assert (M.decode_real(M.encode_gif(one, pal)) == pal[one].ravel()).all()
    # externally-authored canonical 1×1 white GIF (2-entry palette,
    # 2-bit min code) — proves the decoder implements the spec, not
    # just the inverse of this encoder
    known = bytes.fromhex(
        "474946383961" "0100010080" "0000" "ffffff" "000000"
        "2c000000000100010000" "0202440100" "3b"
    )
    out = M.decode_gif(known)
    assert out.shape == (1, 1, 3) and (out[0, 0] == [255, 255, 255]).all()
    with pytest.raises(ValueError, match="GIF"):
        M.decode_gif(b"GIFXXa" + b"\x00" * 20)
    # interlace flag honestly refused
    bad = bytearray(M.encode_gif(one, pal))
    bad[6 + 7 + 768 + 9] |= 0x40  # image-descriptor packed byte
    with pytest.raises(NotImplementedError, match="interlaced"):
        M.decode_gif(bytes(bad))


def test_tiff_codec_round_trip_and_foreign_layouts():
    import struct

    import numpy as np

    g = ((np.arange(24 * 32) * 7) % 256).astype("uint8").reshape(24, 32)
    assert (M.decode_tiff(M.encode_tiff(g)) == g).all()
    c = np.stack([g, (g * 3) % 256, (g * 5) % 256], axis=-1).astype("uint8")
    assert (M.decode_tiff(M.encode_tiff(c)) == c).all()
    # dispatcher routes on the II magic
    assert (M.decode_real(M.encode_tiff(c)) == c.ravel()).all()

    # decoder correctness beyond self-consistency: a hand-crafted
    # BIG-ENDIAN ('MM') two-strip file (inline values left-justified
    # per TIFF 6.0 §2) must decode identically
    h, w = 4, 6
    arr = (np.arange(h * w) % 256).astype("uint8").reshape(h, w)
    data = arr.tobytes()
    half = len(data) // 2
    payload = bytearray(b"MM\x00\x2a") + struct.pack(">I", 8 + len(data)) + data

    def e_long(tag, cnt, val):
        return struct.pack(">HHI", tag, 4, cnt) + struct.pack(">I", val)

    def e_short(tag, val):
        return struct.pack(">HHI", tag, 3, 1) + struct.pack(">H", val) + b"\x00\x00"

    n = 9
    ifd_off = 8 + len(data)
    arrays_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack(">H", n)
    ifd += e_long(256, 1, w) + e_long(257, 1, h) + e_short(258, 8)
    ifd += e_short(259, 1) + e_short(262, 1)
    ifd += e_long(273, 2, arrays_off) + e_short(277, 1) + e_long(278, 1, 2)
    ifd += e_long(279, 2, arrays_off + 8)
    ifd += struct.pack(">I", 0)
    ifd += struct.pack(">2I", 8, 8 + half)
    ifd += struct.pack(">2I", half, len(data) - half)
    assert (M.decode_tiff(bytes(payload + ifd)) == arr).all()

    # gating: compressed / non-8-bit TIFFs raise, junk raises
    bad = bytearray(M.encode_tiff(g))
    # flip the Compression SHORT (entry order is fixed in encode_tiff)
    comp_at = bad.rindex(struct.pack("<HHI", 259, 3, 1))
    bad[comp_at + 8 : comp_at + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError):
        M.decode_tiff(bytes(bad))
    with pytest.raises(ValueError):
        M.decode_tiff(b"not a tiff at all")


def test_audio_wht_parseval_and_dc(spark):
    """Parseval for the +/-1 Hadamard basis: sum_k c_k^2 = 8 * sum_p x_p^2
    per frame, so summed spectra obey the same identity; sequency 0 is
    the frame-sum (DC) channel."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.queries.multimodal import q_audio_wht

    rows = q_audio_wht(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 16 * 8
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, {})[r.sequency] = r
    for m, spec in by_media.items():
        i = np.arange(2048)
        s = ((m * 37 + i * 11) % 4001 - 2000).astype(np.int64)
        total_energy = int((s.astype(object) ** 2).sum())
        wht_energy = sum(spec[k].sequency_energy for k in range(8))
        assert wht_energy == 8 * total_energy, m
        dc = np.abs(s.reshape(-1, 8).sum(axis=1))
        assert spec[0].total_abs_coef == int(dc.sum())
        assert spec[0].max_abs_coef == int(dc.max())


def test_image_whash_identical_images_zero_hamming(spark):
    """Two identical pixel grids must hash identically; a heavily
    perturbed grid must be far in hamming distance."""
    import numpy as np

    from spark_delta_lakehouse_nyctaxi_spark.operators import multimodal as M

    H = np.array(
        [[1 if bin(u & x).count("1") % 2 == 0 else -1 for x in range(8)]
         for u in range(8)], dtype=np.int64,
    )

    def whash_of(px):
        g = px.astype(np.int64).reshape(8, 4, 8, 4).sum(axis=(1, 3))
        flat = (H @ g @ H.T).flatten()
        ac = flat[1:]
        med = np.sort(ac)[31]
        return sum(1 << i for i, b in enumerate(ac > med) if b)

    r, c = np.divmod(np.arange(1024), 32)
    # cap pixels at 200 so a +3 brightness shift cannot clip at 255
    a = ((7 + r * 31 + c) % 200).astype("uint8").reshape(32, 32)
    # codec round trip preserves the hash
    assert whash_of(M.decode_bmp(M.encode_bmp(a))) == whash_of(a)
    # small brightness shift (+3 everywhere) leaves the hash intact:
    # WHT AC coefficients are invariant to a constant offset
    assert whash_of((a.astype(int) + 3).astype("uint8")) == whash_of(a)
    # structural change (transpose) moves many bits
    d = bin(whash_of(a) ^ whash_of(a.T.copy())).count("1")
    assert d > 10
