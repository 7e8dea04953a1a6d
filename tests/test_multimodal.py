"""Multimodal plumbing: binary payload projection, decode stub
determinism/batch shape, and the stubbed real-decoder slot."""

from __future__ import annotations

import pytest

from serverless_smurf_etl_and_analytics_spark import tables
from serverless_smurf_etl_and_analytics_spark.operators import multimodal

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


def test_binary_payload_schema(spark, docs):
    d = multimodal.with_binary_payload(docs)
    kinds = dict(d.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["n_bytes"] == "bigint"
    mods = {r["modality"] for r in d.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_assets_deterministic(spark, docs):
    a = multimodal.decode_assets(docs).orderBy("doc_id").limit(20).collect()
    b = multimodal.decode_assets(docs).orderBy("doc_id").limit(20).collect()
    assert a == b
    assert len(a) == 20


def test_decode_assets_metadata_shape(spark, docs):
    rows = multimodal.decode_assets(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        if r["modality"] == "image":
            assert r["width"] is not None and r["width"] % 64 == 0
            assert r["height"] is not None
            assert r["duration_ms"] is None
        else:
            assert r["width"] is None
            assert r["duration_ms"] is not None and r["duration_ms"] >= 1000
        assert 0.0 <= r["byte_entropy_q"] <= 1.0


def test_real_decoder_stubs_are_accurate(spark, docs):
    """Only the genuinely-stubbed real slots raise: frame sampling
    (ffmpeg) and resize without payloads. decode_assets's real path
    exists since r11 (see test_decode_assets_real_path_end_to_end) —
    it fails at TASK time on video rows, not eagerly."""
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(
            multimodal.decode_assets(docs), use_real_decoder=True
        )
    with pytest.raises(NotImplementedError):
        multimodal.sample_frames(
            multimodal.decode_assets(docs), use_real_decoder=True
        )
    # real decode of a video row raises the ffmpeg stub at task time
    vid = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x01\x02"))],
        "doc_id long, modality string, payload binary",
    )
    with pytest.raises(Exception, match="ffmpeg"):
        multimodal.decode_assets(vid, use_real_decoder=True).collect()


def test_decode_assets_real_path_end_to_end(spark):
    """VERDICT r10 task 6: a real JPEG (plus PNG, PPM, and PCM WAV)
    decodes end-to-end through decode_assets(use_real_decoder=True) —
    true dimensions, true channel counts, true durations, and the
    actual byte entropy."""
    import math

    import numpy as np

    from serverless_smurf_etl_and_analytics_spark.operators import (
        jpegcodec,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    rate, n = 8000, 2000  # 250 ms
    tone = (
        1000 * np.sin(2 * math.pi * 440 * np.arange(n) / rate)
    ).astype("int16")
    payloads = [
        (1, "image", bytearray(jpegcodec.encode_jpeg(img, 95))),
        (2, "image", bytearray(multimodal.encode_png(img))),
        (3, "image", bytearray(multimodal.encode_ppm(img))),
        (4, "audio", bytearray(multimodal.encode_wav(tone, rate))),
    ]
    d = spark.createDataFrame(
        payloads, "doc_id long, modality string, payload binary"
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.decode_assets(
            d, use_real_decoder=True
        ).collect()
    }
    for i in (1, 2, 3):
        assert rows[i]["width"] == 40
        assert rows[i]["height"] == 24
        assert rows[i]["channels"] == 3
        assert rows[i]["duration_ms"] is None
    assert rows[4]["channels"] == 1
    assert rows[4]["duration_ms"] == 250
    assert rows[4]["width"] is None and rows[4]["height"] is None
    # entropy is the real Shannon value of the payload bytes
    buf = bytes(payloads[2][2])
    counts = np.bincount(np.frombuffer(buf, np.uint8), minlength=256)
    p = counts[counts > 0] / len(buf)
    assert rows[3]["byte_entropy_q"] == round(
        float(-(p * np.log2(p)).sum()) / 8.0, 3
    )
    assert rows[3]["n_bytes"] == len(buf)


def test_resize_preserves_aspect_and_bounds(spark, docs):
    decoded = multimodal.decode_assets(docs)
    rows = multimodal.resize_images(decoded, max_side=256).collect()
    assert rows
    for r in rows:
        assert max(r["out_width"], r["out_height"]) <= 256
        # aspect preserved within integer-truncation granularity
        in_ratio = r["width"] / r["height"]
        out_ratio = r["out_width"] / r["out_height"]
        tol = 1.0 / min(r["out_width"], r["out_height"]) + 1e-9
        assert abs(in_ratio - out_ratio) / in_ratio <= tol
        # never upscale
        assert r["out_width"] <= r["width"]
        assert r["out_height"] <= r["height"]


def test_frame_sampling_fans_out(spark, docs):
    decoded = multimodal.decode_assets(docs)
    n_videos = decoded.filter(decoded.modality == "video").count()
    frames = multimodal.sample_frames(decoded, n_frames=4)
    rows = frames.collect()
    assert len(rows) == n_videos * 4
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        offs = [r["offset_ms"] for r in sorted(doc_rows, key=lambda r: r["frame_idx"])]
        assert offs[0] == 0
        assert offs == sorted(offs)  # evenly spaced, monotone


def test_ppm_codec_roundtrip_and_validation():
    """The zero-dependency REAL image codec: P6 encode/decode are
    inverses, header comments/whitespace tolerated, malformed and
    truncated payloads rejected loudly."""
    import numpy as np

    px = (np.arange(9 * 13 * 3) % 256).astype(np.uint8).reshape(9, 13, 3)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(px)) == px).all()
    commented = b"P6\n# made by a tool\n 13  9\n255\n" + px.tobytes()
    assert (multimodal.decode_ppm(commented) == px).all()
    with pytest.raises(ValueError, match="P6"):
        multimodal.decode_ppm(b"JFIF....")
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_ppm(multimodal.encode_ppm(px)[:-4])
    with pytest.raises(ValueError, match="16-bit"):
        multimodal.decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_resize_ppm_images_real_pixels(spark):
    """resize_ppm_images decodes REAL pixels and fingerprints the
    re-encoded resample: the Spark result must byte-match a local
    numpy reference for every asset — geometry AND pixel content."""
    import hashlib

    import numpy as np

    def make_img(doc_id, w, h):
        rng = np.random.default_rng(doc_id)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    geoms = [(1, 64, 48), (2, 300, 200), (3, 10, 500), (4, 7, 5)]
    rows = [
        (doc_id, bytearray(multimodal.encode_ppm(make_img(doc_id, w, h))))
        for doc_id, w, h in geoms
    ]
    assets = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.resize_ppm_images(assets, 128).collect()
    }
    for doc_id, w, h in geoms:
        px = make_img(doc_id, w, h)
        scale = min(1.0, 128 / max(w, h))
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        expect_fp = hashlib.md5(
            multimodal.encode_ppm(multimodal._resize_nearest(px, ow, oh))
        ).hexdigest()
        r = got[doc_id]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["out_width"], r["out_height"]) == (ow, oh)
        assert r["resized_fp"] == expect_fp, f"pixel drift on {doc_id}"
    # upscale never happens: the small image passes through 1:1
    assert (got[4]["out_width"], got[4]["out_height"]) == (7, 5)


def test_wav_codec_roundtrip_and_stats(spark):
    """Real WAV path: encode known PCM, decode it back exactly, and
    the Spark-side stats operator reports the true duration/peak/RMS
    (hand-computable on a constant-amplitude square wave)."""
    import numpy as np

    from serverless_smurf_etl_and_analytics_spark.operators import (
        multimodal as mm,
    )

    rate, n = 8000, 4000  # exactly 500 ms
    square = np.where(np.arange(n) % 2 == 0, 1000, -1000).astype("int16")
    stereo = np.stack([square, square], axis=1)
    payload = mm.encode_wav(stereo, rate)
    s, r = mm.decode_wav(payload)
    assert r == rate and s.shape == (n, 2) and (s == stereo).all()

    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    row = mm.wav_audio_stats(assets).collect()[0]
    assert row["sample_rate"] == rate
    assert row["n_channels"] == 2
    assert row["n_samples"] == n
    assert row["duration_ms"] == 500
    assert row["peak_abs"] == 1000
    assert row["rms_q"] == 1000  # |x| constant -> RMS == amplitude
    import hashlib

    assert row["pcm_fp"] == hashlib.md5(stereo.tobytes()).hexdigest()


def test_wav_decode_rejects_malformed_payloads(spark):
    import numpy as np
    import pytest

    from serverless_smurf_etl_and_analytics_spark.operators import (
        multimodal as mm,
    )

    good = mm.encode_wav(np.zeros(100, dtype="int16"), 8000)
    with pytest.raises(ValueError, match="RIFF"):
        mm.decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_wav(good[:-10])
    # compressed format tag fails loudly, never silently decodes
    bad = bytearray(good)
    bad[20] = 85  # format tag 1 -> 0x55 (mp3-in-wav)
    with pytest.raises(ValueError, match="format tag"):
        mm.decode_wav(bytes(bad))


def _forward_filter_png(px, ftypes):
    """Test-side forward PNG filtering (spec §9): build a raw scanline
    stream applying ftypes[y] per row, for exercising the decoder's
    unfilter paths against ground-truth pixels."""
    import numpy as np

    h, w = px.shape[:2]
    bpp = 3
    stride = w * bpp
    flat = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = flat[y]
        prv = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        enc = np.empty(stride, np.int32)
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prv[i])
            c = int(prv[i - bpp]) if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[i] = (int(cur[i]) - pred) & 0xFF
        out += bytes([ft]) + enc.astype(np.uint8).tobytes()
    return bytes(out)


def test_png_roundtrip_and_all_filters():
    """encode_png -> decode_png is the identity, and the decoder
    unfilters ALL five scanline filter types correctly (the test
    forward-filters known pixels per the spec and checks exact pixel
    recovery)."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    assert (multimodal.decode_png(multimodal.encode_png(px)) == px).all()

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        raw = _forward_filter_png(px, ftypes)
        ihdr = struct.pack(">IIBBBBB", 7, 9, 8, 2, 0, 0, 0)
        payload = (
            multimodal.PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert (multimodal.decode_png(payload) == px).all(), ftypes


def test_png_color_types_and_rejections():
    """Gray (0), palette (3), gray+alpha (4) and RGBA (6) map to
    (H, W, 3); 16-bit and interlaced payloads fail loudly."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    def png(w, h, ctype, raw, extra=b"", depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        return (
            multimodal.PNG_MAGIC + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    gray = bytes([0, 10, 200, 0, 30, 40])  # 2x2 gray, filter 0
    out = multimodal.decode_png(png(2, 2, 0, gray))
    assert out.shape == (2, 2, 3) and (out[0, 0] == [10, 10, 10]).all()

    # palette: 2 entries, indices 0/1
    plte = chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
    pal = bytes([0, 0, 1, 0, 1, 0])
    out = multimodal.decode_png(png(2, 2, 3, pal, extra=plte))
    assert (out[0, 1] == [0, 0, 255]).all() and (out[1, 1] == [255, 0, 0]).all()

    # gray+alpha and RGBA: alpha dropped
    ga = bytes([0, 9, 100, 9, 100, 0, 9, 100, 9, 100])
    assert (multimodal.decode_png(png(2, 2, 4, ga))[0, 0] == [9, 9, 9]).all()
    rgba = bytes([0] + [1, 2, 3, 9] * 2 + [0] + [4, 5, 6, 9] * 2)
    out = multimodal.decode_png(png(2, 2, 6, rgba))
    assert (out[0, 0] == [1, 2, 3]).all() and (out[1, 1] == [4, 5, 6]).all()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_png(png(1, 1, 2, bytes([0, 0, 0, 1, 1, 1]), depth=16))
    with _pytest.raises(ValueError, match="interlace"):
        multimodal.decode_png(png(1, 1, 2, bytes([0, 1, 2, 3]), interlace=1))
    # r10: JPEG magic now routes to the real baseline codec, which
    # rejects this malformed stream loudly; still-unsupported formats
    # (webp) keep the honest NotImplementedError
    with _pytest.raises(ValueError):
        multimodal.decode_raster(b"\xff\xd8\xff\xe0 fake jpeg")
    with _pytest.raises(NotImplementedError, match="PIL"):
        multimodal.decode_raster(b"RIFF....WEBPVP8 ")


def test_resize_images_real_path_handles_png_and_ppm(spark):
    """resize_images(use_real_decoder=True) is REAL for PNG (r8): a
    PNG and a PPM of the SAME pixels produce identical resized
    fingerprints (output is re-encoded P6 either way), byte-matching
    the local numpy reference; metadata-only input still fails with
    the documented PIL message."""
    import hashlib

    import numpy as np
    import pytest as _pytest

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(200, 300, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_png(px))),
            (2, bytearray(multimodal.encode_ppm(px))),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.resize_images(
            assets, 128, use_real_decoder=True
        ).collect()
    }
    ref = hashlib.md5(
        multimodal.encode_ppm(
            multimodal._resize_nearest(px, 128, 85)
        )
    ).hexdigest()
    assert got[1]["resized_fp"] == ref == got[2]["resized_fp"]
    assert (got[1]["width"], got[1]["height"]) == (300, 200)
    assert (got[1]["out_width"], got[1]["out_height"]) == (128, 85)

    meta_only = spark.createDataFrame(
        [(1, "image", 10, 10)],
        "doc_id long, modality string, width long, height long",
    )
    with _pytest.raises(NotImplementedError, match="PIL"):
        multimodal.resize_images(meta_only, 128, use_real_decoder=True)


def test_jpeg_codec_roundtrip_modes_and_rejections():
    """The r10 baseline JPEG codec (ITU T.81, zero-dependency): a
    quality-95 4:4:4 round trip reconstructs real pixels (tight MAE
    bound — a fake decoder cannot pass this), 4:2:0 subsampling and
    restart markers round-trip through the interleaved-MCU and RST
    paths, grayscale replicates to 3 channels, and the out-of-scope
    shapes fail loudly (progressive SOF2, non-JPEG bytes, truncated
    entropy stream)."""
    import numpy as np
    import pytest as _pytest

    from serverless_smurf_etl_and_analytics_spark.operators import (
        jpegcodec,
    )

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
    ).astype(np.uint8)

    smooth = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(img, 95))
    assert smooth.shape == (h, w, 3)
    assert np.abs(smooth.astype(int) - img.astype(int)).mean() < 2.0

    sub = jpegcodec.decode_jpeg(
        jpegcodec.encode_jpeg(img, 95, subsample=True)
    )
    assert np.abs(sub.astype(int) - img.astype(int)).mean() < 4.0

    rst = jpegcodec.decode_jpeg(
        jpegcodec.encode_jpeg(img, 95, subsample=True, restart_interval=2)
    )
    assert (rst == sub).all()  # RST is framing only, not content

    gray = ((xx * yy) % 256).astype(np.uint8)
    g = jpegcodec.decode_jpeg(jpegcodec.encode_jpeg(gray, 95))
    assert g.shape == (h, w, 3)
    assert (g[:, :, 0] == g[:, :, 1]).all()
    assert np.abs(g[:, :, 0].astype(int) - gray.astype(int)).mean() < 3.0

    payload = jpegcodec.encode_jpeg(img, 90)
    progressive = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(NotImplementedError, match="progressive"):
        jpegcodec.decode_jpeg(progressive)
    with _pytest.raises(ValueError, match="SOI"):
        jpegcodec.decode_jpeg(b"RIFF....WAVE")
    with _pytest.raises(ValueError, match="truncated|marker"):
        jpegcodec.decode_jpeg(payload[: len(payload) // 2])


def test_resize_images_real_path_handles_jpeg(spark):
    """resize_images(use_real_decoder=True) end-to-end over a REAL
    JPEG payload: the Spark-side fingerprint byte-matches the local
    decode->resample->P6 reference, and the decoded pixels are close
    to the original (proving actual entropy decode + IDCT ran inside
    the executor, not the deterministic fake)."""
    import hashlib

    import numpy as np

    from serverless_smurf_etl_and_analytics_spark.operators import (
        jpegcodec,
    )

    yy, xx = np.mgrid[0:200, 0:300]
    px = np.stack(
        [(xx * 2) % 256, (yy * 3) % 256, ((xx + yy)) % 256], axis=2
    ).astype(np.uint8)
    payload = jpegcodec.encode_jpeg(px, quality=95)
    assets = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    [r] = multimodal.resize_images(
        assets, 128, use_real_decoder=True
    ).collect()
    decoded = jpegcodec.decode_jpeg(payload)
    assert np.abs(decoded.astype(int) - px.astype(int)).mean() < 2.0
    ref = hashlib.md5(
        multimodal.encode_ppm(
            multimodal._resize_nearest(decoded, 128, 85)
        )
    ).hexdigest()
    assert (r["width"], r["height"]) == (300, 200)
    assert (r["out_width"], r["out_height"]) == (128, 85)
    assert r["resized_fp"] == ref
    # sniff dispatch: decode_raster routes JPEG to the real codec
    assert (multimodal.decode_raster(payload) == decoded).all()


def test_jpeg_codec_property_random_geometry_and_content():
    """Property check over the codec's edge paths: ANY geometry
    (including dimensions far from the 8/16-pixel MCU grid, single
    rows/columns) and ANY content (uniform, noise, gradients) must
    round-trip within the quantization error bound at high quality —
    in both 4:4:4 and 4:2:0 — and the decoded shape must equal the
    input shape exactly (padding never leaks into the output)."""
    import numpy as np

    from serverless_smurf_etl_and_analytics_spark.operators import (
        jpegcodec,
    )

    rng = np.random.default_rng(42)
    geoms = [(1, 1), (1, 17), (9, 1), (7, 5), (8, 8), (15, 31),
             (16, 16), (17, 33), (24, 40)]
    for h, w in geoms:
        for kind in ("uniform", "noise", "gradient"):
            if kind == "uniform":
                img = np.full((h, w, 3), 137, np.uint8)
            elif kind == "noise":
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            else:
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256],
                    axis=2,
                ).astype(np.uint8)
            for sub in (False, True):
                dec = jpegcodec.decode_jpeg(
                    jpegcodec.encode_jpeg(img, 97, subsample=sub)
                )
                assert dec.shape == (h, w, 3), (h, w, kind, sub)

                def luma(a):
                    return (
                        0.299 * a[..., 0]
                        + 0.587 * a[..., 1]
                        + 0.114 * a[..., 2]
                    )

                if sub and kind == "noise":
                    # 4:2:0 DISCARDS half the chroma information by
                    # construction — on pure RGB noise the chroma
                    # planes are unreconstructable (any codec shows
                    # RGB MAE ~40 here), so the meaningful property
                    # is that the FULL-RESOLUTION luma survives
                    mae = np.abs(
                        luma(dec.astype(float)) - luma(img.astype(float))
                    ).mean()
                    assert mae < 8.0, (h, w, kind, sub, mae)
                else:
                    mae = np.abs(
                        dec.astype(int) - img.astype(int)
                    ).mean()
                    bound = 6.0 if not sub else 12.0
                    assert mae < bound, (h, w, kind, sub, mae)
