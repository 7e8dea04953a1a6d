"""Opt-in PIL/ffmpeg codec adapters (VERDICT r11 task 7): the
zero-dependency default stays unchanged; when the optional library
exists, progressive JPEG / webp / video route through it. The
fixture-decoding tests skip where the library is absent (this
container); the ROUTING tests run everywhere via fakes."""

from __future__ import annotations

import importlib.util
import shutil
import sys
import types

import pytest

from serverless_smurf_etl_and_analytics_spark.operators import multimodal

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_FFPROBE = shutil.which("ffprobe") is not None


def test_builtin_formats_untouched():
    """The adapter only ADDS formats: the built-in PPM round-trip
    still decodes without any optional library."""
    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    got = multimodal.decode_raster(multimodal.encode_ppm(px))
    assert (got == px).all()


def test_unknown_format_message_names_the_adapter():
    if HAS_PIL:
        pytest.skip("pillow present: unknown bytes go to the adapter")
    with pytest.raises(NotImplementedError, match="PIL adapter"):
        multimodal.decode_raster(b"RIFF....WEBPVP8 garbage")


def test_webp_routes_through_pil_when_importable(monkeypatch):
    """Routing law, runnable without pillow: a fake PIL module proves
    decode_raster hands non-built-in payloads to the adapter and
    returns its (H, W, 3) uint8 result."""
    import numpy as np

    want = np.full((4, 5, 3), 7, dtype=np.uint8)

    class FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return want

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    fake_pil = types.ModuleType("PIL")
    fake_image = types.ModuleType("PIL.Image")
    fake_image.open = lambda fp: FakeImg()
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
    got = multimodal.decode_raster(b"RIFF....WEBPVP8 payload")
    assert got.shape == (4, 5, 3) and (got == 7).all()


def test_pil_identify_failure_keeps_honest_stub(monkeypatch):
    """A PIL that cannot identify the payload returns None from the
    adapter, and the caller's NotImplementedError survives."""

    fake_pil = types.ModuleType("PIL")
    fake_image = types.ModuleType("PIL.Image")

    def refuse(fp):
        raise ValueError("cannot identify image file")

    fake_image.open = refuse
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
    with pytest.raises(NotImplementedError):
        multimodal.decode_raster(b"not an image at all")


@pytest.mark.skipif(not HAS_PIL, reason="pillow not installed")
def test_progressive_jpeg_fixture_via_pil(tmp_path):
    """With pillow installed: a real progressive-JPEG fixture decodes
    through the fallback route (baseline codec raises -> adapter)."""
    import io

    import numpy as np
    from PIL import Image

    px = np.zeros((8, 8, 3), np.uint8)
    px[:4] = [255, 0, 0]
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="JPEG", progressive=True)
    got = multimodal.decode_raster(buf.getvalue())
    assert got.shape == (8, 8, 3)
    assert got[0, 0, 0] > 200  # red half survives lossy round-trip


@pytest.mark.skipif(not HAS_PIL, reason="pillow not installed")
def test_webp_fixture_via_pil():
    import io

    import numpy as np
    from PIL import Image

    px = np.full((6, 7, 3), 31, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="WEBP", lossless=True)
    got = multimodal.decode_raster(buf.getvalue())
    assert got.shape == (6, 7, 3) and int(got[0, 0, 0]) == 31


def test_ffprobe_absent_returns_none(monkeypatch):
    monkeypatch.setattr(shutil, "which", lambda name: None)
    assert multimodal._probe_with_ffprobe(b"anything") is None


@pytest.mark.skipif(not HAS_FFPROBE, reason="ffmpeg not installed")
def test_video_fixture_via_ffprobe(tmp_path):
    """With ffmpeg installed: a 2-frame synthetic video probes to its
    true geometry through the adapter."""
    import subprocess

    out = tmp_path / "clip.mp4"
    subprocess.run(
        [
            "ffmpeg", "-v", "quiet", "-f", "lavfi",
            "-i", "color=c=red:s=32x16:d=0.2", "-y", str(out),
        ],
        check=True,
    )
    meta = multimodal._probe_with_ffprobe(out.read_bytes())
    assert meta is not None
    width, height, duration_ms = meta
    assert (width, height) == (32, 16) and duration_ms > 0
