"""Native libjpeg decode path vs the PIL path: same geometry, close pixels."""

import numpy as np
import pytest
from PIL import Image

from mic_tpu.data import native
from mic_tpu.data.images import load_image


@pytest.fixture
def jpeg_path(tmp_path):
    rng = np.random.default_rng(0)
    # smooth image (JPEG-friendly) 300x200
    base = rng.normal(size=(8, 12, 3))
    img = np.kron(base, np.ones((25, 25, 1)))
    img = (255 * (img - img.min()) / (np.ptp(img) + 1e-9)).astype(np.uint8)
    p = tmp_path / "test.jpg"
    Image.fromarray(img).save(p, quality=95)
    return str(p)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_pil_geometry(jpeg_path):
    with open(jpeg_path, "rb") as f:
        out = native.decode_jpeg(f.read(), 64)
    assert out is not None and out.shape == (64, 64, 3)

    with Image.open(jpeg_path) as im:
        im = im.convert("RGB")
        w, h = im.size
        scale = 64 / min(w, h)
        nw, nh = max(64, round(w * scale)), max(64, round(h * scale))
        ref = im.resize((nw, nh), Image.BILINEAR)
        left, top = (nw - 64) // 2, (nh - 64) // 2
        ref = np.asarray(ref.crop((left, top, left + 64, top + 64)), np.uint8)
    # bilinear vs bilinear on a smooth image: small differences only
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert np.mean(diff) < 6.0, np.mean(diff)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_load_image_uses_native_and_survives_garbage(tmp_path, jpeg_path):
    out = load_image(jpeg_path, 48)
    assert out.shape == (48, 48, 3)
    # corrupt jpeg: native fails -> returns None -> PIL also fails -> safe path
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0garbage")
    assert native.decode_jpeg(bad.read_bytes(), 48) is None


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_validate_jpeg(jpeg_path, tmp_path):
    """Off-GIL content validation (the downloader's check): accepts valid
    RGB and grayscale streams, rejects truncation and garbage."""
    data = open(jpeg_path, "rb").read()
    assert native.validate_jpeg(data) is True
    # truncated stream: libjpeg only WARNS ("premature end") — must reject
    assert native.validate_jpeg(data[: len(data) // 2]) is False
    assert native.validate_jpeg(b"\xff\xd8\xff" + b"\x00" * 64) is False
    gray = Image.fromarray(
        np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8), "L"
    )
    import io

    buf = io.BytesIO()
    gray.save(buf, "JPEG")
    assert native.validate_jpeg(buf.getvalue()) is True


def test_downloader_validate_routes(tmp_path, monkeypatch):
    """tools/data/download.py _validate: JPEG goes native when available,
    non-JPEG and corrupt fall back to (or are rejected by) PIL."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "download_tool",
        os.path.join(os.path.dirname(__file__), "..", "tools", "data",
                     "download.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import io

    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    mod._validate(buf.getvalue())  # no raise
    png = io.BytesIO()
    img.save(png, "PNG")
    mod._validate(png.getvalue())  # PIL path, no raise
    with pytest.raises(Exception):
        mod._validate(b"\xff\xd8\xff" + b"\x00" * 64)
    with pytest.raises(Exception):
        mod._validate(b"not an image")
