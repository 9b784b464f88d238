"""On-device image preprocessing tests: matmul-resize vs jax.image/PIL oracles,
normalization exactness, host decode geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.data.images import load_image
from mic_tpu.ops.image_prep import (
    CLIP_MEAN,
    CLIP_STD,
    preprocess_images,
    resize_matrix,
)


def test_resize_matrix_identity():
    np.testing.assert_array_equal(resize_matrix(224, 224), np.eye(224, dtype=np.float32))


def test_matmul_resize_matches_jax_image():
    rng = np.random.default_rng(0)
    img = rng.random((1, 256, 256, 3)).astype(np.float32)
    w = jnp.asarray(resize_matrix(256, 224))
    ours = jnp.einsum("os,bshc->bohc", w, jnp.asarray(img))
    ours = jnp.einsum("os,bhsc->bhoc", w, ours)
    oracle = jax.image.resize(
        jnp.asarray(img), (1, 224, 224, 3), method="bicubic", antialias=True
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-3)


def test_preprocess_normalization_exact():
    """src == dst: pure normalize, checked against a numpy oracle."""
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    out = preprocess_images(jnp.asarray(u8), out_size=32)
    oracle = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-6)


def test_preprocess_resizes_and_casts():
    u8 = np.zeros((2, 256, 256, 3), np.uint8)
    out = preprocess_images(jnp.asarray(u8), out_size=224, dtype=jnp.bfloat16)
    assert out.shape == (2, 224, 224, 3)
    assert out.dtype == jnp.bfloat16


def test_load_image_geometry(tmp_path):
    """Center crop picks the middle square of a wide image."""
    from PIL import Image

    # 300x100 image: left third red, middle third green, right third blue
    arr = np.zeros((100, 300, 3), np.uint8)
    arr[:, :100, 0] = 255
    arr[:, 100:200, 1] = 255
    arr[:, 200:, 2] = 255
    path = tmp_path / "wide.png"
    Image.fromarray(arr).save(path)
    out = load_image(str(path), size=64)
    assert out.shape == (64, 64, 3)
    # the crop should be dominated by the green middle band
    assert out[:, :, 1].mean() > out[:, :, 0].mean()
    assert out[:, :, 1].mean() > out[:, :, 2].mean()
