"""On-device image preprocessing: bicubic resize as matmuls + CLIP normalize.

Replaces the reference's host-side torchvision pipeline (jit-scripted
Resize/CenterCrop/ConvertImageDtype/Normalize, main.py:165-179, 438-439) with a
TPU-native design:

- the host only decodes JPEG -> uint8 and crops to a fixed square
  (mic_tpu/data/images.py); batches cross PCIe as uint8 (4x less traffic
  than float32);
- on device, separable bicubic resize is two matmuls with precomputed
  interpolation matrices — (S_out x S_in) @ img @ (S_in x S_out) — which XLA
  tiles straight onto the MXU, fused with the /255, mean/std normalize and the
  cast to the compute dtype.

Geometry note: host "shortest-side resize to S, center-crop SxS" followed by a
uniform SxS -> 224x224 device resize selects exactly the same image region as
torchvision's Resize(224)+CenterCrop(224) (one extra resampling pass).

The antialiased Keys-cubic (a = -0.5) weights match PIL/torchvision/
jax.image.resize semantics for downscaling.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# CLIP pixel statistics (reference main.py:176-178 via CLIPProcessor)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2.0, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )


@functools.lru_cache(maxsize=32)
def resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) row-normalized antialiased bicubic interpolation matrix."""
    if src == dst:
        return np.eye(src, dtype=np.float32)
    scale = src / dst
    support = 2.0 * max(scale, 1.0)  # antialias: widen kernel when downscaling
    # sample centers in source coordinates
    centers = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    cols = np.arange(src, dtype=np.float64)
    dist = (centers[:, None] - cols[None, :]) / max(scale, 1.0)
    weights = _cubic(dist) * (np.abs(centers[:, None] - cols[None, :]) <= support)
    weights /= weights.sum(axis=1, keepdims=True)
    return weights.astype(np.float32)


def preprocess_images(
    images_u8: jnp.ndarray,   # (B, S, S, 3) uint8, already square-cropped
    out_size: int = 224,
    dtype=jnp.float32,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> jnp.ndarray:
    """uint8 square images -> normalized (B, out, out, 3) in compute dtype."""
    src = images_u8.shape[1]
    x = images_u8.astype(jnp.float32) / 255.0
    if src != out_size:
        w = jnp.asarray(resize_matrix(src, out_size))
        # rows: (B,S,S,C) -> (B,out,S,C); cols: -> (B,out,out,C)
        x = jnp.einsum("os,bshc->bohc", w, x, preferred_element_type=jnp.float32)
        x = jnp.einsum("os,bhsc->bhoc", w, x, preferred_element_type=jnp.float32)
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return x.astype(dtype)


def maybe_preprocess(pixel_values: jnp.ndarray, image_size: int, dtype) -> jnp.ndarray:
    """Train/eval steps accept either ready float images or raw uint8 crops."""
    if pixel_values.dtype == jnp.uint8:
        return preprocess_images(pixel_values, image_size, dtype)
    return pixel_values.astype(dtype)
