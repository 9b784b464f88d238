"""Fused cross-attention kernel (ops/cross_attention.py) vs the XLA path
(nn/attention.py mha_cross_grouped) — interpret mode, so the exact kernel
program runs on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.cross_attention import fused_cross_attention, supports
from mic_tpu.ops.quant import quantize_rows_dynamic


def _dense_ref(q, k, v, heads):
    """mha_cross_grouped's core math (mask=None), pre-projected q."""
    b, kk, hd = q.shape
    dh = hd // heads
    q4 = q.reshape(b, kk, heads, dh)
    k4 = k.reshape(b, -1, heads, dh)
    v4 = v.reshape(b, -1, heads, dh)
    scores = jnp.einsum(
        "bkhd,bshd->bhks", q4, k4.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhks,bshd->bkhd", w, v4, preferred_element_type=q.dtype
    )
    return out.reshape(b, kk, hd)


def _inputs(b, k, h, dh, s, seed=0):
    rng = np.random.default_rng(seed)
    hd = h * dh
    q = jnp.asarray(
        rng.normal(size=(b, k, hd)).astype(np.float32) * 0.3, jnp.bfloat16
    )
    ek = jnp.asarray(
        rng.normal(size=(b, s, h, dh)).astype(np.float32) * 0.5, jnp.bfloat16
    )
    ev = jnp.asarray(
        rng.normal(size=(b, s, h, dh)).astype(np.float32) * 0.5, jnp.bfloat16
    )
    return q, ek, ev


@pytest.mark.parametrize("s,k", [(50, 4), (50, 1), (13, 4), (64, 2)])
def test_kernel_matches_xla_path(s, k):
    b, h, dh = 2, 16, 64
    q, ek, ev = _inputs(b, k, h, dh, s)
    ref = np.asarray(_dense_ref(q, ek, ev, h), np.float32)
    got = np.asarray(
        fused_cross_attention(q, ek, ev, k, h, interpret=True), np.float32
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 0.03


def test_kernel_merged_layout_matches():
    b, k, h, dh, s = 2, 4, 16, 64, 50
    q, ek, ev = _inputs(b, k, h, dh, s, seed=1)
    ref = np.asarray(
        fused_cross_attention(q, ek, ev, k, h, interpret=True), np.float32
    )
    got = np.asarray(
        fused_cross_attention(
            q, ek.reshape(b, s, h * dh), ev.reshape(b, s, h * dh),
            k, h, interpret=True,
        ),
        np.float32,
    )
    np.testing.assert_array_equal(got, ref)


def test_kernel_int8_kv_close():
    b, k, h, dh, s = 2, 4, 16, 64, 50
    q, ek, ev = _inputs(b, k, h, dh, s, seed=2)
    kq8, ks = quantize_rows_dynamic(ek)
    vq8, vs = quantize_rows_dynamic(ev)
    ek8 = {"q": kq8, "s": ks[..., 0]}
    ev8 = {"q": vq8, "s": vs[..., 0]}
    ref = np.asarray(_dense_ref(q, ek, ev, h), np.float32)
    got = np.asarray(
        fused_cross_attention(q, ek8, ev8, k, h, interpret=True), np.float32
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 0.06


def test_supports_guard():
    assert supports(16, 64)
    assert not supports(3, 64)
