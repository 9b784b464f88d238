"""Pallas flash-attention kernel vs the XLA attention oracle (interpret mode
on CPU), forward and gradients, with and without masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.attention import dot_product_attention
from mic_tpu.ops.flash_attention import flash_attention


def make_qkv(b=2, tq=24, tk=40, h=4, dh=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, tq, h, dh), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (b, tk, h, dh), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (b, tk, h, dh), jnp.float32)
    return q, k, v


def test_forward_no_mask_matches_xla():
    q, k, v = make_qkv()
    ours = flash_attention(q, k, v, block_q=8, block_k=16)
    oracle = dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-5)


def test_forward_causal_padding_mask():
    q, k, v = make_qkv(tq=16, tk=16)
    causal = jnp.tril(jnp.ones((16, 16), jnp.bool_))
    pad = jnp.ones((2, 16), jnp.bool_).at[0, 10:].set(False)
    mask = causal[None, None] & pad[:, None, None, :]
    ours = flash_attention(q, k, v, mask=mask, block_q=8, block_k=8)
    oracle = dot_product_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=2e-5)


def test_gradients_match_xla():
    q, k, v = make_qkv(tq=8, tk=8)
    mask = jnp.tril(jnp.ones((8, 8), jnp.bool_))[None, None]
    mask = jnp.broadcast_to(mask, (2, 1, 8, 8))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask=mask, block_q=8, block_k=8) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, mask=mask) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_model_with_pallas_attention():
    """End-to-end tiny captioner forward with attn_impl='pallas'."""
    from mic_tpu.core.config import CaptionerConfig
    from mic_tpu.models.captioner import Captioner

    config = CaptionerConfig.tiny()
    ref = Captioner(config, attn_impl="xla")
    fast = Captioner(config, attn_impl="pallas")
    params = ref.init_params(jax.random.PRNGKey(0))
    px = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    ids = jnp.ones((2, 6), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    a = ref(params, px, ids, mask)
    b = fast(params, px, ids, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_fully_masked_rows_get_zero_gradients():
    """A fully-padded query row outputs exact zeros in the forward; the
    recompute backward must likewise emit zero dq for it and leak nothing
    into dk/dv (left-padding case under attn_impl='pallas')."""
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 8, 2, 16)), jnp.float32) for _ in range(3)
    )
    mask = np.ones((1, 1, 8, 8), bool)
    mask[0, 0, :3, :] = False  # first 3 query rows fully masked
    mask = jnp.asarray(mask)

    out = flash_attention(q, k, v, mask=mask, block_q=8, block_k=8)
    np.testing.assert_array_equal(np.asarray(out[:, :3]), 0.0)

    # whole-output loss through flash: masked rows must contribute nothing
    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask=mask, block_q=8, block_k=8) ** 2)

    # oracle: XLA attention with the masked rows excluded from the loss
    # (the XLA path gives fully-masked rows uniform weights, so its whole-
    # output loss is NOT comparable)
    def loss_xla_valid(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, mask=mask)[:, 3:] ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla_valid, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_array_equal(np.asarray(g_flash[0][:, :3]), 0.0)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
