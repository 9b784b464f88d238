"""Fused decode-attention kernel vs exact oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mic_tpu.ops.decode_attention as da


def oracle(q, k_step, v_step, ck, cv, l, t):
    ck = ck.at[l, :, t].set(k_step[:, 0])
    cv = cv.at[l, :, t].set(v_step[:, 0])
    kl, vl = ck[l], cv[l]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kl.astype(jnp.float32))
    valid = (jnp.arange(kl.shape[1]) <= t)[None, None, None, :]
    s = jnp.where(valid, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vl.astype(jnp.float32))
    return out.astype(q.dtype), ck, cv


def run_interpret(q, ks, vs, ck, cv, l, t, chunk, block_b):
    """Run the Pallas path with interpret=True regardless of backend."""
    real = jax.default_backend
    # call the TPU branch by monkeypatching backend detection + interpret
    import jax.experimental.pallas as pl

    orig_call = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig_call(*args, **kw)

    pl.pallas_call = patched
    da.pl.pallas_call = patched
    jax.default_backend = lambda: "tpu"
    da.jax.default_backend = lambda: "tpu"
    try:
        return da.decode_attention(
            q, ks, vs, ck, cv, jnp.asarray(l, jnp.int32), jnp.asarray(t, jnp.int32),
            chunk=chunk, block_b=block_b,
        )
    finally:
        pl.pallas_call = orig_call
        da.pl.pallas_call = orig_call
        jax.default_backend = real
        da.jax.default_backend = real


@pytest.mark.parametrize("t", [0, 7, 15, 31])
@pytest.mark.slow
def test_kernel_matches_oracle(t):
    L, B, T, H, Dh = 3, 8, 32, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(t), 5)
    ck = jax.random.normal(ks[0], (L, B, T, H, Dh), jnp.float32)
    cv = jax.random.normal(ks[1], (L, B, T, H, Dh), jnp.float32)
    q = jax.random.normal(ks[2], (B, 1, H, Dh), jnp.float32) * 0.5
    k_step = jax.random.normal(ks[3], (B, 1, H, Dh), jnp.float32)
    v_step = jax.random.normal(ks[4], (B, 1, H, Dh), jnp.float32)
    layer = 1

    got_o, got_k, got_v = run_interpret(q, k_step, v_step, ck, cv, layer, t,
                                        chunk=8, block_b=4)
    want_o, want_k, want_v = oracle(q, k_step, v_step, ck, cv, layer, t)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=2e-5)
    # the updated column must land; untouched cells preserved
    np.testing.assert_array_equal(
        np.asarray(got_k[layer, :, t]), np.asarray(want_k[layer, :, t])
    )
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
