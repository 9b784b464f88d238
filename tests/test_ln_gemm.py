"""ops/ln_gemm.py: fused LN->GEMM == layer_norm + dense (interpret mode),
and the decode path under MIC_TPU_EXPERIMENTAL=ln_qkv == the default path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mic_tpu.nn.layers import dense, layer_norm
from mic_tpu.ops.ln_gemm import ln_gemm, supports


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ln_gemm_matches_unfused(dtype):
    rng = np.random.default_rng(0)
    n, d, o = 16, 128, 384
    x = jnp.asarray(rng.normal(size=(n, d)) * 0.7, dtype)
    g = jnp.asarray(rng.normal(size=(d,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, o)) * 0.05, dtype)
    wb = jnp.asarray(rng.normal(size=(o,)) * 0.1, dtype)
    assert supports(x, w)

    got = ln_gemm(x, g, b, w, wb, 1e-5, True)
    ref = dense({"kernel": w, "bias": wb},
                layer_norm({"scale": g, "bias": b}, x, 1e-5))
    assert got.dtype == ref.dtype
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float64), np.asarray(ref, np.float64),
        rtol=tol, atol=tol,
    )


def test_supports_guards():
    x = jnp.zeros((16, 128), jnp.bfloat16)
    assert not supports(x, jnp.zeros((128, 100), jnp.bfloat16))  # lane-ragged
    assert not supports(jnp.zeros((10, 128), jnp.bfloat16),
                        jnp.zeros((128, 384), jnp.bfloat16))     # row-ragged
    assert not supports(x, jnp.zeros((128, 384 * 1024), jnp.bfloat16))  # VMEM


def test_decode_parity_under_ln_qkv(monkeypatch):
    """Whole decode step with the knob on == off (CPU interpret mode;
    the knob gates on TPU, so drive mha_decode_step_lazy directly)."""
    from mic_tpu.nn.attention import init_mha, mha_decode_step_lazy
    from mic_tpu.models.mbart_decoder import fuse_qkv_params

    rng = jax.random.PRNGKey(1)
    b, k, d, h, t = 2, 2, 128, 4, 8
    params = init_mha(rng, d, h)
    stacked = jax.tree.map(lambda a: a[None], {"self_attn": params})
    qkv = jax.tree.map(
        lambda a: a[0], fuse_qkv_params({"layers": stacked})["layers"]
    )["self_attn"]
    ln = {"scale": jnp.ones((d,)) * 1.3, "bias": jnp.zeros((d,)) + 0.05}

    x = jax.random.normal(jax.random.fold_in(rng, 2), (b * k, 1, d))
    ck = jnp.zeros((b * k, t, h, d // h))
    cv = jnp.zeros((b * k, t, h, d // h))
    anc = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, 1, t))
    idx = jnp.asarray(0, jnp.int32)

    from mic_tpu.nn.layers import layer_norm as ln_fn

    out0, k0, v0 = mha_decode_step_lazy(
        qkv, ln_fn(ln, x), ck, cv, anc, idx, h, k
    )
    out1, k1, v1 = mha_decode_step_lazy(
        qkv, x, ck, cv, anc, idx, h, k, ln=(ln, 1e-5)
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k0), np.asarray(k1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=2e-5, atol=2e-5)
