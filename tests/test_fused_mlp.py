"""ops/fused_mlp.py: interpret-mode parity vs the XLA dense/act chain.

The kernel is a documented measured NEGATIVE end-to-end (260.3 vs 268.9
captions/s/chip at the flagship shape — XLA's decode-step MLP mega-fusion
folds the LN prologue, residual, and next-LN reduce in with the GEMMs;
see PERFORMANCE.md).  Kept opt-in via MIC_TPU_EXPERIMENTAL=fused_mlp; these tests pin
its math so the option stays usable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.nn.layers import ACTIVATIONS
from mic_tpu.ops.fused_mlp import _erf, fused_mlp


def _ref(x, w1, b1, w2, b2, act):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=x.dtype)
    h = ACTIVATIONS[act](h + b1.astype(x.dtype))
    return (
        jnp.dot(h, w2.astype(x.dtype), preferred_element_type=x.dtype)
        + b2.astype(x.dtype)
    )


def _inputs(n, d, f, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)) * 0.5, dtype)
    w1 = jnp.asarray(rng.normal(size=(d, f)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("act", ["gelu", "gelu_tanh"])
@pytest.mark.parametrize("f", [1024, 768])  # chunked (512 | f) and single
def test_fused_mlp_parity(act, f):
    x, w1, b1, w2, b2 = _inputs(64, 256, f, jnp.bfloat16)
    ref = np.asarray(_ref(x, w1, b1, w2, b2, act), np.float32)
    out = np.asarray(
        fused_mlp(x, w1, b1, w2, b2, act, interpret=True), np.float32
    )
    scale = np.max(np.abs(ref)) + 1e-9
    # f32 split-F accumulation + the in-kernel erf differ from XLA's single
    # dot + erfc at the last-ulp level only
    assert np.max(np.abs(out - ref)) / scale < 0.02


def test_erf_approximation_accuracy():
    import scipy.special

    z = np.linspace(-5, 5, 20001, dtype=np.float32)
    mine = np.asarray(_erf(jnp.asarray(z)), np.float64)
    exact = scipy.special.erf(z.astype(np.float64))
    # A&S 7.1.26 is 1.5e-7 in exact arithmetic; f32 evaluation rounds it
    # to ~2.6e-6 — still ~3 orders below bf16 resolution
    assert np.max(np.abs(mine - exact)) < 5e-6


def test_fused_mlp_f32():
    x, w1, b1, w2, b2 = _inputs(16, 256, 1024, jnp.float32)
    ref = np.asarray(_ref(x, w1, b1, w2, b2, "gelu"), np.float64)
    out = np.asarray(
        fused_mlp(x, w1, b1, w2, b2, "gelu", interpret=True), np.float64
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(out - ref)) / scale < 1e-5
