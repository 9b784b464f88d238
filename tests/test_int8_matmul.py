"""ops/int8_matmul.py — the documented measured-negative Pallas dequant GEMM
(per-call dispatch broke XLA's decode-loop fusion chains; see PERFORMANCE.md
"measured dead ends").  Kept in-tree as a reference implementation, so it
gets a parity test: the kernel (interpret mode off-TPU) must match the dense
dequantized matmul, including the non-128-multiple output-channel pad path
and the small-shape XLA fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.int8_matmul import int8_matmul, _kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dense_ref(x, w_q, scale):
    w = w_q.astype(x.dtype) * scale.astype(x.dtype)[None, :]
    return np.asarray(jnp.dot(x, w, preferred_element_type=x.dtype), np.float32)


def _kernel_call(x, w_q, scale, bm, bn):
    m, k = x.shape
    n = w_q.shape[1]
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=True,
    )(x, w_q, scale.reshape(1, n))


@pytest.mark.parametrize("m,k,n,bm,bn", [(16, 128, 256, 8, 128),
                                         (8, 256, 128, 8, 128)])
def test_kernel_matches_dense_dequant(m, k, n, bm, bn):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    w_q = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(n,)).astype(np.float32))
    ref = _dense_ref(x, w_q, scale)
    got = np.asarray(_kernel_call(x, w_q, scale, bm, bn), np.float32)
    sc = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / sc < 0.02


def test_entrypoint_fallback_matches_dense():
    # off-TPU the public entry point takes the XLA fallback — exact math
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 96)).astype(np.float32), jnp.bfloat16)
    w_q = jnp.asarray(rng.integers(-127, 128, size=(96, 100)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(100,)).astype(np.float32))
    ref = _dense_ref(x, w_q, scale)
    got = np.asarray(int8_matmul(x, w_q, scale), np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)
