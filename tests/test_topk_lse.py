"""Fused top-k+logsumexp kernel vs XLA oracle (CPU fallback + interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.ops.topk_lse import _kernel, topk_log_probs
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools


def oracle(logits, k):
    l32 = logits.astype(jnp.float32)
    vals, ids = jax.lax.top_k(l32, k)
    lse = jax.scipy.special.logsumexp(l32, axis=-1, keepdims=True)
    return vals - lse, ids


def run_kernel_interpret(logits, k, bn, bv):
    n, v = logits.shape
    return pl.pallas_call(
        functools.partial(_kernel, v, k),
        grid=(pl.cdiv(n, bn), pl.cdiv(v, bv)),
        in_specs=[pl.BlockSpec((bn, bv), lambda i, j: (i, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, k), jnp.float32),
            pltpu.VMEM((bn, k), jnp.int32),
        ],
        interpret=True,
    )(logits)


def test_kernel_matches_oracle_multiblock():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, 1000)).astype(np.float32)) * 3
    lp, ids = run_kernel_interpret(logits, 9, bn=8, bv=256)  # ragged tail
    olp, oids = oracle(logits, 9)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(olp), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(oids))


def test_kernel_bf16_values():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, 512)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    lp, ids = run_kernel_interpret(logits, 5, bn=4, bv=128)
    olp, oids = oracle(logits, 5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(olp), atol=1e-5)
    # bf16 ties can reorder equal-valued ids; compare values at chosen ids
    l32 = logits.astype(jnp.float32)
    got_vals = np.take_along_axis(np.asarray(l32), np.asarray(ids), axis=1)
    want_vals = np.take_along_axis(np.asarray(l32), np.asarray(oids), axis=1)
    np.testing.assert_allclose(got_vals, want_vals, atol=1e-6)


def test_public_entry_cpu_fallback():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(6, 300)).astype(np.float32))
    lp, ids = topk_log_probs(logits, 7)
    olp, oids = oracle(logits, 7)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(olp), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(oids))
