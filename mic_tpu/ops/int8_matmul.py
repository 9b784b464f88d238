"""Pallas GEMM with in-VMEM int8 weight dequantization.

The XLA path for int8 weight-only decode (`ops/quant.py`) dequantizes to a
full compute-dtype weight tensor before the matmul, so HBM traffic is NOT
halved (measured only +2%).  This kernel reads the int8 weights from HBM,
dequantizes in VMEM (cast + per-output-channel scale) and feeds the MXU —
the weight stream over HBM really is half-width.

Shapes are the decode step's: x (M<=512, K), w_q (K, N) int8, scale (N,) f32.
Blocked over (M, N) with the full K per block (decoder K is 1024/4096: an
int8 (K, 256) block is <=1 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, scale_ref, o_ref):
    w = wq_ref[:].astype(x_ref.dtype) * scale_ref[:].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)  # MXU acc
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4))
def int8_matmul(
    x: jnp.ndarray,        # (M, K) compute dtype
    w_q: jnp.ndarray,      # (K, N) int8
    scale: jnp.ndarray,    # (N,) f32 per-output-channel scales
    block_m: int = 256,
    block_n: int = 512,
) -> jnp.ndarray:
    m, k = x.shape
    n = w_q.shape[1]
    if jax.default_backend() != "tpu" or m % 8 != 0 or k % 128 != 0:
        w = w_q.astype(x.dtype) * scale.astype(x.dtype)[None, :]
        return jnp.dot(x, w, preferred_element_type=x.dtype)
    if n % 128 != 0:
        # pad the output channels to the lane width (e.g. vocab 250054). The
        # pad is loop-invariant for decode weights, so XLA hoists it.
        pad = 128 - n % 128
        w_q = jnp.pad(w_q, ((0, 0), (0, pad)))
        scale = jnp.pad(scale, (0, pad))
        return int8_matmul(x, w_q, scale, block_m, block_n)[:, :n]

    bm = min(block_m, m)
    bn = min(block_n, n)
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
    )(x, w_q, scale.reshape(1, n))
