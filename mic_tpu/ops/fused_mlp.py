"""Pallas kernel: fused decode-step MLP (fc1 -> gelu -> fc2).

The decode step's MLP block runs at ~139 us/layer under XLA at the flagship
shape (1024 rows x 1024 -> 4096 -> 1024) against an ~88 us MXU floor — the
gap is the exact-erf gelu on the (1024, 4096) intermediate (~4.2 M
transcendentals) plus the LayerNorm glue XLA fuses into the same kOutput
fusion, which serialize against the two GEMMs.

This kernel streams the fc1/fc2 weights in F-column chunks (grid over
ffn_dim): chunk j computes  h_j = gelu(x @ W1[:, j] + b1[j])  and
accumulates  h_j @ W2[j, :]  into an f32 VMEM scratch, so chunk j's VPU
gelu overlaps chunk j±1's MXU work and the (N, F) intermediate never
exists — not in HBM, not even whole in VMEM.  x stays resident across
chunks (constant index_map).

Numerics: fc1 matches nn/layers.py dense exactly (f32 MXU accumulate ->
bf16 cast -> bf16 bias add) and gelu runs the same jax.nn.gelu
formulation; fc2 accumulates its F-chunk partials in f32, where XLA's
single dot accumulates over the full F inside the MXU — same f32 math at
a different summation granularity, so outputs can differ in the last ulp
(tested to tight tolerance, not bit-equality).

Reference behavior being replaced: HF FlaxMBartDecoderLayer's fc1/fc2
(/root/reference/models/flax_clip_vision_mbart/modeling_clip_vision_mbart.py)
run per decode step inside the generate loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mic_tpu.nn.layers import ACTIVATIONS


def _erf(z):
    """f32 erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7 exact,
    ~2.6e-6 in f32 evaluation): Mosaic has no erf/erfc lowering.  The error
    is ~3 orders of magnitude below bf16 resolution, so gelu outputs round
    to the same bf16 values as XLA's erfc-based formulation for all but
    rare rounding-boundary cases (one-ulp differences, beneath bf16
    compute noise)."""
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(z < 0, -e, e)


def _gelu_erf(x):
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))).astype(
        x.dtype
    )


def _act_fn(activation: str):
    # exact gelu needs the in-kernel erf; tanh/sigmoid variants lower fine
    return _gelu_erf if activation == "gelu" else ACTIVATIONS[activation]


def _kernel(act, nf, b1_ref, b2_ref, x_ref, w1_ref, w2_ref, o_ref):
    j = pl.program_id(0)
    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_ref.dtype)
    h = act(h + b1_ref[:].astype(x_ref.dtype))
    part = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _():
        o_ref[:] = part + b2_ref[:].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        o_ref[:] += part


@functools.partial(jax.jit, static_argnums=(5, 6))
def fused_mlp(
    x: jnp.ndarray,    # (N, D)
    w1: jnp.ndarray,   # (D, F)
    b1: jnp.ndarray,   # (F,)
    w2: jnp.ndarray,   # (F, D)
    b2: jnp.ndarray,   # (D,)
    activation: str = "gelu",
    interpret: bool = False,
) -> jnp.ndarray:
    """-> act(x @ w1 + b1) @ w2 + b2, the (N, F) intermediate chunked away."""
    n, d = x.shape
    f = w1.shape[1]
    # the f32 accumulator IS the (revisited) output block — a separate
    # scratch put FC=512 248 KB over the 16 MB VMEM scoped limit at N=1024
    fc = 512 if f % 512 == 0 else f
    nf = f // fc
    kern = functools.partial(_kernel, _act_fn(activation), nf)
    return pl.pallas_call(
        kern,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((1, fc), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, fc), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((fc, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, d), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * d * f,
            bytes_accessed=2 * (2 * d * f) + 2 * 2 * n * d,
            transcendentals=n * f,
        ),
    )(
        b1.reshape(1, f).astype(x.dtype), b2.reshape(1, d).astype(x.dtype),
        x, w1.astype(x.dtype), w2.astype(x.dtype),
    ).astype(x.dtype)
