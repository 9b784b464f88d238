"""ops/small_attention.py == ops/attention.py's XLA path, values and grads.

The kernel replaces XLA's bqhd einsum lowering in the training step
(PERFORMANCE.md round 4); these tests pin forward and backward parity on
every mask shape the models produce: causal+padding (decoder), pure
padding, no mask (vision), plus the wrapper's T-padding (vision's 50) and
odd-batch padding.  Interpret mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.attention import _xla_attention
from mic_tpu.ops.small_attention import small_t_attention, supports


def make_qkv(b, t, h, d, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda k: (jax.random.normal(k, (b, t, h, d)) * 0.3).astype(dtype)  # noqa: E731
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


def causal_pad_mask(b, t, lengths):
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    pad = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    return causal[None, None] & pad[:, None, None, :]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("case", ["causal_pad", "pad_only", "none"])
def test_forward_matches_xla(dtype, case):
    b, t, h, d = 4, 64, 4, 64
    q, k, v = make_qkv(b, t, h, d, dtype)
    if case == "causal_pad":
        mask = causal_pad_mask(b, t, [64, 40, 64, 8])
    elif case == "pad_only":
        pad = jnp.arange(t)[None, :] < jnp.asarray([64, 50, 64, 32])[:, None]
        mask = jnp.broadcast_to(pad[:, None, None, :], (b, 1, t, t))
    else:
        mask = None
    assert supports(q, k, v, mask, 0.0, False)
    ref = _xla_attention(q, k, v, mask)
    got = small_t_attention(q, k, v, mask, interpret=True)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    # compare only rows that attend to something (fully-masked rows are
    # documented garbage with zero upstream gradient)
    valid = (
        np.asarray(mask.any(-1)[:, 0], bool) if mask is not None
        else np.ones((b, t), bool)
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[valid],
        np.asarray(ref, np.float32)[valid], rtol=tol, atol=tol,
    )


def test_grads_match_xla():
    b, t, h, d = 4, 64, 4, 64
    q, k, v = make_qkv(b, t, h, d, jnp.float32, seed=3)
    mask = causal_pad_mask(b, t, [64, 40, 16, 64])
    # project like the real layer so every grad path (dq, dk, dv) is hit
    w = jax.random.normal(jax.random.PRNGKey(9), (d * h, 8)) * 0.1

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            out = out * mask.any(-1).transpose(0, 2, 1)[..., None]  # zero padded rows
            return jnp.sum((out.reshape(b, t, h * d) @ w) ** 2)
        return f

    ref = jax.grad(loss(lambda q, k, v: _xla_attention(q, k, v, mask)),
                   argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(
        loss(lambda q, k, v: small_t_attention(q, k, v, mask, interpret=True)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_, name in zip(got, ref, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5,
            err_msg=name,
        )


def test_vision_shape_padding():
    """T=50 (vision), no mask: wrapper pads T and masks the padded keys."""
    b, t, h, d = 2, 50, 3, 64
    q, k, v = make_qkv(b, t, h, d, jnp.float32, seed=5)
    ref = _xla_attention(q, k, v, None)
    got = small_t_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_odd_batch_padding():
    b, t, h, d = 3, 64, 2, 64
    q, k, v = make_qkv(b, t, h, d, jnp.float32, seed=7)
    mask = causal_pad_mask(b, t, [64, 20, 44])
    ref = _xla_attention(q, k, v, mask)
    got = small_t_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_supports_gate():
    q, k, v = make_qkv(2, 64, 2, 64, jnp.float32)
    assert supports(q, k, v, None, 0.0, False)
    assert not supports(q, k, v, None, 0.1, False)      # dropout
    assert not supports(q, k, v, None, 0.0, True)       # return_weights
    q2, k2, v2 = make_qkv(2, 80, 2, 64, jnp.float32)
    assert not supports(q2, k2, v2, None, 0.0, False)   # T > 64
    qd, kd, vd = make_qkv(2, 64, 4, 32, jnp.float32)
    assert not supports(qd, kd, vd, None, 0.0, False)   # Dh != 64
