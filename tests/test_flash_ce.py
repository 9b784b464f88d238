"""ops/flash_ce.py: the Pallas flash-CE kernels == the XLA chunked path.

Modes: "fwd" (flash forward + XLA backward), "1" (two-kernel flash
backward — measured slower end-to-end, kept opt-in) and "dl" (flash
forward + dl-materializing backward — the TPU default).  All are pinned
against the XLA chunked path, which test_fused_ce.py pins against the
unfused oracle.  Interpret mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.fused_ce import fused_lm_loss


def _inputs(b=2, t=16, d=128, v=997, dtype=jnp.bfloat16):
    # v deliberately ragged (not a multiple of any vocab chunk): exercises
    # the masked tail blocks in all three kernels
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(b, t, d)) * 0.5, dtype)
    emb = jnp.asarray(rng.normal(size=(v, d)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(b, t)).astype(np.int32))
    mask = jnp.asarray((rng.random((b, t)) > 0.2).astype(np.int32))
    return hidden, emb, bias, labels, mask


@pytest.mark.parametrize("mode", ["fwd", "1", "dl"])
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_flash_matches_xla_chunked(monkeypatch, mode, smoothing):
    hidden, emb, bias, labels, mask = _inputs()

    def run():
        f = lambda h, e, b: fused_lm_loss(  # noqa: E731
            h, e, b, labels, mask, smoothing, 64
        )
        return jax.value_and_grad(f, argnums=(0, 1, 2))(hidden, emb, bias)

    monkeypatch.setenv("MIC_TPU_FLASH_CE", "0")
    loss_ref, grads_ref = jax.jit(run)()
    monkeypatch.setenv("MIC_TPU_FLASH_CE", mode)
    loss_fl, grads_fl = jax.jit(run)()

    np.testing.assert_allclose(
        float(loss_fl), float(loss_ref), rtol=2e-5, atol=2e-5
    )
    for a, b_, name in zip(grads_fl, grads_ref, ["dh", "demb", "dbias"]):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        scale = np.abs(b_).max() + 1e-9
        np.testing.assert_allclose(
            a / scale, b_ / scale, rtol=0, atol=5e-3, err_msg=name
        )


def test_flash_forward_stats(monkeypatch):
    """lse / label_logit / sum_logits from the kernel == direct math."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "1")
    from mic_tpu.ops.flash_ce import flash_ce_forward

    rng = np.random.default_rng(1)
    n, d, v = 32, 128, 771
    h = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    emb = jnp.asarray(rng.normal(size=(v, d)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))
    lse, lbl, zsum = flash_ce_forward(h, emb, bias, labels, True)
    logits = np.asarray(h @ emb.T + bias, np.float64)
    lse_ref = np.log(np.exp(logits).sum(axis=1))
    np.testing.assert_allclose(np.asarray(lse, np.float64), lse_ref,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lbl), logits[np.arange(n), np.asarray(labels)],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(zsum), logits.sum(axis=1),
                               rtol=1e-4, atol=1e-3)
