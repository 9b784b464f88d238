"""Label-smoothed cross-entropy, numerically matching the reference but
computed without materializing a (B, T, V) soft-label tensor.

The reference builds a smoothed one-hot and calls optax softmax CE
(main.py:658-680).  For V=250054 that materializes a second logits-sized
array; here the same value is computed from logsumexp + two gathers/sums:

  CE(smoothed)  = lse - [c * z_y + l * (sum_z - z_y)]         (c=confidence,
  loss          = CE - normalizing_constant                    l=low_conf)

which is algebraically identical (verified against a numpy oracle in
tests/test_train.py) and fuses into the logits computation under XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp


def _forward(logits, labels, mask, label_smoothing):
    logits32 = logits.astype(jnp.float32)
    vocab = logits.shape[-1]
    confidence = 1.0 - label_smoothing
    low_confidence = label_smoothing / (vocab - 1)

    lse = logsumexp(logits32, axis=-1)                              # (B, T)
    label_logit = jnp.take_along_axis(logits32, labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        sum_logits = jnp.sum(logits32, axis=-1)
        expected_logit = (
            confidence * label_logit + low_confidence * (sum_logits - label_logit)
        )
        normalizing = -(
            confidence * jnp.log(confidence)
            + (vocab - 1) * low_confidence * jnp.log(low_confidence + 1e-20)
        )
    else:
        expected_logit = label_logit
        normalizing = 0.0

    loss = lse - expected_logit - normalizing
    # NOTE: mathematically >= 0 at label_smoothing=0. On TPU under this
    # environment's --xla_allow_excess_precision, the fused fwd+bwd graph can
    # report ~-5e-3 when the true CE is ~0 (observed only at convergence on a
    # trivially learnable task; standalone evaluation reproduces >= 0).
    mask = mask.astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.sum(mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def label_smoothed_cross_entropy(
    logits: jnp.ndarray,       # (B, T, V) any float dtype
    labels: jnp.ndarray,       # (B, T) int
    mask: jnp.ndarray,         # (B, T) 1 = counts toward the loss
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    return _forward(logits, labels, mask, label_smoothing)


def _ce_fwd(logits, labels, mask, label_smoothing):
    return _forward(logits, labels, mask, label_smoothing), (logits, labels, mask)


def _ce_bwd(label_smoothing, res, g):
    """Hand-written backward: dlogits = (softmax - smoothed_target) scaled,
    emitted directly in the logits dtype.  Guarantees the vocab-wide cotangent
    never materializes above the compute dtype (measured neutral vs AD at
    B=32 — current XLA already fuses the cast — kept for robustness across
    compiler versions and validated against the fused-CE grads)."""
    logits, labels, mask = res
    vocab = logits.shape[-1]
    confidence = 1.0 - label_smoothing
    low = label_smoothing / (vocab - 1) if label_smoothing > 0.0 else 0.0

    mask32 = mask.astype(jnp.float32)
    scale = (g / jnp.sum(mask32)) * mask32                          # (B, T)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, vocab, dtype=jnp.float32)
    target = low + (confidence - low) * onehot if label_smoothing > 0.0 else onehot
    dlogits = ((p - target) * scale[..., None]).astype(logits.dtype)
    zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return dlogits, zero(labels), zero(mask)


label_smoothed_cross_entropy.defvjp(_ce_fwd, _ce_bwd)
