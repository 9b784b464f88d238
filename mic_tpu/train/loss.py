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

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def label_smoothed_cross_entropy(
    logits: jnp.ndarray,       # (B, T, V) any float dtype
    labels: jnp.ndarray,       # (B, T) int
    mask: jnp.ndarray,         # (B, T) 1 = counts toward the loss
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    vocab = logits.shape[-1]
    confidence = 1.0 - label_smoothing
    low_confidence = label_smoothing / (vocab - 1)

    lse = logsumexp(logits, axis=-1)                                # (B, T)
    label_logit = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        sum_logits = jnp.sum(logits, axis=-1)
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
    mask = mask.astype(jnp.float32)
    return jnp.sum(loss * mask) / jnp.sum(mask)
