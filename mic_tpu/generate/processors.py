"""Logits processors and warpers as pure (log_probs, cur_len) -> log_probs fns.

Functional equivalents of the processor assembly the reference builds from
``config.mbart_config`` (generation_clip_vision_utils.py:338-420): forced BOS,
forced EOS, min-length, plus the sampling warpers (temperature, top-k, top-p).
Each processor is shape-polymorphic over a leading batch-like prefix; inside
generation loops the logits are (..., vocab) float32 log-probabilities.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e7)

Processor = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (log_probs, cur_len)


def forced_token(position: int, token_id: int) -> Processor:
    """Force `token_id` when generating the token at `position` (0-based in the
    output sequence; the BOS language code sits at position 1, right after the
    decoder start token)."""

    def fn(log_probs, cur_len):
        # lax.cond, not jnp.where: the forced distribution is only
        # materialized on the one step it applies (V can be 250k wide).
        def force(lp):
            return jnp.full_like(lp, NEG_INF).at[..., token_id].set(0.0)

        return jax.lax.cond(cur_len == position, force, lambda lp: lp, log_probs)

    return fn


def forced_eos(max_length: int, eos_token_id: int) -> Processor:
    return forced_token(max_length - 1, eos_token_id)


def min_length(min_len: int, eos_token_id: int) -> Processor:
    """Disallow EOS while the sequence is shorter than `min_len`."""

    def fn(log_probs, cur_len):
        return jax.lax.cond(
            cur_len < min_len,
            lambda lp: lp.at[..., eos_token_id].set(NEG_INF),
            lambda lp: lp,
            log_probs,
        )

    return fn


def chain(processors: Sequence[Processor]) -> Processor:
    def fn(log_probs, cur_len):
        for p in processors:
            log_probs = p(log_probs, cur_len)
        return log_probs

    return fn


# ---------------------------------------------------------------------------
# sampling warpers (operate on raw logits before softmax)


def temperature_warper(temperature: float) -> Processor:
    def fn(logits, cur_len):
        del cur_len
        return logits / jnp.asarray(temperature, logits.dtype)

    return fn


def top_k_warper(k: int) -> Processor:
    def fn(logits, cur_len):
        del cur_len
        kk = min(k, logits.shape[-1])
        threshold = jnp.sort(logits, axis=-1)[..., -kk][..., None]
        return jnp.where(logits < threshold, NEG_INF, logits)

    return fn


def top_p_warper(p: float) -> Processor:
    def fn(logits, cur_len):
        del cur_len
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jnp.exp(
            sorted_logits - jnp.max(sorted_logits, axis=-1, keepdims=True)
        )
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds p (always keep the best)
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(cum[..., :1], jnp.bool_), cum[..., :-1] < p], axis=-1
        )
        cutoff = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        return jnp.where(logits < cutoff, NEG_INF, logits)

    return fn


def build_processors(
    *,
    max_length: int,
    min_len: int = 0,
    eos_token_id: int,
    forced_bos_token_id: int | None = None,
    forced_eos_token_id: int | None = None,
) -> Processor:
    procs = []
    if min_len > 0:
        procs.append(min_length(min_len, eos_token_id))
    if forced_bos_token_id is not None:
        procs.append(forced_token(1, forced_bos_token_id))
    if forced_eos_token_id is not None:
        procs.append(forced_eos(max_length, forced_eos_token_id))
    return chain(procs)


def build_warpers(*, temperature: float = 1.0, top_k: int = 0, top_p: float = 1.0) -> Processor:
    warps = []
    if temperature != 1.0:
        warps.append(temperature_warper(temperature))
    if top_k > 0:
        warps.append(top_k_warper(top_k))
    if top_p < 1.0:
        warps.append(top_p_warper(top_p))
    return chain(warps)
