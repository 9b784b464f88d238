"""On-device autoregressive decoding: greedy, sampling, and beam search.

Everything runs as a single `lax.while_loop` over a typed NamedTuple state —
zero host round-trips per token (the property the reference gets from
generation_clip_vision_utils.py:665-990, rebuilt from scratch here).

The search is model-agnostic: it drives a ``step_fn(token_ids, cache) ->
(logits, cache)`` closure, where ``token_ids`` is (B, 1) and ``logits`` is
(B, vocab).  The model supplies the closure and the initial DecoderCache
(mic_tpu/models/captioner.py).  Beam search keeps 2·K candidates per step,
applies a length penalty, supports early stopping, and reorders the stacked
KV cache with one gather (DecoderCache.reorder).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mic_tpu.nn.cache import DecoderCache
from mic_tpu.generate.processors import NEG_INF, Processor

StepFn = Callable[[jnp.ndarray, DecoderCache], tuple[jnp.ndarray, DecoderCache]]


class GenerateOutput(NamedTuple):
    sequences: jnp.ndarray  # (B, max_length) int32, pad-filled after EOS
    scores: jnp.ndarray     # (B,) float32 — sequence log-prob (beam: penalized)


def _identity(log_probs, cur_len):
    del cur_len
    return log_probs


# ---------------------------------------------------------------------------
# greedy & sampling


class _SeqState(NamedTuple):
    cur_len: jnp.ndarray
    sequences: jnp.ndarray
    scores: jnp.ndarray
    is_finished: jnp.ndarray
    cache: DecoderCache
    rng: jnp.ndarray


def _sequential_search(
    step_fn: StepFn,
    cache: DecoderCache,
    batch: int,
    *,
    max_length: int,
    start_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    processors: Processor,
    do_sample: bool,
    warpers: Processor,
    rng: Optional[jax.Array],
) -> GenerateOutput:
    sequences = jnp.full((batch, max_length), pad_token_id, jnp.int32)
    sequences = sequences.at[:, 0].set(start_token_id)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    init = _SeqState(
        cur_len=jnp.asarray(1, jnp.int32),
        sequences=sequences,
        scores=jnp.zeros((batch,), jnp.float32),
        is_finished=jnp.zeros((batch,), jnp.bool_),
        cache=cache,
    rng=rng,
    )

    def cond(s: _SeqState):
        return (s.cur_len < max_length) & ~jnp.all(s.is_finished)

    def body(s: _SeqState):
        prev = jax.lax.dynamic_slice_in_dim(s.sequences, s.cur_len - 1, 1, axis=1)
        logits, cache = step_fn(prev, s.cache)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        log_probs = processors(log_probs, s.cur_len)
        if do_sample:
            warped = warpers(log_probs, s.cur_len)
            rng, key = jax.random.split(s.rng)
            token = jax.random.categorical(key, warped, axis=-1)
        else:
            rng = s.rng
            token = jnp.argmax(log_probs, axis=-1)
        token_score = jnp.take_along_axis(log_probs, token[:, None], axis=-1)[:, 0]
        token = jnp.where(s.is_finished, pad_token_id, token).astype(jnp.int32)
        scores = s.scores + jnp.where(s.is_finished, 0.0, token_score)
        sequences = jax.lax.dynamic_update_slice(
            s.sequences, token[:, None], (0, s.cur_len)
        )
        is_finished = s.is_finished | (token == eos_token_id)
        return _SeqState(s.cur_len + 1, sequences, scores, is_finished, cache, rng)

    # Unroll the first step so XLA specializes the cache-fill at index 0.
    state = body(init)
    state = jax.lax.while_loop(cond, body, state)
    return GenerateOutput(sequences=state.sequences, scores=state.scores)


# ---------------------------------------------------------------------------
# beam search


class _BeamState(NamedTuple):
    cur_len: jnp.ndarray
    running_sequences: jnp.ndarray  # (B, K, T)
    running_scores: jnp.ndarray     # (B, K)
    sequences: jnp.ndarray          # (B, K, T) finished
    scores: jnp.ndarray             # (B, K) penalized finished scores
    is_finished: jnp.ndarray        # (B, K)
    cache: DecoderCache             # batch axis flattened to B*K


def _gather_beams(x: jnp.ndarray, beam_indices: jnp.ndarray) -> jnp.ndarray:
    """x: (B, K, ...), beam_indices: (B, J) -> (B, J, ...)."""
    return jnp.take_along_axis(
        x, beam_indices.reshape(beam_indices.shape + (1,) * (x.ndim - 2)), axis=1
    )


def _beam_search(
    step_fn: StepFn,
    cache: DecoderCache,
    batch: int,
    num_beams: int,
    *,
    max_length: int,
    start_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    processors: Processor,
    length_penalty: float,
    early_stopping: bool,
) -> GenerateOutput:
    K = num_beams
    running_sequences = jnp.full((batch, K, max_length), pad_token_id, jnp.int32)
    running_sequences = running_sequences.at[:, :, 0].set(start_token_id)
    # only beam 0 is live at the start; clones would waste the candidate pool
    running_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (batch, 1)
    )

    init = _BeamState(
        cur_len=jnp.asarray(1, jnp.int32),
        running_sequences=running_sequences,
        running_scores=running_scores,
        sequences=jnp.full((batch, K, max_length), pad_token_id, jnp.int32),
        scores=jnp.full((batch, K), NEG_INF, jnp.float32),
        is_finished=jnp.zeros((batch, K), jnp.bool_),
        cache=cache,
    )

    def cond(s: _BeamState):
        not_max_len = s.cur_len < max_length
        if early_stopping:
            best_running = s.running_scores[:, :1] / (max_length**length_penalty)
        else:
            best_running = s.running_scores[:, :1] / (
                s.cur_len.astype(jnp.float32) ** length_penalty
            )
        worst_finished = jnp.min(
            jnp.where(s.is_finished, s.scores, NEG_INF), axis=1, keepdims=True
        )
        improvement_possible = jnp.any(worst_finished < best_running)
        still_open = ~(jnp.all(s.is_finished) & early_stopping)
        return not_max_len & improvement_possible & still_open

    def body(s: _BeamState):
        B = batch
        prev = jax.lax.dynamic_slice_in_dim(
            s.running_sequences, s.cur_len - 1, 1, axis=2
        ).reshape(B * K, 1)
        logits, cache = step_fn(prev, s.cache)
        vocab = logits.shape[-1]
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        log_probs = log_probs.reshape(B, K, vocab)
        log_probs = processors(log_probs, s.cur_len)
        log_probs = log_probs + s.running_scores[:, :, None]

        # 2K candidates so that even if K beams finish, K running ones remain
        topk_scores, topk_flat = jax.lax.top_k(
            log_probs.reshape(B, K * vocab), k=2 * K
        )
        topk_beam = topk_flat // vocab            # (B, 2K) source beam
        topk_token = topk_flat % vocab            # (B, 2K)
        topk_sequences = _gather_beams(s.running_sequences, topk_beam)
        topk_sequences = jax.lax.dynamic_update_slice(
            topk_sequences, topk_token[:, :, None].astype(jnp.int32), (0, 0, s.cur_len)
        )
        just_finished = topk_token == eos_token_id

        # next running beams: best K candidates that did NOT just emit EOS
        running_cand_scores = topk_scores + just_finished * NEG_INF
        next_running_scores, running_pick = jax.lax.top_k(running_cand_scores, k=K)
        next_running_sequences = _gather_beams(topk_sequences, running_pick)

        # fold just-finished candidates into the finished set (length penalty)
        beams_full = jnp.all(s.is_finished, axis=1, keepdims=True) & early_stopping
        finished_cand_scores = topk_scores / (
            (s.cur_len + 1).astype(jnp.float32) ** length_penalty
        )
        finished_cand_scores += (~just_finished | beams_full) * NEG_INF
        merged_scores = jnp.concatenate([s.scores, finished_cand_scores], axis=1)
        merged_sequences = jnp.concatenate([s.sequences, topk_sequences], axis=1)
        merged_finished = jnp.concatenate(
            [s.is_finished, just_finished & ~beams_full], axis=1
        )
        next_scores, keep = jax.lax.top_k(merged_scores, k=K)
        next_sequences = _gather_beams(merged_sequences, keep)
        next_is_finished = jnp.take_along_axis(merged_finished, keep, axis=1)

        # reorder the flat (B*K) cache to follow the chosen running beams
        src_beam = _gather_beams(topk_beam[:, :, None], running_pick)[:, :, 0]
        flat_idx = (jnp.arange(B)[:, None] * K + src_beam).reshape(B * K)
        cache = cache.reorder(flat_idx)

        return _BeamState(
            cur_len=s.cur_len + 1,
            running_sequences=next_running_sequences,
            running_scores=next_running_scores,
            sequences=next_sequences,
            scores=next_scores,
            is_finished=next_is_finished,
            cache=cache,
        )

    state = body(init)  # first step unrolled (cache fill at index 0)
    state = jax.lax.while_loop(cond, body, state)

    # batches with no finished beam fall back to the best running beam
    none_finished = ~jnp.any(state.is_finished, axis=1)
    final_penalty = state.cur_len.astype(jnp.float32) ** length_penalty
    running_penalized = state.running_scores / final_penalty
    sequences = jnp.where(
        none_finished[:, None, None], state.running_sequences, state.sequences
    )
    scores = jnp.where(none_finished[:, None], running_penalized, state.scores)
    best = jnp.argmax(scores, axis=1)
    return GenerateOutput(
        sequences=jnp.take_along_axis(sequences, best[:, None, None], axis=1)[:, 0],
        scores=jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0],
    )


# ---------------------------------------------------------------------------
# dispatcher


def generate(
    step_fn: StepFn,
    cache: DecoderCache,
    batch: int,
    *,
    max_length: int,
    start_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    num_beams: int = 1,
    do_sample: bool = False,
    processors: Processor = _identity,
    warpers: Processor = _identity,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    rng: Optional[jax.Array] = None,
) -> GenerateOutput:
    """Dispatch greedy / sample / beam search (reference surface:
    generation_clip_vision_utils.py:128-336). `cache.batch` must equal `batch`
    for greedy/sample and `batch * num_beams` for beam search."""
    if num_beams > 1:
        if do_sample:
            raise NotImplementedError("beam sampling is not supported")
        return _beam_search(
            step_fn, cache, batch, num_beams,
            max_length=max_length, start_token_id=start_token_id,
            eos_token_id=eos_token_id, pad_token_id=pad_token_id,
            processors=processors, length_penalty=length_penalty,
            early_stopping=early_stopping,
        )
    return _sequential_search(
        step_fn, cache, batch,
        max_length=max_length, start_token_id=start_token_id,
        eos_token_id=eos_token_id, pad_token_id=pad_token_id,
        processors=processors, do_sample=do_sample, warpers=warpers, rng=rng,
    )
