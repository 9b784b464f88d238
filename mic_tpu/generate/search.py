"""On-device autoregressive decoding: greedy, sampling, and beam search.

Everything runs as a single `lax.while_loop` over a typed NamedTuple state —
zero host round-trips per token (the property the reference gets from
generation_clip_vision_utils.py:665-990, rebuilt from scratch here, then
re-architected for TPU memory bandwidth).

The search drives a ``step_fn(token_ids, cache) -> (logits, cache)`` closure
(``token_ids`` (B,1), ``logits`` (B, vocab)); the model supplies the closure
and the initial DecoderCache (mic_tpu/models/captioner.py).

TPU-first design — the candidate-space pipeline
-----------------------------------------------
A naive beam step materializes log_softmax of (B·K, V) in f32, adds running
scores into a (B, K, V) tensor and reshapes it to (B, K·V) for one giant
top-k.  At V=250k that is ~0.5 GB of layout copies and broadcast writes per
token (profiled: ~60% of step time).  Instead:

- per-beam `top_k` runs directly on the raw (B·K, V) logits in their natural
  layout (row order == log-prob order, since log_softmax is monotone);
- true log-probs are recovered AFTER selection by subtracting a (B·K,) row
  logsumexp from just the 2K+1 surviving candidates;
- forced-BOS/EOS steps take a `lax.cond` branch that skips the top-k entirely,
  and min-length EOS-blocking filters candidates, not the vocab row
  (2K+1 per-beam candidates guarantee 2K survive the EOS filter);
- the KV cache is beam-reordered by a Pallas strided-DMA kernel
  (mic_tpu/ops/beam_permute.py), and cross-attention caches are never moved
  (beam-invariant).

Processor semantics (forced_bos/forced_eos/min_length) follow the reference's
HF processor stack (generation_clip_vision_utils.py:338-420) exactly; the
brute-force oracle test (tests/test_generate.py) pins the search to the
mathematical definition.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.knobs import experimental, override
from mic_tpu.generate.processors import NEG_INF, Processor, build_warpers
from mic_tpu.nn.cache import DecoderCache

from mic_tpu.ops.topk_lse import topk_log_probs


def _topk_mode(mode: str = "auto") -> str:
    """Candidate-selection strategy, resolved at TRACE time (not import time)
    so one process can compile both variants (tools/validate_fast_decode.py).
    ``mode`` is DecodeConfig.topk_mode ("auto" | "exact" | "approx");
    MIC_TPU_EXACT_TOPK=1 is the env override spelling for "exact" (resolved
    via core/knobs.py), and the measured-dead-end strategies hang off the
    MIC_TPU_EXPERIMENTAL registry.

    "auto" on TPU is `jax.lax.approx_max_k` (the hardware-native partial
    reduction, ~1.8 ms/step faster than the exact TopK custom-call at the
    flagship shapes) — validated BLEU-neutral on a converged flagship model
    (PERFORMANCE.md "Approx top-k validation"). On CPU the approx lowering IS
    exact top-k, so tests see identical bits.
    """
    if experimental("pallas_topk"):
        return "pallas"
    seg = experimental("segmented_topk")
    if seg:
        return f"segmented:{seg}"
    if override("MIC_TPU_EXACT_TOPK", "0") == "1" or mode == "exact":
        return "exact"
    if mode == "approx" or experimental("approx_topk"):
        return "approx"
    return "approx" if jax.default_backend() == "tpu" else "exact"


def _segmented_topk(logits: jnp.ndarray, k: int, seg: int):
    """Exact top-k via per-segment top-k then a top-k over segment winners.
    MEASURED NEGATIVE at flagship shapes (59.1 vs 88.5 captions/s/chip with
    seg=8192): XLA's full-width TopK custom-call wins. Env-gated reference
    (MIC_TPU_SEGMENTED_TOPK=<seg>)."""
    n, v = logits.shape
    pad = (-v) % seg
    if pad:
        fill = jnp.full((n, pad), jnp.finfo(jnp.float32).min, logits.dtype)
        logits = jnp.concatenate([logits, fill], axis=-1)
    segs = logits.shape[-1] // seg
    vals, ids = jax.lax.top_k(logits.reshape(n * segs, seg), k)
    base = (jnp.arange(segs, dtype=jnp.int32) * seg)[None, :, None]
    ids = (ids.reshape(n, segs, k) + base).reshape(n, segs * k)
    vals = vals.reshape(n, segs * k)
    top_vals, pick = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(ids, pick, axis=-1)

StepFn = Callable[[jnp.ndarray, DecoderCache], tuple[jnp.ndarray, DecoderCache]]


class CandidateHead(NamedTuple):
    """Fused candidate selection for greedy/beam search.

    When provided, ``step_fn`` returns the decoder's final HIDDEN states
    (N, D) instead of dense logits, and candidate selection runs through the
    fused LM-head kernel (ops/fused_head.py): one weight stream per step,
    logits never materialized.  Sampling still needs dense logits and does
    not use this.

    topk(hidden, k)      -> (log_probs (N, k) f32, ids (N, k) i32)
    token_lp(hidden, tok)-> (N,) log-prob of a single forced token id
    """

    topk: Callable
    token_lp: Callable
    vocab_size: int


class ProcessorSpec(NamedTuple):
    """Static description of the supported logits constraints."""

    forced: tuple[tuple[int, int], ...] = ()  # (position, token_id)
    min_length: int = 0
    eos_token_id: int = 2
    no_repeat_ngram: int = 0  # 0 disables

    def forced_token_at(self, cur_len: jnp.ndarray) -> jnp.ndarray:
        """-1 when no token is forced at this position."""
        tok = jnp.full((), -1, jnp.int32)
        for pos, tid in self.forced:
            tok = jnp.where(cur_len == pos, tid, tok)
        return tok


def _ngram_windows(seqs: jnp.ndarray, cur_len: jnp.ndarray, n: int):
    """All complete n-gram windows of each row's generated prefix.

    seqs (N, T) int32 (position 0 = start token, positions >= cur_len are
    pad), scalar cur_len, static n >= 2 -> (match (N, W), next_tok (N, W))
    with W = T - n + 1: match[i, t] is True iff the window starting at t is
    fully inside the generated prefix AND its first n-1 tokens equal the
    row's LAST n-1 generated tokens; next_tok[i, t] is the token that
    completed that window.  Emitting next_tok[i, t] where match[i, t] would
    repeat an n-gram — the HF NoRepeatNGramLogitsProcessor semantics the
    reference's generate surface accepts
    (generation_clip_vision_utils.py:369-388), computed with static shapes
    for the decode while_loop (no per-row Python n-gram dicts)."""
    nrow, t = seqs.shape
    w = t - n + 1
    # the row's last n-1 generated tokens; dynamic_slice clamps at 0 when
    # cur_len < n-1, where the window-validity mask below is empty anyway
    pref = jax.lax.dynamic_slice(
        seqs, (jnp.zeros((), jnp.int32), cur_len - (n - 1)), (nrow, n - 1)
    )
    match = jnp.ones((nrow, w), jnp.bool_)
    for j in range(n - 1):
        match &= seqs[:, j : j + w] == pref[:, j : j + 1]
    # a window starting at t is a complete PREVIOUS n-gram iff its last
    # token (t + n - 1) was generated before the current position
    match &= jnp.arange(w)[None, :] + n - 1 <= cur_len - 1
    return match, seqs[:, n - 1 : n - 1 + w]


def _ngram_ban_candidates(
    cand_lp: jnp.ndarray,   # (N, k) f32
    cand_ids: jnp.ndarray,  # (N, k) i32
    seqs: jnp.ndarray,      # (N, T) rows aligned with the candidates
    cur_len: jnp.ndarray,
    n: int,
) -> jnp.ndarray:
    """Candidate-space no-repeat-ngram: NEG_INF any candidate that would
    complete an already-generated n-gram.  Exact whenever the banned tokens
    of a row lie inside its top-k candidates (k is widened by the callers
    when the ban is active); a banned token outside the candidate set was
    never selectable anyway."""
    match, nxt = _ngram_windows(seqs, cur_len, n)
    banned = jnp.any(
        match[:, None, :] & (nxt[:, None, :] == cand_ids[:, :, None]), axis=-1
    )
    return jnp.where(banned, NEG_INF, cand_lp)


def _ngram_ban_dense(
    log_probs: jnp.ndarray,  # (N, V)
    seqs: jnp.ndarray,       # (N, T)
    cur_len: jnp.ndarray,
    n: int,
) -> jnp.ndarray:
    """Dense-vocab no-repeat-ngram (sampling path): scatter-min NEG_INF at
    every banned completion token."""
    match, nxt = _ngram_windows(seqs, cur_len, n)
    rows = jnp.arange(log_probs.shape[0])[:, None]
    vals = jnp.where(match, NEG_INF, jnp.inf).astype(log_probs.dtype)
    return log_probs.at[rows, nxt].min(vals)


class GenerateOutput(NamedTuple):
    sequences: jnp.ndarray  # (B, max_length) int32, pad-filled after EOS
    scores: jnp.ndarray     # (B,) float32 — sequence log-prob (beam: penalized)


def _force_eos_candidates(
    cand_lp: jnp.ndarray,   # (N, k) f32
    cand_ids: jnp.ndarray,  # (N, k) i32
    cur_len: jnp.ndarray,
    eos_rows: jnp.ndarray,  # (N,) i32 per-row pinned EOS position
    eos_token_id: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pinned-length decoding: a row's sequence ends with EOS at EXACTLY its
    pinned position — EOS candidates are banned before it (per-row min-length
    semantics; top-k ids are distinct, so at most one candidate per row is
    banned and the 2K-wide pool stays viable), and at/after it the slate is
    replaced by EOS at slot 0 (log-prob 0, the rest NEG_INF), so the row
    finishes there and the search's real early-exit machinery (the while
    cond) takes over.

    Deliberately applied AFTER candidate selection: the per-step compute
    (decoder step, LM head, top-k) is unchanged, so a pinned-length run
    measures exactly the work a model that emits EOS at those positions
    would do — the deterministic stand-in for trained-weights early exit
    (reference early-stopping surface:
    generation_clip_vision_utils.py:910-940)."""
    early = (cur_len < eos_rows)[:, None] & (cand_ids == eos_token_id)
    cand_lp = jnp.where(early, NEG_INF, cand_lp)
    force = (cur_len >= eos_rows)[:, None]
    slot0 = (jnp.arange(cand_lp.shape[-1]) == 0)[None, :]
    lp = jnp.where(force, jnp.where(slot0, 0.0, NEG_INF), cand_lp)
    ids = jnp.where(force, eos_token_id, cand_ids)
    return lp, ids


def _logsumexp(logits32: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(logits32, axis=-1)
    return m + jnp.log(jnp.sum(jnp.exp(logits32 - m[..., None]), axis=-1))


def _candidates(
    logits: jnp.ndarray,          # (N, V) raw logits — or (N, D) hidden
    k: int,                       # states when `head` is provided
    cur_len: jnp.ndarray,
    spec: ProcessorSpec,
    head: Optional[CandidateHead] = None,
    seqs: Optional[jnp.ndarray] = None,  # (N, T) — no_repeat_ngram only
    topk_mode: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k candidate (log_probs (N,k), token_ids (N,k)) per row, honoring
    forced tokens (cond branch, no top-k), min-length EOS blocking, and
    no-repeat-ngram banning (candidate-space — see _ngram_ban_candidates)."""
    n = logits.shape[0]
    forced_tok = spec.forced_token_at(cur_len)

    def _post(cand_lp, cand_ids):
        if spec.min_length > 0:
            blocked = (cur_len < spec.min_length) & (
                cand_ids == spec.eos_token_id
            )
            cand_lp = jnp.where(blocked, NEG_INF, cand_lp)
        if spec.no_repeat_ngram > 0 and seqs is not None:
            cand_lp = _ngram_ban_candidates(
                cand_lp, cand_ids, seqs, cur_len, spec.no_repeat_ngram
            )
        return cand_lp, cand_ids

    if head is not None:
        def normal_h(_):
            lp, ids = head.topk(logits, k)
            return lp, ids.astype(jnp.int32)

        def forced_h(tok):
            val = head.token_lp(logits, tok).astype(jnp.float32)  # (N,)
            ids = jnp.full((n, k), tok, jnp.int32)
            vals = jnp.concatenate(
                [val[:, None], jnp.full((n, k - 1), NEG_INF, jnp.float32)],
                axis=-1,
            )
            return vals, ids

        if spec.forced:
            cand_lp, cand_ids = jax.lax.cond(
                forced_tok >= 0, forced_h, normal_h, forced_tok
            )
        else:
            cand_lp, cand_ids = normal_h(None)
        return _post(cand_lp, cand_ids)

    mode = _topk_mode(topk_mode)

    def normal(_):
        if mode == "pallas":
            # fused Pallas top-k+logsumexp pass (ops/topk_lse.py); currently
            # ~12% slower than XLA's TopK custom-call at the flagship shapes
            # (the in-kernel K-step select-and-mask is VPU-bound), so opt-in
            return topk_log_probs(logits, k)
        lse = _logsumexp(logits.astype(jnp.float32))
        if mode == "approx":
            # TPU-native approximate top-k (per-candidate recall ~0.95,
            # BLEU-validated — see _topk_mode); exact on CPU
            vals, ids = jax.lax.approx_max_k(logits.astype(jnp.float32), k)
        elif mode.startswith("segmented:"):
            vals, ids = _segmented_topk(logits, k, int(mode.split(":")[1]))
        else:
            # top_k on raw (usually bf16) logits: monotone under the f32 cast.
            # XLA's TopK takes a pathologically slow path for tiny k at this
            # width (measured 27 ms for k=2 vs 2.2 ms for k=9 on (64, 250054)
            # bf16) — always request >=8 and slice.
            kk = min(max(k, 8), logits.shape[-1])
            vals, ids = jax.lax.top_k(logits, kk)
            vals, ids = vals[:, :k], ids[:, :k]
        return vals.astype(jnp.float32) - lse[:, None], ids

    def forced(tok):
        lse = _logsumexp(logits.astype(jnp.float32))
        ids = jnp.full((n, k), tok, jnp.int32)
        val = (
            jnp.take_along_axis(logits, ids[:, :1], axis=-1).astype(jnp.float32)
            - lse[:, None]
        )
        vals = jnp.concatenate(
            [val, jnp.full((n, k - 1), NEG_INF, jnp.float32)], axis=-1
        )
        return vals, ids

    if spec.forced:
        cand_lp, cand_ids = jax.lax.cond(
            forced_tok >= 0, forced, normal, forced_tok
        )
    else:
        cand_lp, cand_ids = normal(None)
    return _post(cand_lp, cand_ids.astype(jnp.int32))


# ---------------------------------------------------------------------------
# greedy & sampling


def _run_segmented(cond, body, state, cache_segments: tuple):
    """Drive the decode while_loop in phases over growing cache sizes.

    With ``cache_segments`` (increasing static cache lengths, the last one
    covering max_length-1 write positions), each phase is its own while_loop
    whose traced body sees that phase's SMALLER static cache shape — early
    steps stream a prefix-sized K/V cache instead of the full max_length
    buffer.  Between phases the cache is padded once (cache.grow).  Unlike
    the measured-slower lax.switch read-prefix buckets (PERFORMANCE.md), the
    per-phase shapes are genuinely different arrays, so XLA cannot
    re-materialize sliced operands around branches — there are no branches.

    The phase bound is ``cur_len <= seg``: the body at cur_len writes cache
    position cur_len-1, so a phase with cache length ``seg`` can safely run
    through cur_len == seg."""
    if not cache_segments:
        return jax.lax.while_loop(cond, body, state)
    for i, seg in enumerate(cache_segments):
        last = i == len(cache_segments) - 1
        if last:
            seg_cond = cond
        else:
            def seg_cond(s, _seg=seg):
                return cond(s) & (s.cur_len <= _seg)
        state = jax.lax.while_loop(seg_cond, body, state)
        if not last:
            state = state._replace(
                cache=state.cache.grow(cache_segments[i + 1])
            )
    return state


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
    start_token_id,
    eos_token_id: int,
    pad_token_id: int,
    spec: ProcessorSpec,
    do_sample: bool,
    warpers: Processor,
    rng: Optional[jax.Array],
    head: Optional[CandidateHead] = None,
    cache_segments: tuple = (),
    eos_positions: Optional[jnp.ndarray] = None,
    topk_mode: str = "auto",
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
        if do_sample:
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp = _apply_spec_dense(log_probs, s.cur_len, spec, s.sequences)
            if eos_positions is not None:
                # pinned lengths: ban EOS before the row's position, force at it
                early = s.cur_len < eos_positions
                lp = lp.at[:, eos_token_id].set(
                    jnp.where(early, NEG_INF, lp[:, eos_token_id])
                )
            warped = warpers(lp, s.cur_len)
            rng, key = jax.random.split(s.rng)
            token = jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)
            token_score = jnp.take_along_axis(lp, token[:, None], axis=-1)[:, 0]
        else:
            rng = s.rng
            # top-2 candidates: enough to skip EOS under min_length; widened
            # when no-repeat-ngram banning can knock out more of the head
            kg = 2 if spec.no_repeat_ngram == 0 else min(
                8, head.vocab_size if head is not None else logits.shape[-1]
            )
            cand_lp, cand_ids = _candidates(
                logits, kg, s.cur_len, spec, head, seqs=s.sequences,
                topk_mode=topk_mode,
            )
            if eos_positions is not None:
                cand_lp, cand_ids = _force_eos_candidates(
                    cand_lp, cand_ids, s.cur_len, eos_positions, eos_token_id
                )
            # candidates arrive best-first; bans set NEG_INF, so argmax picks
            # the best surviving candidate
            pick = jnp.argmax(cand_lp, axis=-1)
            token = jnp.take_along_axis(cand_ids, pick[:, None], axis=-1)[:, 0]
            token_score = jnp.take_along_axis(
                cand_lp, pick[:, None], axis=-1
            )[:, 0]
        if do_sample and eos_positions is not None:
            force = s.cur_len >= eos_positions
            token = jnp.where(force, eos_token_id, token)
            token_score = jnp.where(force, 0.0, token_score)
        token = jnp.where(s.is_finished, pad_token_id, token).astype(jnp.int32)
        scores = s.scores + jnp.where(s.is_finished, 0.0, token_score)
        sequences = jax.lax.dynamic_update_slice(
            s.sequences, token[:, None], (0, s.cur_len)
        )
        is_finished = s.is_finished | (token == eos_token_id)
        return _SeqState(s.cur_len + 1, sequences, scores, is_finished, cache, rng)

    # Unroll the first step so XLA specializes the cache-fill at index 0.
    state = body(init)
    state = _run_segmented(cond, body, state, cache_segments)
    return GenerateOutput(sequences=state.sequences, scores=state.scores)


def _apply_spec_dense(log_probs, cur_len, spec: ProcessorSpec, seqs=None):
    """Dense-vocab application of the spec (sampling path only)."""
    if spec.no_repeat_ngram > 0 and seqs is not None:
        log_probs = _ngram_ban_dense(
            log_probs, seqs, cur_len, spec.no_repeat_ngram
        )
    forced_tok = spec.forced_token_at(cur_len)
    if spec.forced:
        def force(lp):
            out = jnp.full_like(lp, NEG_INF)
            return jnp.where(
                jax.nn.one_hot(forced_tok, lp.shape[-1], dtype=jnp.bool_),
                0.0, out,
            )

        log_probs = jax.lax.cond(
            forced_tok >= 0, force, lambda lp: lp, log_probs
        )
    if spec.min_length > 0:
        log_probs = jax.lax.cond(
            cur_len < spec.min_length,
            lambda lp: lp.at[..., spec.eos_token_id].set(NEG_INF),
            lambda lp: lp,
            log_probs,
        )
    return log_probs


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
    start_token_id,
    eos_token_id: int,
    pad_token_id: int,
    spec: ProcessorSpec,
    length_penalty: float,
    early_stopping: bool,
    head: Optional[CandidateHead] = None,
    cache_segments: tuple = (),
    eos_positions: Optional[jnp.ndarray] = None,
    topk_mode: str = "auto",
) -> GenerateOutput:
    K = num_beams
    B = batch
    eos_rows = (
        jnp.repeat(eos_positions.astype(jnp.int32), K)
        if eos_positions is not None else None
    )
    running_sequences = jnp.full((B, K, max_length), pad_token_id, jnp.int32)
    running_sequences = running_sequences.at[:, :, 0].set(start_token_id)
    # only beam 0 is live at the start; clones would waste the candidate pool
    running_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)
    )

    init = _BeamState(
        cur_len=jnp.asarray(1, jnp.int32),
        running_sequences=running_sequences,
        running_scores=running_scores,
        sequences=jnp.full((B, K, max_length), pad_token_id, jnp.int32),
        scores=jnp.full((B, K), NEG_INF, jnp.float32),
        is_finished=jnp.zeros((B, K), jnp.bool_),
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
        prev = jax.lax.dynamic_slice_in_dim(
            s.running_sequences, s.cur_len - 1, 1, axis=2
        ).reshape(B * K, 1)
        logits, cache = step_fn(prev, s.cache)
        vocab = head.vocab_size if head is not None else logits.shape[-1]

        # per-beam candidates in the natural (B*K, V) layout; 2K+1 so that
        # min-length EOS filtering still leaves 2K viable candidates (plus
        # slack when no-repeat-ngram banning can knock out more of the pool)
        kc = min(2 * K + 1 + (4 if spec.no_repeat_ngram else 0), vocab)
        cand_lp, cand_ids = _candidates(
            logits, kc, s.cur_len, spec, head,
            seqs=s.running_sequences.reshape(B * K, -1),
            topk_mode=topk_mode,
        )
        if eos_rows is not None:
            cand_lp, cand_ids = _force_eos_candidates(
                cand_lp, cand_ids, s.cur_len, eos_rows, eos_token_id
            )
        cand_total = cand_lp + s.running_scores.reshape(B * K, 1)

        # global 2K candidates per batch group from the tiny K*kc pool
        topk_scores, topk_flat = jax.lax.top_k(
            cand_total.reshape(B, K * kc), k=2 * K
        )
        topk_beam = topk_flat // kc                               # (B, 2K)
        topk_token = jnp.take_along_axis(
            cand_ids.reshape(B, K * kc), topk_flat, axis=1
        )
        topk_sequences = _gather_beams(s.running_sequences, topk_beam)
        topk_sequences = jax.lax.dynamic_update_slice(
            topk_sequences, topk_token[:, :, None], (0, 0, s.cur_len)
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

        # reorder the flat (B*K) cache to follow the chosen running beams —
        # strategy lives on the cache type: DecoderCache physically permutes
        # rows (one-hot matmul over the batch axis; cross-attn caches are
        # beam-invariant within a group and never move), LazyDecoderCache
        # just composes its ancestry indices (zero cache movement)
        src_beam = _gather_beams(topk_beam[:, :, None], running_pick)[:, :, 0]
        cache = cache.beam_reorder(src_beam, K)

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
    state = _run_segmented(cond, body, state, cache_segments)

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
    start_token_id,
    eos_token_id: int,
    pad_token_id: int,
    num_beams: int = 1,
    do_sample: bool = False,
    spec: Optional[ProcessorSpec] = None,
    warpers: Optional[Processor] = None,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    rng: Optional[jax.Array] = None,
    head: Optional[CandidateHead] = None,
    cache_segments: tuple = (),
    eos_positions: Optional[jnp.ndarray] = None,
    topk_mode: str = "auto",
) -> GenerateOutput:
    """Dispatch greedy / sample / beam search (reference surface:
    generation_clip_vision_utils.py:128-336). `cache.batch` must equal `batch`
    for greedy/sample and `batch * num_beams` for beam search.

    ``cache_segments``: optional increasing static cache lengths for phased
    decoding (see _run_segmented); the passed-in cache must be sized to
    ``cache_segments[0]`` and the last segment must cover max_length-1.

    ``eos_positions``: optional (batch,) int32 pinned per-row EOS positions
    (must be >= 2 when a BOS token is forced at position 1): row b emits EOS
    at output position eos_positions[b] and finishes there, exercising the
    real on-device early-exit path deterministically — the serving-protocol
    stand-in for trained-weights early stopping (see _force_eos_candidates)."""
    spec = spec or ProcessorSpec(eos_token_id=eos_token_id)
    warpers = warpers or build_warpers()
    if num_beams > 1:
        if do_sample:
            raise NotImplementedError("beam sampling is not supported")
        return _beam_search(
            step_fn, cache, batch, num_beams,
            max_length=max_length, start_token_id=start_token_id,
            eos_token_id=eos_token_id, pad_token_id=pad_token_id,
            spec=spec, length_penalty=length_penalty,
            early_stopping=early_stopping, head=head,
            cache_segments=cache_segments, eos_positions=eos_positions,
            topk_mode=topk_mode,
        )
    return _sequential_search(
        step_fn, cache, batch,
        max_length=max_length, start_token_id=start_token_id,
        eos_token_id=eos_token_id, pad_token_id=pad_token_id,
        spec=spec, do_sample=do_sample, warpers=warpers, rng=rng,
        head=None if do_sample else head,
        cache_segments=cache_segments, eos_positions=eos_positions,
        topk_mode=topk_mode,
    )
