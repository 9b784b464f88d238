"""Generation tests: brute-force beam-search oracle, forced tokens, sampling.

The beam-search oracle enumerates EVERY possible output sequence on a tiny
vocab, scores it exactly the way the search defines a hypothesis score
(sum of log-probs; length penalty at EOS), and checks the beam returns the
global optimum when the beam is wide enough to be exhaustive.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
from mic_tpu.models.captioner import Captioner

VOCAB = 8
MAXLEN = 4  # start token + 3 generated positions


@pytest.fixture(scope="module")
def setup():
    config = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(vocab_size=VOCAB, max_position_embeddings=16),
        tie_word_embeddings=True,
    )
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(7))
    px = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    return model, params, jnp.asarray(px)


def all_log_probs(model, params, enc, prefix_ids):
    """Teacher-forced next-token log-probs at every position of prefix_ids."""
    B, T = prefix_ids.shape
    logits = model.decode_train(
        params, enc, jnp.asarray(prefix_ids), jnp.ones((B, T), jnp.int32)
    )
    return np.asarray(jax.nn.log_softmax(logits, axis=-1))


def brute_force_best(model, params, enc_row, start, eos, length_penalty):
    """Exhaustively score all token sequences for ONE image (one batched call)."""
    all_toks = np.asarray(
        list(itertools.product(range(VOCAB), repeat=MAXLEN - 1)), np.int32
    )  # (V^(L-1), L-1)
    n = all_toks.shape[0]
    seqs = np.concatenate([np.full((n, 1), start, np.int32), all_toks], axis=1)
    enc = jnp.broadcast_to(enc_row[None], (n,) + enc_row.shape)
    lp = all_log_probs(model, params, enc, seqs)  # (n, MAXLEN, V)

    best_score, best_seq = -1e30, None
    for i in range(n):
        toks = all_toks[i]
        score = 0.0
        for pos, tok in enumerate(toks):
            score += lp[i, pos, tok]
            if tok == eos:
                break
        finished_len = next(
            (j + 2 for j, t in enumerate(toks) if t == eos), MAXLEN
        )  # tokens consumed incl. start
        canon = tuple(int(t) for t in seqs[i, :finished_len])
        penalized = score / (finished_len ** length_penalty)
        if penalized > best_score + 1e-9:
            best_score, best_seq = penalized, canon
    return best_score, best_seq


@pytest.mark.parametrize("length_penalty", [1.0, 0.6])
@pytest.mark.slow
def test_beam_matches_brute_force(setup, length_penalty):
    model, params, px = setup
    eos = model.config.decoder.eos_token_id
    start = model.config.decoder.decoder_start_token_id
    enc = model.encode(params, px)

    out = model.generate(
        params, px, max_length=MAXLEN, num_beams=VOCAB ** 2,
        length_penalty=length_penalty, forced_eos_token_id=None,
    )
    for b in range(px.shape[0]):
        score, seq = brute_force_best(
            model, params, np.asarray(enc)[b], start, eos, length_penalty
        )
        got = tuple(int(t) for t in np.asarray(out.sequences)[b])
        # canonicalize: cut at EOS, strip trailing pads
        if eos in got[1:]:
            got = got[: got[1:].index(eos) + 2]
        np.testing.assert_allclose(float(out.scores[b]), score, rtol=1e-4)
        assert got == seq, (got, seq)


@pytest.mark.slow
def test_forced_bos_and_eos(setup):
    model, params, px = setup
    out = model.generate(
        params, px, max_length=MAXLEN, num_beams=3, forced_bos_token_id=5,
        forced_eos_token_id=model.config.decoder.eos_token_id,
    )
    seqs = np.asarray(out.sequences)
    assert np.all(seqs[:, 1] == 5)
    # every row must terminate with EOS at the last position unless earlier EOS
    eos = model.config.decoder.eos_token_id
    for row in seqs:
        assert eos in row[1:]


@pytest.mark.slow
def test_greedy_score_is_sequence_log_prob(setup):
    model, params, px = setup
    out = model.generate(
        params, px, max_length=MAXLEN, num_beams=1, forced_eos_token_id=None
    )
    enc = model.encode(params, px)
    lp = all_log_probs(model, params, enc, np.asarray(out.sequences))
    eos = model.config.decoder.eos_token_id
    for b in range(px.shape[0]):
        seq = np.asarray(out.sequences)[b]
        score = 0.0
        for pos in range(MAXLEN - 1):
            tok = seq[pos + 1]
            score += lp[b, pos, tok]
            if tok == eos:
                break
        np.testing.assert_allclose(float(out.scores[b]), score, rtol=1e-4)


@pytest.mark.slow
def test_min_length_blocks_eos(setup):
    model, params, px = setup
    eos = model.config.decoder.eos_token_id
    out = model.generate(
        params, px, max_length=6, num_beams=1, min_length=5,
        forced_eos_token_id=None,
    )
    seqs = np.asarray(out.sequences)
    assert not np.any(seqs[:, 1:4] == eos)


@pytest.mark.slow
def test_sampling_topk1_equals_greedy(setup):
    model, params, px = setup
    greedy = model.generate(params, px, max_length=MAXLEN, num_beams=1)
    sampled = model.generate(
        params, px, max_length=MAXLEN, num_beams=1, do_sample=True, top_k=1,
        rng=jax.random.PRNGKey(3),
    )
    np.testing.assert_array_equal(
        np.asarray(greedy.sequences), np.asarray(sampled.sequences)
    )


@pytest.mark.slow
def test_jit_generate_consistent(setup):
    model, params, px = setup
    eager = model.generate(params, px, max_length=MAXLEN, num_beams=4)
    jitted = jax.jit(
        lambda p, x: model.generate(p, x, max_length=MAXLEN, num_beams=4)
    )(params, px)
    np.testing.assert_array_equal(
        np.asarray(eager.sequences), np.asarray(jitted.sequences)
    )


@pytest.mark.slow
def test_lazy_cache_matches_physical_permute(setup, monkeypatch):
    """The ancestry-masked lazy beam cache (nn/cache.py LazyDecoderCache)
    must produce bit-identical beam search results to the physically
    permuted cache at several lengths/penalties."""
    model, params, px = setup
    for max_length, lp_ in [(MAXLEN, 1.0), (8, 0.6), (8, 2.0)]:
        monkeypatch.setenv("MIC_TPU_LAZY_CACHE", "1")
        lazy = model.generate(
            params, px, max_length=max_length, num_beams=4, length_penalty=lp_
        )
        monkeypatch.setenv("MIC_TPU_LAZY_CACHE", "0")
        phys = model.generate(
            params, px, max_length=max_length, num_beams=4, length_penalty=lp_
        )
        np.testing.assert_array_equal(
            np.asarray(lazy.sequences), np.asarray(phys.sequences)
        )
        np.testing.assert_allclose(
            np.asarray(lazy.scores), np.asarray(phys.scores), rtol=1e-5
        )


@pytest.mark.slow
def test_segmented_cache_matches_full(setup, monkeypatch):
    """Segmented cache growth (MIC_TPU_CACHE_SEGMENTS / search._run_segmented)
    must be bit-identical to the single full-size-cache loop: each phase
    computes the same attention over a prefix-sized buffer, and grow() pads
    with positions that are masked out anyway.  Covers beam (lazy + physical)
    and greedy, at an uneven segment split."""
    model, params, px = setup
    for kw in [
        dict(max_length=16, num_beams=4),
        dict(max_length=16, num_beams=4, length_penalty=0.6),
        dict(max_length=16, num_beams=1),
    ]:
        for lazy in ("1", "0"):
            monkeypatch.setenv("MIC_TPU_LAZY_CACHE", lazy)
            monkeypatch.setenv("MIC_TPU_CACHE_SEGMENTS", "5,9,16")
            seg = model.generate(params, px, **kw)
            monkeypatch.setenv("MIC_TPU_CACHE_SEGMENTS", "")
            full = model.generate(params, px, **kw)
            np.testing.assert_array_equal(
                np.asarray(seg.sequences), np.asarray(full.sequences)
            )
            np.testing.assert_allclose(
                np.asarray(seg.scores), np.asarray(full.scores), rtol=1e-6
            )


@pytest.mark.slow
def test_segmented_cache_auto_and_quant(setup, monkeypatch):
    """'auto' segment resolution + int8 KV cache survive growth (the scale
    arrays must be padded alongside the int8 values)."""
    model, params, px = setup
    monkeypatch.setenv("MIC_TPU_CACHE_SEGMENTS", "on")
    seg = model.generate(params, px, max_length=16, num_beams=4, kv_quant="int8")
    monkeypatch.setenv("MIC_TPU_CACHE_SEGMENTS", "")
    full = model.generate(params, px, max_length=16, num_beams=4, kv_quant="int8")
    np.testing.assert_array_equal(
        np.asarray(seg.sequences), np.asarray(full.sequences)
    )


@pytest.mark.slow
def test_merged_kv_layout_matches_canonical(setup, monkeypatch):
    """The merged (B*K, T, H*Dh) self-KV storage (fused-kernel layout,
    nn/cache.py init_lazy_cache merged=True) must be bit-identical to the
    canonical (B*K, T, H, Dh) layout — it is a pure dim regrouping; the XLA
    attend reshapes it back per head.  Also covers grow() on the rank-3
    buffers (segmented decoding)."""
    model, params, px = setup
    for kw in [
        dict(max_length=8, num_beams=4, length_penalty=0.6),
        dict(max_length=16, num_beams=4),
    ]:
        monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", "merged_kv")
        monkeypatch.setenv("MIC_TPU_CACHE_SEGMENTS", "5,9,16")
        merged = model.generate(params, px, **kw)
        monkeypatch.delenv("MIC_TPU_EXPERIMENTAL")
        monkeypatch.setenv("MIC_TPU_CACHE_SEGMENTS", "")
        canon = model.generate(params, px, **kw)
        np.testing.assert_array_equal(
            np.asarray(merged.sequences), np.asarray(canon.sequences)
        )
        np.testing.assert_allclose(
            np.asarray(merged.scores), np.asarray(canon.scores), rtol=1e-6
        )


@pytest.mark.slow
def test_merged_cross_cache_matches_canonical(setup, monkeypatch):
    """The merged (L, B, S, H*Dh) CROSS cache + fused cross-attention kernel
    (the TPU beam default — lane-padding-free reads) must match the canonical
    (L, B, S, H, Dh) XLA chain through a full generate.  Off-TPU the kernel
    runs in interpret mode, so the exact kernel program is what's tested."""
    model, params, px = setup
    monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", "merged_cross")
    merged = model.generate(params, px, max_length=8, num_beams=4)
    monkeypatch.delenv("MIC_TPU_EXPERIMENTAL")
    canon = model.generate(params, px, max_length=8, num_beams=4)
    np.testing.assert_array_equal(
        np.asarray(merged.sequences), np.asarray(canon.sequences)
    )
    np.testing.assert_allclose(
        np.asarray(merged.scores), np.asarray(canon.scores), rtol=1e-4
    )


@pytest.mark.slow
def test_bucketed_attention_reads_match_full_window(setup, monkeypatch):
    """Prefix-bucketed cache reads (MIC_TPU_EXPERIMENTAL=attn_buckets) must be
    bit-identical to full-window reads: masked tail positions contribute
    exact zeros to the softmax regardless of the static slice length."""
    model, params, px = setup
    monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", "attn_buckets=4.8.16")
    bucketed = model.generate(params, px, max_length=16, num_beams=4)
    monkeypatch.delenv("MIC_TPU_EXPERIMENTAL")
    full = model.generate(params, px, max_length=16, num_beams=4)
    np.testing.assert_array_equal(
        np.asarray(bucketed.sequences), np.asarray(full.sequences)
    )
    np.testing.assert_array_equal(
        np.asarray(bucketed.scores), np.asarray(full.scores)
    )


# ---------------------------------------------------------------------------
# no_repeat_ngram_size (reference surface:
# generation_clip_vision_utils.py:369-388 — HF NoRepeatNGram semantics)


def _py_banned(tokens, n):
    """HF NoRepeatNGramLogitsProcessor oracle: tokens = full sequence so far
    (start token included); returns the set of banned next tokens."""
    if len(tokens) + 1 < n:
        return set()
    prefix = tuple(tokens[len(tokens) - (n - 1):])
    banned = set()
    for t in range(len(tokens) - n + 1):
        if tuple(tokens[t:t + n - 1]) == prefix:
            banned.add(tokens[t + n - 1])
    return banned


def test_ngram_windows_matches_python_oracle():
    from mic_tpu.generate.search import _ngram_windows

    rng = np.random.default_rng(11)
    T = 12
    for n in (2, 3, 4):
        seqs = rng.integers(0, 4, size=(6, T)).astype(np.int32)
        for cur_len in (1, 2, n - 1, n, 5, T - 1):
            match, nxt = _ngram_windows(
                jnp.asarray(seqs), jnp.asarray(cur_len, jnp.int32), n
            )
            match, nxt = np.asarray(match), np.asarray(nxt)
            for i in range(seqs.shape[0]):
                got = set(nxt[i, match[i]].tolist())
                want = _py_banned(seqs[i, :cur_len].tolist(), n)
                assert got == want, (n, cur_len, i, got, want)


def test_greedy_no_repeat_ngram_matches_python_loop(setup):
    """generate(num_beams=1, no_repeat_ngram_size=2) == a host-side greedy
    loop over teacher-forced log-probs with the HF oracle ban set."""
    model, params, px = setup
    dec = model.config.decoder
    maxlen = 10
    out = model.generate(
        params, px, max_length=maxlen, num_beams=1, no_repeat_ngram_size=2,
        forced_eos_token_id=None,
    )
    got = np.asarray(out.sequences)

    enc = model.encode(params, px)
    for i in range(px.shape[0]):
        toks = [dec.decoder_start_token_id]
        while len(toks) < maxlen:
            seq = np.full((1, maxlen), dec.pad_token_id, np.int32)
            seq[0, : len(toks)] = toks
            lp = all_log_probs(
                model, enc[i : i + 1], None, seq
            ) if False else None
            # teacher-forced next-token log-probs at the last position
            logits = model.decode_train(
                params, enc[i : i + 1], jnp.asarray(seq),
                jnp.ones((1, maxlen), jnp.int32),
            )
            row = np.asarray(
                jax.nn.log_softmax(
                    logits[0, len(toks) - 1].astype(jnp.float32)
                )
            )
            for b in _py_banned(toks, 2):
                row[b] = -np.inf
            tok = int(np.argmax(row))
            toks.append(tok)
            if tok == dec.eos_token_id:
                break
        want = np.full((maxlen,), dec.pad_token_id, np.int32)
        want[: len(toks)] = toks
        np.testing.assert_array_equal(got[i], want)


def test_beam_no_repeat_ngram_property(setup):
    """Beam outputs with no_repeat_ngram_size=2 never repeat a bigram inside
    the generated prefix (pad tail excluded)."""
    model, params, px = setup
    dec = model.config.decoder
    out = model.generate(
        params, px, max_length=10, num_beams=4, no_repeat_ngram_size=2,
        forced_eos_token_id=None,
    )
    for row in np.asarray(out.sequences):
        toks = row.tolist()
        if dec.eos_token_id in toks:
            toks = toks[: toks.index(dec.eos_token_id) + 1]
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), toks


def test_sampling_no_repeat_ngram_never_emits_banned(setup):
    model, params, px = setup
    dec = model.config.decoder
    out = model.generate(
        params, px, max_length=12, num_beams=1, do_sample=True,
        no_repeat_ngram_size=2, temperature=3.0, rng=jax.random.PRNGKey(5),
        forced_eos_token_id=None,
    )
    for row in np.asarray(out.sequences):
        toks = row.tolist()
        if dec.eos_token_id in toks:
            toks = toks[: toks.index(dec.eos_token_id) + 1]
        bigrams = list(zip(toks, toks[1:]))
        assert len(bigrams) == len(set(bigrams)), toks


@pytest.mark.parametrize("num_beams", [1, 4])
def test_eos_positions_pin_per_image_lengths(setup, num_beams):
    """Pinned per-image EOS positions (the deterministic early-exit serving
    protocol, search._force_eos_candidates): row b's sequence ends with EOS
    exactly at output position eos_positions[b], pad after, and composes with
    a forced BOS at position 1."""
    model, params, px = setup
    dec = model.config.decoder
    eos_pos = jnp.asarray([3, 7], jnp.int32)
    out = model.generate(
        params, px, max_length=12, num_beams=num_beams,
        forced_bos_token_id=5, forced_eos_token_id=None,
        early_stopping=num_beams > 1, eos_positions=eos_pos,
    )
    seqs = np.asarray(out.sequences)
    for b, pos in enumerate([3, 7]):
        assert seqs[b, 1] == 5  # forced BOS composes
        assert seqs[b, pos] == dec.eos_token_id, seqs[b]
        # EXACT length: EOS is banned before the pinned position even when
        # the model would naturally emit it earlier
        assert (seqs[b, 1:pos] != dec.eos_token_id).all(), seqs[b]
        assert (seqs[b, pos + 1:] == dec.pad_token_id).all(), seqs[b]
        # generated prefix is live (not pad-collapsed)
        assert (seqs[b, 1:pos] != dec.pad_token_id).any(), seqs[b]


def test_eos_positions_jit_under_jit(setup):
    """eos_positions is a traced array: the same jitted fn serves any pinned
    length distribution without recompiles."""
    model, params, px = setup
    dec = model.config.decoder

    @jax.jit
    def gen(params, px, eos_pos):
        return model.generate(
            params, px, max_length=10, num_beams=4,
            forced_eos_token_id=None, early_stopping=True,
            eos_positions=eos_pos,
        ).sequences

    s1 = np.asarray(gen(params, px, jnp.asarray([2, 4], jnp.int32)))
    s2 = np.asarray(gen(params, px, jnp.asarray([5, 3], jnp.int32)))
    assert s1[0, 2] == dec.eos_token_id and s1[1, 4] == dec.eos_token_id
    assert s2[0, 5] == dec.eos_token_id and s2[1, 3] == dec.eos_token_id
