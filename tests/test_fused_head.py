"""Fused LM-head + top-k + logsumexp (ops/fused_head.py).

On CPU the op lowers to the dense formulation, so these tests pin the API
contract and the captioner-level plumbing (step_fn returning hidden states,
CandidateHead selection incl. forced-token branches); the Pallas kernel's
bit-level agreement with the dense oracle is checked on real TPU by
tools/validate_fast_decode.py and the kernel check in PERFORMANCE.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.fused_head import fused_head_topk, fused_head_topk_q8


def test_q8_matches_int8_dense_oracle():
    """fused_head_topk_q8 == the unfused native-int8 head formulation
    (captioner.lm_logits int8 branch): same dynamic activation quant, same
    int8 weight table, so results must agree exactly on ids and to float
    tolerance on log-probs."""
    from mic_tpu.ops.quant import quantize_array, quantize_rows_dynamic

    rng = np.random.default_rng(1)
    n, d, v = 16, 32, 999
    hidden = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
    wq, ws = quantize_array(w, axis=1)
    lp, ids, lse = fused_head_topk_q8(hidden, wq.T, ws, bias, 5)

    xq, xs = quantize_rows_dynamic(hidden)
    logits = (
        xq.astype(np.float32) @ wq.T.astype(np.float32)
    ) * np.asarray(xs) * np.asarray(ws)[None, :] + np.asarray(bias)
    ov, oi = jax.lax.top_k(jnp.asarray(logits), 5)
    olse = jax.scipy.special.logsumexp(jnp.asarray(logits), axis=-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(oi))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ov - olse), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(olse), rtol=1e-4, atol=1e-4
    )


def test_matches_dense_oracle():
    rng = np.random.default_rng(0)
    n, d, v = 16, 32, 999
    hidden = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
    lp, ids, lse = fused_head_topk(hidden, w.T, bias, 5)
    logits = hidden @ w.T + bias
    ov, oi = jax.lax.top_k(logits, 5)
    olse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(oi))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ov - olse), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(olse), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("num_beams", [1, 4])
@pytest.mark.parametrize("quantize", [None, "int8"])
@pytest.mark.slow
def test_captioner_fused_head_matches_dense(num_beams, quantize, monkeypatch):
    """Full generate with MIC_TPU_FUSED_HEAD=1 must match the dense-logits
    path, including the forced-BOS/EOS cond branches — in bf16 and in the
    int8 weight-only decode mode (where both paths share the same quantized
    table + dynamic activation quant, so sequences AND scores must agree)."""
    from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
    from mic_tpu.models.captioner import Captioner

    config = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(vocab_size=64, max_position_embeddings=32),
        tie_word_embeddings=True,
    )
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(2))
    px = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)

    kw = dict(
        max_length=10, num_beams=num_beams, forced_bos_token_id=7,
        forced_eos_token_id=2, min_length=4, quantize=quantize,
    )
    monkeypatch.setenv("MIC_TPU_FUSED_HEAD", "1")
    fused = model.generate(params, px, **kw)
    monkeypatch.setenv("MIC_TPU_FUSED_HEAD", "0")
    dense = model.generate(params, px, **kw)
    np.testing.assert_array_equal(
        np.asarray(fused.sequences), np.asarray(dense.sequences)
    )
    np.testing.assert_allclose(
        np.asarray(fused.scores), np.asarray(dense.scores), rtol=1e-5
    )


def test_bucket_oracle_semantics():
    """_bucket_topk_dense == brute-force per-column-position chunk max +
    top-k, and each returned id is the true argmax of its bucket."""
    from mic_tpu.ops.fused_head import _bucket_topk_dense

    rng = np.random.default_rng(3)
    n, v, bv, k = 4, 2200, 512, 5
    logits = jnp.asarray(rng.normal(size=(n, v)).astype(np.float32))
    vals, ids = _bucket_topk_dense(logits, k, bv)
    ln = np.asarray(logits)
    for r in range(n):
        # brute force: bucket b holds positions {b, b+bv, b+2bv, ...} ∩ [0,v)
        win = {}
        for col in range(v):
            b = col % bv
            if b not in win or ln[r, col] > win[b][0]:
                win[b] = (ln[r, col], col)
        expect = sorted(win.values(), key=lambda t: -t[0])[:k]
        np.testing.assert_allclose(np.asarray(vals)[r], [e[0] for e in expect],
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ids)[r],
                                      [e[1] for e in expect])


def test_bucket_single_chunk_is_exact():
    """vocab <= bucket width -> one chunk -> bucket select degenerates to
    exact top-k (each bucket holds one column)."""
    from mic_tpu.ops.fused_head import _bucket_tiles

    rng = np.random.default_rng(4)
    n, d, v = 8, 16, 333
    assert v <= _bucket_tiles(n)[1]
    hidden = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32))
    lp, ids, lse = fused_head_topk(hidden, w.T, bias, 5, "bucket")
    lpe, idse, lsee = fused_head_topk(hidden, w.T, bias, 5, "exact")
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(idse))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lpe), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lsee), rtol=1e-5)


@pytest.mark.parametrize("num_beams", [1, 4])
@pytest.mark.slow
def test_captioner_fused_bucket_matches_dense_small_vocab(num_beams, monkeypatch):
    """With a vocab smaller than the bucket width, the fused BUCKET path must
    equal the dense exact path end-to-end (sequences and scores) — exercises
    the captioner's sel="bucket" plumbing incl. forced-token branches."""
    from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
    from mic_tpu.models.captioner import Captioner

    config = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(vocab_size=64, max_position_embeddings=32),
        tie_word_embeddings=True,
    )
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(5))
    px = np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32)
    kw = dict(max_length=10, num_beams=num_beams, forced_bos_token_id=7,
              forced_eos_token_id=2, min_length=4)
    monkeypatch.setenv("MIC_TPU_FUSED_HEAD", "1")
    monkeypatch.setenv("MIC_TPU_FUSED_SELECT", "bucket")
    fused = model.generate(params, px, **kw)
    monkeypatch.setenv("MIC_TPU_FUSED_HEAD", "0")
    dense = model.generate(params, px, **kw)
    np.testing.assert_array_equal(
        np.asarray(fused.sequences), np.asarray(dense.sequences)
    )
    np.testing.assert_allclose(
        np.asarray(fused.scores), np.asarray(dense.scores), rtol=1e-5
    )


@pytest.mark.parametrize("n", [256, 1024])
def test_bucket_kernel_interpret_matches_oracle(n):
    """The bucket Pallas kernels themselves (interpret mode, so the exact
    kernel program runs on CPU) == the dense bucket oracle.  n=1024 drives
    the accumulator-output kernel + XLA finish (bn > 512); n=256 the
    in-kernel-finish variant."""
    from mic_tpu.ops.fused_head import _bucket_tiles, _bucket_topk_dense

    d, v, k = 128, 1024, 5
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16)
    weight_t = jnp.asarray(
        rng.normal(size=(d, v)).astype(np.float32) * 0.2, jnp.bfloat16
    )
    bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)

    lp, ids, lse = fused_head_topk(
        hidden, weight_t, bias, k, "bucket", True
    )
    logits = (
        jnp.dot(hidden, weight_t, preferred_element_type=jnp.float32)
        + bias[None, :]
    )
    ovals, oids = _bucket_topk_dense(logits, k, _bucket_tiles(n)[1])
    olse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(oids))
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(olse), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(ovals - olse), rtol=2e-4, atol=2e-4
    )


def test_bucket_q8_kernel_interpret_matches_oracle():
    """int8-weight bucket kernels in interpret mode (both row-tile regimes)
    == the dequantized dense bucket oracle."""
    from mic_tpu.ops.fused_head import _bucket_tiles, _bucket_topk_dense
    from mic_tpu.ops.quant import quantize_rows_dynamic

    d, v, k = 128, 1024, 5
    rng = np.random.default_rng(1)
    for n in (256, 1024):
        hidden = jnp.asarray(
            rng.normal(size=(n, d)).astype(np.float32), jnp.bfloat16
        )
        weight = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32) * 0.2)
        wq, wsc = quantize_rows_dynamic(weight)
        wsc = wsc[:, 0]
        bias = jnp.asarray(rng.normal(size=(v,)).astype(np.float32) * 0.1)

        lp, ids, lse = fused_head_topk_q8(
            hidden, wq.T, wsc, bias, k, "bucket", True
        )
        logits = (
            jnp.dot(
                hidden, wq.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            * wsc[None, :]
            + bias[None, :]
        )
        ovals, oids = _bucket_topk_dense(logits, k, _bucket_tiles(n)[1])
        olse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(oids))
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(olse), rtol=2e-5, atol=2e-5
        )
