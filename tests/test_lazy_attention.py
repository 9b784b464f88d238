"""Fused lazy decode-attention kernel (ops/lazy_attention.py) vs the XLA
lazy path (nn/attention.py mha_decode_step_lazy) — interpret mode, so the
exact kernel program runs on CPU.

The kernel reads the PRE-update cache and takes the current step's K/V as
separate inputs (so the model's post-kernel column write aliases in place);
the dense reference below scores the POST-update cache with the classic
``t <= index`` liveness — the two must agree exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.lazy_attention import (
    build_ancestry_mask,
    fused_lazy_attention,
    supports,
)
from mic_tpu.ops.quant import quantize_rows_dynamic


def _dense_ref(q, ck, cv, anc, index, heads):
    """The attend() math of mha_decode_step_lazy, full window, POST-update
    cache (current column written, live t <= index)."""
    b, k, hd = q.shape
    dh = hd // heads
    t = ck.shape[1]
    beams = anc.shape[1]
    q4 = q.reshape(b, k, heads, dh)
    kg = ck.reshape(b, beams, t, heads, dh)
    vg = cv.reshape(b, beams, t, heads, dh)
    scores = jnp.einsum(
        "bkhd,bjthd->bhkjt", q4, kg.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    live = jnp.arange(t) <= index
    sel = anc[:, :, :, None] == jnp.arange(beams, dtype=jnp.int32)
    mask = (sel & live[None, None, :, None]).transpose(0, 1, 3, 2)
    scores = jnp.where(mask[:, None], scores, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(scores.reshape(b, heads, k, beams * t), axis=-1)
    w = w.reshape(b, heads, k, beams, t).astype(q.dtype)
    out = jnp.einsum(
        "bhkjt,bjthd->bkhd", w, vg.astype(q.dtype),
        preferred_element_type=q.dtype,
    )
    return out.reshape(b, k, hd)


def _inputs(b, k, h, dh, t, index, seed=0):
    """Returns (q, ck_pre, cv_pre, k_step, v_step, anc, ck_post, cv_post):
    pre-update caches + step rows for the kernel; post-update caches (step
    written at `index`, ancestry identity there) for the dense reference."""
    rng = np.random.default_rng(seed)
    hd = h * dh
    q = jnp.asarray(
        rng.normal(size=(b, k, hd)).astype(np.float32) * 0.3, jnp.bfloat16
    )
    ck = jnp.asarray(
        rng.normal(size=(b * k, t, h, dh)).astype(np.float32) * 0.5,
        jnp.bfloat16,
    )
    cv = jnp.asarray(
        rng.normal(size=(b * k, t, h, dh)).astype(np.float32) * 0.5,
        jnp.bfloat16,
    )
    k_step = jnp.asarray(
        rng.normal(size=(b, k, hd)).astype(np.float32) * 0.5, jnp.bfloat16
    )
    v_step = jnp.asarray(
        rng.normal(size=(b, k, hd)).astype(np.float32) * 0.5, jnp.bfloat16
    )
    anc = rng.integers(0, k, size=(b, k, t)).astype(np.int32)
    anc[:, :, index] = np.arange(k)  # a beam's current token is its own row
    anc = jnp.asarray(anc)
    ck_post = jax.lax.dynamic_update_slice(
        ck, k_step.reshape(b * k, 1, h, dh), (0, index, 0, 0)
    )
    cv_post = jax.lax.dynamic_update_slice(
        cv, v_step.reshape(b * k, 1, h, dh), (0, index, 0, 0)
    )
    return q, ck, cv, k_step, v_step, anc, ck_post, cv_post


@pytest.mark.parametrize("t,index", [(16, 3), (32, 31), (64, 40), (16, 0)])
def test_kernel_matches_xla_path(t, index):
    b, k, h, dh = 2, 4, 16, 64
    q, ck, cv, kst, vst, anc, ckp, cvp = _inputs(b, k, h, dh, t, index)
    idx = jnp.asarray(index, jnp.int32)
    amask = build_ancestry_mask(anc, idx)
    ref = np.asarray(_dense_ref(q, ckp, cvp, anc, idx, h), np.float32)
    got = np.asarray(
        fused_lazy_attention(q, ck, cv, kst, vst, amask, k, h, interpret=True),
        np.float32,
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 0.03


def test_kernel_merged_layout_matches():
    """The merged (B*K, T, H*Dh) cache storage must give identical results:
    inside the kernel it is the same (B, K*T, HD) view."""
    b, k, h, dh, t, index = 2, 4, 16, 64, 32, 17
    q, ck, cv, kst, vst, anc, ckp, cvp = _inputs(b, k, h, dh, t, index)
    idx = jnp.asarray(index, jnp.int32)
    amask = build_ancestry_mask(anc, idx)
    ref = np.asarray(
        fused_lazy_attention(q, ck, cv, kst, vst, amask, k, h, interpret=True),
        np.float32,
    )
    got = np.asarray(
        fused_lazy_attention(
            q, ck.reshape(b * k, t, h * dh), cv.reshape(b * k, t, h * dh),
            kst, vst, amask, k, h, interpret=True,
        ),
        np.float32,
    )
    np.testing.assert_array_equal(got, ref)


def test_kernel_int8_kv_close():
    b, k, h, dh, t = 2, 4, 16, 64, 32
    index = t - 1
    q, ck, cv, kst, vst, anc, ckp, cvp = _inputs(b, k, h, dh, t, index, seed=1)
    idx = jnp.asarray(index, jnp.int32)
    amask = build_ancestry_mask(anc, idx)
    kq8, ks = quantize_rows_dynamic(ck)
    vq8, vs = quantize_rows_dynamic(cv)
    ck8 = {"q": kq8, "s": ks[..., 0]}
    cv8 = {"q": vq8, "s": vs[..., 0]}
    ref = np.asarray(_dense_ref(q, ckp, cvp, anc, idx, h), np.float32)
    got = np.asarray(
        fused_lazy_attention(q, ck8, cv8, kst, vst, amask, k, h, interpret=True),
        np.float32,
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 0.06


def test_beams_two():
    b, k, h, dh, t, index = 3, 2, 8, 128, 8, 5
    q, ck, cv, kst, vst, anc, ckp, cvp = _inputs(b, k, h, dh, t, index, seed=2)
    idx = jnp.asarray(index, jnp.int32)
    amask = build_ancestry_mask(anc, idx)
    ref = np.asarray(_dense_ref(q, ckp, cvp, anc, idx, h), np.float32)
    got = np.asarray(
        fused_lazy_attention(q, ck, cv, kst, vst, amask, k, h, interpret=True),
        np.float32,
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < 0.03


def test_build_ancestry_mask_semantics():
    # STRICT liveness: position `index` itself is NOT in the mask (the
    # kernel's separate step rows cover it)
    anc = jnp.asarray([[[0, 0, 0], [0, 1, 1]]], jnp.int32)  # (1, 2, 3)
    m = np.asarray(build_ancestry_mask(anc, jnp.asarray(2, jnp.int32)))
    assert m.shape == (1, 6, 2)  # (B, J*T, K)
    # rows are (j, t) j-major: j*3 + t
    assert m[0, 0, 0] == 1 and m[0, 0, 1] == 1   # j=0,t=0: both beams
    assert m[0, 1, 0] == 1 and m[0, 1, 1] == 0   # j=0,t=1: beam0 only
    assert m[0, 4, 1] == 1 and m[0, 4, 0] == 0   # j=1,t=1: beam1 only
    assert m[0, 2, 0] == 0 and m[0, 2, 1] == 0   # t=2 == index: step rows
    assert m[0, 5, 0] == 0 and m[0, 5, 1] == 0


def test_supports_guard():
    kv = jnp.zeros((8, 16, 16, 64), jnp.bfloat16)
    assert supports(kv, 4, 16, 64)
    assert not supports(kv, 1, 16, 64)          # greedy: no beam axis
    assert not supports(kv, 4, 3, 64)           # HD not 128-aligned
    kv_odd = jnp.zeros((8, 13, 16, 64), jnp.bfloat16)
    assert not supports(kv_odd, 4, 16, 64)      # J*T not 16-aligned
    assert supports({"q": kv, "s": jnp.zeros((8, 16, 16))}, 4, 16, 64)
    merged = jnp.zeros((8, 16, 1024), jnp.bfloat16)
    assert supports(merged, 4, 16, 64)


@pytest.mark.parametrize(
    "t,index", [(32, 17), (64, 40), (32, 0), (64, 63), (128, 90)]
)
def test_dma_kernel_matches_blocked_bf16(t, index):
    """fused_lazy_attention_dma (v3: live-prefix chunked DMA + in-kernel
    column write) == the blocked kernel, and the pass-through caches come
    back with the step column written at `index` (otherwise untouched).
    Indices below t exercise the chunk-skipping path (TC=16 at these t)."""
    from mic_tpu.ops.lazy_attention import fused_lazy_attention_dma

    b, k, h, dh = 2, 4, 16, 64
    q, ck, cv, kst, vst, anc, ckp, cvp = _inputs(b, k, h, dh, t, index)
    idx = jnp.asarray(index, jnp.int32)
    amask = build_ancestry_mask(anc, idx)
    ckm = ck.reshape(b * k, t, h * dh)
    cvm = cv.reshape(b * k, t, h * dh)
    ref = np.asarray(
        fused_lazy_attention(q, ckm, cvm, kst, vst, amask, k, h,
                             interpret=True),
        np.float32,
    )
    out, ck_pt, cv_pt = fused_lazy_attention_dma(
        q, ckm, cvm, kst, vst, amask, idx, k, h, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out, np.float32), ref)
    # cache contract: columns <= index are exact (live prefix + the step
    # column); dead columns WITHIN the written window carry exact ZEROS —
    # load-bearing: the kernel dropped its V-liveness select because dead
    # positions are guaranteed finite (0-weight x NaN = NaN otherwise);
    # columns beyond the window are untouched input
    np.testing.assert_array_equal(
        np.asarray(ck_pt)[:, : index + 1],
        np.asarray(ckp.reshape(b * k, t, h * dh))[:, : index + 1],
    )
    np.testing.assert_array_equal(
        np.asarray(cv_pt)[:, : index + 1],
        np.asarray(cvp.reshape(b * k, t, h * dh))[:, : index + 1],
    )
    w_end = (index // 8) * 8 + 8
    np.testing.assert_array_equal(
        np.asarray(ck_pt, np.float32)[:, index + 1: w_end], 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(cv_pt, np.float32)[:, index + 1: w_end], 0.0
    )


def test_dma_kernel_int8_merged_close():
    """merged-int8 format: (B*K, T, HD) int8 values + per-ROW (B*K, T)
    f32 scales (quantized over the full merged row).  The returned caches
    carry the step column quantized with the exact ops/quant.py math."""
    from mic_tpu.ops.lazy_attention import fused_lazy_attention_dma

    b, k, h, dh, t = 2, 4, 16, 64, 32
    index = t - 1
    q, ck, cv, kst, vst, anc, ckp, cvp = _inputs(b, k, h, dh, t, index, seed=3)
    idx = jnp.asarray(index, jnp.int32)
    amask = build_ancestry_mask(anc, idx)
    ckm = ck.reshape(b * k, t, h * dh)
    cvm = cv.reshape(b * k, t, h * dh)
    kq8, ks = quantize_rows_dynamic(ckm)
    vq8, vs = quantize_rows_dynamic(cvm)
    ck8 = {"q": kq8, "s": ks[..., 0]}
    cv8 = {"q": vq8, "s": vs[..., 0]}
    ref = np.asarray(_dense_ref(q, ckp, cvp, anc, idx, h), np.float32)
    out, ck_pt, cv_pt = fused_lazy_attention_dma(
        q, ck8, cv8, kst, vst, amask, idx, k, h, interpret=True
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(np.asarray(out, np.float32) - ref)) / scale < 0.08
    # the step column comes back quantized exactly as the XLA path would
    kq8_st, ks_st = quantize_rows_dynamic(kst.reshape(b * k, 1, h * dh))
    vq8_st, vs_st = quantize_rows_dynamic(vst.reshape(b * k, 1, h * dh))
    exp_kq = jax.lax.dynamic_update_slice(ck8["q"], kq8_st, (0, index, 0))
    exp_ks = jax.lax.dynamic_update_slice(
        ck8["s"], ks_st.reshape(b * k, 1), (0, index)
    )
    exp_vq = jax.lax.dynamic_update_slice(cv8["q"], vq8_st, (0, index, 0))
    exp_vs = jax.lax.dynamic_update_slice(
        cv8["s"], vs_st.reshape(b * k, 1), (0, index)
    )
    np.testing.assert_array_equal(np.asarray(ck_pt["q"]), np.asarray(exp_kq))
    np.testing.assert_array_equal(np.asarray(ck_pt["s"]), np.asarray(exp_ks))
    np.testing.assert_array_equal(np.asarray(cv_pt["q"]), np.asarray(exp_vq))
    np.testing.assert_array_equal(np.asarray(cv_pt["s"]), np.asarray(exp_vs))


def test_supports_dma_guard():
    from mic_tpu.ops.lazy_attention import supports_dma

    merged = jnp.zeros((8, 16, 1024), jnp.bfloat16)
    assert supports_dma(merged, 4, 16, 64)
    assert not supports_dma(merged, 1, 16, 64)
    assert not supports_dma(jnp.zeros((8, 16, 16, 64), jnp.bfloat16), 4, 16, 64)
    assert not supports_dma(jnp.zeros((8, 12, 1024), jnp.bfloat16), 4, 16, 64)
    q8 = {"q": jnp.zeros((8, 32, 1024), jnp.int8),
          "s": jnp.zeros((8, 32), jnp.float32)}
    assert supports_dma(q8, 4, 16, 64)
    # int8 needs T 32-aligned (the in-kernel window write's int8 tiling)
    q8_t16 = {"q": jnp.zeros((8, 16, 1024), jnp.int8),
              "s": jnp.zeros((8, 16), jnp.float32)}
    assert not supports_dma(q8_t16, 4, 16, 64)
    q8_perhead = {"q": jnp.zeros((8, 16, 1024), jnp.int8),
                  "s": jnp.zeros((8, 16, 16), jnp.float32)}
    assert not supports_dma(q8_perhead, 4, 16, 64)  # needs per-ROW scales


def test_supports_rejects_per_row_scales():
    """The blocked kernel reshapes scales to (B, J*T, H): per-ROW (B*K, T)
    scales (the DMA kernel's layout) must fail the guard, not trace-error."""
    from mic_tpu.ops.lazy_attention import supports

    q8_perhead = {"q": jnp.zeros((8, 16, 16, 64), jnp.int8),
                  "s": jnp.zeros((8, 16, 16), jnp.float32)}
    assert supports(q8_perhead, 4, 16, 64)
    q8_perrow = {"q": jnp.zeros((8, 16, 1024), jnp.int8),
                 "s": jnp.zeros((8, 16), jnp.float32)}
    assert not supports(q8_perrow, 4, 16, 64)


def test_resolve_mode(monkeypatch):
    """Auto mode: XLA chain off-TPU always; env var overrides verbatim."""
    from mic_tpu.ops.lazy_attention import resolve_mode

    monkeypatch.delenv("MIC_TPU_FUSED_LAZY_ATTN", raising=False)
    assert resolve_mode(64) == "0"    # CPU backend in tests
    assert resolve_mode(128) == "0"   # the kernel is TPU-only
    monkeypatch.setenv("MIC_TPU_FUSED_LAZY_ATTN", "2")
    assert resolve_mode(64) == "2"
    monkeypatch.setenv("MIC_TPU_FUSED_LAZY_ATTN", "0")
    assert resolve_mode(128) == "0"


def test_dma_group_policy(monkeypatch):
    """The auto DMA-group ladder picks G=8 at the flagship decode shape
    (B=256, beam 4, T=64, HD=1024 bf16 -> 512 KB/image), bounded by the
    4 MB/plane-slot cap (the kernel sizes its own vmem_limit_bytes, so the
    binding constraint is the measured G=16 regression, not Mosaic's 16 MB
    default budget); MIC_TPU_DMA_G overrides only with a valid divisor."""
    from mic_tpu.ops.lazy_attention import _dma_group

    monkeypatch.delenv("MIC_TPU_DMA_G", raising=False)
    flagship = 4 * 64 * 1024 * 2    # beams * t * (heads*head_dim) * bf16
    assert _dma_group(256, flagship) == 8
    # larger per-image footprint (max_length 256): ladder steps down
    assert _dma_group(256, 4 * 256 * 1024 * 2) == 2
    # non-8-divisible batch falls to the next divisor
    assert _dma_group(4, flagship) == 4
    monkeypatch.setenv("MIC_TPU_DMA_G", "2")
    assert _dma_group(256, flagship) == 2
    monkeypatch.setenv("MIC_TPU_DMA_G", "3")   # non-divisor: auto policy
    assert _dma_group(256, flagship) == 8


def test_fused_qkv_projection_bit_identical():
    """fuse_qkv_params (models/mbart_decoder.py): the concatenated (D, 3D)
    self-attention projection must be BIT-identical to three separate GEMMs
    (each output column contracts the same kernel column in the same order)."""
    from mic_tpu.core.config import CaptionerConfig
    from mic_tpu.models.captioner import Captioner
    from mic_tpu.models.mbart_decoder import fuse_qkv_params
    from mic_tpu.nn.attention import mha_decode_step_lazy

    model = Captioner(CaptionerConfig.tiny())
    params = model.init_params(jax.random.PRNGKey(0))
    dec = params["decoder"]
    cfg = model.config.decoder
    fused = fuse_qkv_params(dec)
    L, D = cfg.num_layers, cfg.d_model
    sa = fused["layers"]["self_attn"]
    assert sa["qkv"]["kernel"].shape == (L, D, 3 * D)
    assert sa["qkv"]["bias"].shape == (L, 3 * D)
    assert "q" not in sa and "k" not in sa and "v" not in sa
    assert "q" in dec["layers"]["self_attn"]  # original untouched

    B, K, T, H = 2, 2, 8, cfg.num_heads
    Dh = cfg.head_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B * K, 1, D)).astype(np.float32))
    ck = jnp.asarray(rng.normal(size=(B * K, T, H, Dh)).astype(np.float32))
    cv = jnp.asarray(rng.normal(size=(B * K, T, H, Dh)).astype(np.float32))
    anc = jnp.zeros((B, K, T), jnp.int32)
    idx = jnp.asarray(3, jnp.int32)

    p_plain = jax.tree.map(lambda a: a[0], dec["layers"])["self_attn"]
    p_fused = jax.tree.map(lambda a: a[0], fused["layers"])["self_attn"]
    o1, k1, v1 = mha_decode_step_lazy(p_plain, x, ck, cv, anc, idx, H, K)
    o2, k2, v2 = mha_decode_step_lazy(p_fused, x, ck, cv, anc, idx, H, K)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
