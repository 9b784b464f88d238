"""ops/flash_ce.py: the Pallas flash-CE kernels == the XLA chunked path.

Modes: "fwd" (flash forward + XLA backward), "1" (two-kernel flash
backward — measured slower end-to-end, kept opt-in), "dl" (flash
forward + dl-materializing backward) and "save" (logits-saving forward
+ zero-recompute backward).  All are pinned
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


@pytest.mark.parametrize("mode", ["fwd", "1", "dl", "save"])
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


def test_save_forward_stats_match_nonsave(monkeypatch):
    """save=True must not perturb the forward at all: lse/lbl/zsum are
    folded from the same f32 tiles, and the saved logits round-trip the
    exact tile values through bf16 (main) / carry them exactly (tail)."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "save")
    from mic_tpu.ops.flash_ce import flash_ce_forward

    rng = np.random.default_rng(2)
    n, d, v = 32, 128, 300  # v > vc floor (128): main chunks + ragged tail
    h = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    emb = jnp.asarray(rng.normal(size=(v, d)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(n,)).astype(np.int32))

    lse0, lbl0, zsum0 = flash_ce_forward(h, emb, bias, labels, True)
    lse, lbl, zsum, lg, tail = flash_ce_forward(
        h, emb, bias, labels, True, None, True
    )
    np.testing.assert_array_equal(np.asarray(lse0), np.asarray(lse))
    np.testing.assert_array_equal(np.asarray(lbl0), np.asarray(lbl))
    np.testing.assert_array_equal(np.asarray(zsum0), np.asarray(zsum))

    v_main = lg.shape[1]
    assert v_main + tail.shape[1] == v and v_main > 0
    logits = np.asarray(h, np.float64) @ np.asarray(emb, np.float64).T \
        + np.asarray(bias, np.float64)
    np.testing.assert_allclose(
        np.asarray(lg, np.float64), logits[:, :v_main], rtol=8e-3, atol=8e-3
    )
    np.testing.assert_allclose(
        np.asarray(tail, np.float64), logits[:, v_main:],
        rtol=1e-5, atol=1e-5,
    )


def test_save_all_tail_vocab(monkeypatch):
    """v below the smallest vocab chunk: the whole table is the XLA tail
    (v_main == 0) and the save backward runs entirely in exact f32."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "save")
    hidden, emb, bias, labels, mask = _inputs(v=97)

    def run(mode):
        def f(h, e, b):
            return fused_lm_loss(h, e, b, labels, mask, 0.1, 64)
        return jax.value_and_grad(f, argnums=(0, 1, 2))(hidden, emb, bias)

    loss_s, grads_s = jax.jit(lambda: run("save"))()
    import os
    os.environ["MIC_TPU_FLASH_CE"] = "0"
    loss_r, grads_r = jax.jit(lambda: run("0"))()
    np.testing.assert_allclose(float(loss_s), float(loss_r),
                               rtol=2e-5, atol=2e-5)
    for a, b_, name in zip(grads_s, grads_r, ["dh", "demb", "dbias"]):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        scale = np.abs(b_).max() + 1e-9
        # atol one bf16 ULP at full scale: dl sits on a cast boundary for
        # the odd element (exp(tail - lse) vs softmax differ at ~1e-7)
        np.testing.assert_allclose(a / scale, b_ / scale, rtol=0,
                                   atol=8e-3, err_msg=name)


def test_save_degrades_to_dl_above_row_cap(monkeypatch):
    """Above dl_max_rows the save mode must not materialize the (N, V)
    logits residual: the forward runs non-saving (saved is None) and the
    backward takes the dl route's own size fallback.  Loss/grads still
    match the XLA chunked path."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "save")
    monkeypatch.setenv("MIC_TPU_DL_MAX_ROWS", "16")  # < N = 2*16 rows
    hidden, emb, bias, labels, mask = _inputs()

    from mic_tpu.ops import fused_ce

    # the forward impl must fall back to "dl" routing (no saved logits)
    _, _, lse, saved = fused_ce._fwd_impl(
        hidden, emb, bias, labels, mask, 0.1, 64, None, "save",
        dl_max_rows=16,
    )
    assert saved is None and lse is not None

    def run():
        def f(h, e, b):
            return fused_lm_loss(h, e, b, labels, mask, 0.1, 64)
        return jax.value_and_grad(f, argnums=(0, 1, 2))(hidden, emb, bias)

    loss_s, grads_s = jax.jit(run)()
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "0")
    loss_r, grads_r = jax.jit(run)()
    np.testing.assert_allclose(float(loss_s), float(loss_r),
                               rtol=2e-5, atol=2e-5)
    for a, b_, name in zip(grads_s, grads_r, ["dh", "demb", "dbias"]):
        a, b_ = np.asarray(a, np.float64), np.asarray(b_, np.float64)
        scale = np.abs(b_).max() + 1e-9
        np.testing.assert_allclose(a / scale, b_ / scale, rtol=0,
                                   atol=8e-3, err_msg=name)
