"""scan_apply and its experiment knobs (nn/stacked.py).

The default path is lax.scan; the knobs are measured alternatives kept as
documented negatives (PERFORMANCE.md train dead ends: unrolled layers OOM
at the flagship batch, the custom-VJP backward profiles identical to the
autodiff transpose).  These tests pin value+grad equivalence so the knobs
stay correct while they exist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.nn.stacked import init_stacked, scan_apply

L = 4


@pytest.fixture()
def setup():
    enc = jax.random.normal(jax.random.PRNGKey(9), (3, 8))  # closed-over diff
    rng = jax.random.PRNGKey(3)                             # closed-over int

    def init(key):
        return {"w": jax.random.normal(key, (8, 8))}

    def body(h, p, idx, extra):
        r = jax.random.fold_in(rng, idx)
        noise = jax.random.normal(r, h.shape) * 0.01
        h = jnp.tanh(h @ p["w"] + enc * 0.1) + noise + idx * 0.01
        return h, h.sum()

    params = init_stacked(jax.random.PRNGKey(0), L, init)
    h0 = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    return body, params, h0, enc


def _run(body, remat="full"):
    def f(h, params):
        out, ys = scan_apply(body, h, params, remat=remat)
        return out.sum() + ys.sum()
    return f


@pytest.mark.parametrize("knob", ["unroll_layers", "custom_scan_vjp"])
def test_knob_matches_default_scan(setup, monkeypatch, knob):
    body, params, h0, enc = setup
    f = _run(body)
    val = f(h0, params)
    grads = jax.grad(f, argnums=(0, 1))(h0, params)
    monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", knob)
    val2 = f(h0, params)
    grads2 = jax.grad(f, argnums=(0, 1))(h0, params)
    np.testing.assert_allclose(np.asarray(val), np.asarray(val2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(grads2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_custom_vjp_closed_over_array_grad(setup, monkeypatch):
    """The closure-converted consts (enc here) must receive summed
    cotangents across layers, matching autodiff exactly."""
    body, params, h0, enc0 = setup

    def f(enc_in, h, params):
        def body2(h, p, idx, extra):
            r = jax.random.fold_in(jax.random.PRNGKey(3), idx)
            noise = jax.random.normal(r, h.shape) * 0.01
            h = jnp.tanh(h @ p["w"] + enc_in * 0.1) + noise + idx * 0.01
            return h, h.sum()

        out, ys = scan_apply(body2, h, params, remat="full")
        return out.sum() + ys.sum()

    g = jax.grad(f)(enc0, h0, params)
    monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", "custom_scan_vjp")
    g2 = jax.grad(f)(enc0, h0, params)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2),
                               rtol=1e-5, atol=1e-7)


def test_scan_apply_no_per_layer_xs_and_ys_tree(setup):
    body, params, h0, enc = setup

    def body_dict(h, p, idx, extra):
        h2 = jnp.tanh(h @ p["w"])
        return h2, {"s": h2.sum(), "m": h2.max()}

    out, ys = scan_apply(body_dict, h0, params)
    assert ys["s"].shape == (L,) and ys["m"].shape == (L,)
