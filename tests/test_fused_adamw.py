"""FusedAdamW (train/fused_adamw.py) == optax.adamw to float tolerance.

The fused optimizer restructures optax's updates-tree-then-apply into one
traversal (the TPU HBM win, PERFORMANCE.md); these tests pin that the math
is the same: multi-step trajectories with a schedule, weight-decay mask,
global-norm clipping, and mu_dtype, on a nested mixed-shape tree.
Reference semantics: the reference trains with plain optax.adamw
(/root/reference/main.py:629-645).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mic_tpu.train.fused_adamw import (
    FusedAdamW, FusedAdamWState, apply_gradients, make_fused_adamw,
)
from mic_tpu.train.state import TrainState, make_optimizer


def tree(seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    return {
        "layer": {
            "kernel": jax.random.normal(k[0], (16, 32)),
            "bias": jax.random.normal(k[1], (32,)),
        },
        "scale": jax.random.normal(k[2], (8,)),
        "emb": jax.random.normal(k[3], (50, 16)),
    }


def grads_for(params, step):
    return jax.tree.map(
        lambda p: jnp.sin(p * (step + 1)) * 0.1 + 0.01 * p, params
    )


def run_traj(optimizer, params, steps=5):
    state = (
        optimizer.init(params) if isinstance(optimizer, FusedAdamW)
        else optimizer.init(params)
    )
    for s in range(steps):
        g = grads_for(params, s)
        params, state = apply_gradients(optimizer, params, g, state)
    return params, state


def assert_trees_close(a, b, rtol=2e-5, atol=1e-7):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            rtol=rtol, atol=atol,
        )


def lr_schedule(step):
    return 1e-3 * jnp.minimum(1.0, (step + 1) / 3.0)


@pytest.mark.parametrize("case", ["plain", "schedule", "clip"])
def test_matches_optax_adamw(case):
    params = tree()
    lr = lr_schedule if case == "schedule" else 1e-3
    clip = 0.05 if case == "clip" else None

    fused = make_fused_adamw(lr, b1=0.9, b2=0.98, eps=1e-7,
                             max_grad_norm=clip)
    ref_tx = optax.adamw(learning_rate=lr, b1=0.9, b2=0.98, eps=1e-7,
                         weight_decay=0.0)
    if clip is not None:
        ref_tx = optax.chain(optax.clip_by_global_norm(clip), ref_tx)

    p_f, s_f = run_traj(fused, params)
    p_r, _ = run_traj(ref_tx, params)
    assert_trees_close(p_f, p_r)


def test_weight_decay_mask_matches_make_optimizer():
    """make_optimizer(fused=True) vs (fused=False): same decay-mask AdamW."""
    params = tree(1)
    kw = dict(weight_decay=0.02, b1=0.9, b2=0.999, eps=1e-8)
    p_f, s_f = run_traj(make_optimizer(lr_schedule, fused=True, **kw), params)
    p_r, _ = run_traj(make_optimizer(lr_schedule, fused=False, **kw), params)
    assert_trees_close(p_f, p_r)
    # the mask actually did something: decayed vs non-decayed leaves differ
    # from a wd=0 run on exactly the decayed set
    p_nowd, _ = run_traj(
        make_optimizer(lr_schedule, fused=True, weight_decay=0.0), params
    )
    assert not np.allclose(np.asarray(p_f["layer"]["kernel"]),
                           np.asarray(p_nowd["layer"]["kernel"]))
    np.testing.assert_allclose(np.asarray(p_f["layer"]["bias"]),
                               np.asarray(p_nowd["layer"]["bias"]),
                               rtol=1e-6)


def test_mu_dtype_bf16():
    params = tree(2)
    fused = make_fused_adamw(1e-3, mu_dtype=jnp.bfloat16)
    ref = optax.adamw(1e-3, mu_dtype=jnp.bfloat16)
    p_f, s_f = run_traj(fused, params, steps=3)
    p_r, s_r = run_traj(ref, params, steps=3)
    assert jax.tree.leaves(s_f.mu)[0].dtype == jnp.bfloat16
    # bf16 mu storage rounds each step; trajectories agree loosely
    assert_trees_close(p_f, p_r, rtol=5e-3, atol=1e-5)


def test_state_structure_and_trainstate():
    """TrainState.create works with the fused optimizer; moments trees match
    the params structure (what fsdp's state_shardings maps over)."""
    params = tree(3)
    opt = make_optimizer(1e-3)  # fused by default
    assert isinstance(opt, FusedAdamW)
    ts = TrainState.create(params, opt, seed=0)
    assert isinstance(ts.opt_state, FusedAdamWState)
    assert (
        jax.tree.structure(ts.opt_state.mu) == jax.tree.structure(params)
    )
    g = grads_for(params, 0)
    new_p, new_s = apply_gradients(opt, ts.params, g, ts.opt_state)
    assert int(new_s.count) == 1
    assert jax.tree.structure(new_p) == jax.tree.structure(params)


def test_jit_and_grad_dtype_preserved():
    params = jax.tree.map(lambda p: p.astype(jnp.float32), tree(4))
    opt = make_fused_adamw(1e-3)
    state = opt.init(params)
    step = jax.jit(opt.step)
    new_p, new_s = step(params, grads_for(params, 0), state)
    for a, b in zip(jax.tree.leaves(new_p), jax.tree.leaves(params)):
        assert a.dtype == b.dtype and a.shape == b.shape


def test_bf16_moments_track_f32():
    """mu/nu in bf16 (the MIC_TPU_MOMENT_DTYPE lever): moments are stored
    rounded but the update math is f32 — a multi-step trajectory must stay
    within bf16 rounding of the f32-moment reference, and the state dtypes
    must actually be bf16 (the HBM saving is real, not a cast-back)."""
    params = tree()
    opt16 = make_optimizer(lr_schedule, mu_dtype="bfloat16",
                           nu_dtype="bfloat16")
    opt32 = make_optimizer(lr_schedule)
    p16, s16 = run_traj(opt16, params, steps=8)
    p32, _ = run_traj(opt32, params, steps=8)
    for leaf in jax.tree.leaves(s16.mu) + jax.tree.leaves(s16.nu):
        assert leaf.dtype == jnp.bfloat16
    # bf16 relative resolution is 2^-8; 8 steps of moment rounding stays
    # within a few ulps of that on the params
    assert_trees_close(p16, p32, rtol=5e-2, atol=5e-4)


def test_moment_dtype_env_override(monkeypatch):
    monkeypatch.setenv("MIC_TPU_MOMENT_DTYPE", "bfloat16")
    opt = make_optimizer(1e-3)
    st = opt.init(tree())
    for leaf in jax.tree.leaves(st.mu) + jax.tree.leaves(st.nu):
        assert leaf.dtype == jnp.bfloat16


def test_nu_dtype_requires_fused():
    with pytest.raises(ValueError):
        make_optimizer(1e-3, nu_dtype="bfloat16", fused=False)
    # the config default string is NOT a request for reduced precision
    make_optimizer(1e-3, nu_dtype="float32", fused=False)


def test_f32_checkpoint_restores_under_bf16_moment_template(tmp_path):
    """Checkpoint-compat for the round-5 default flip: a checkpoint written
    with f32 moments restores under the bf16-moment default (Orbax casts
    onto the template — a one-time rounding, documented in PERFORMANCE.md;
    pin adam_*_dtype=float32 for bit-exact resume of old runs)."""
    import orbax.checkpoint as ocp

    from mic_tpu.io.checkpoint import TrainCheckpointManager

    params = {"w": jnp.ones((4, 8), jnp.float32)}
    opt32 = make_optimizer(1e-3, mu_dtype="float32", nu_dtype="float32")
    st = TrainState.create(params, opt32, 0)
    g = {"w": jnp.full((4, 8), 0.25, jnp.float32)}
    p2, s2 = apply_gradients(opt32, params, g, st.opt_state)
    st = st._replace(params=p2, opt_state=s2)

    mgr = TrainCheckpointManager(str(tmp_path))
    mgr.save(1, st)
    mgr.manager.wait_until_finished()

    opt16 = make_optimizer(1e-3, mu_dtype="bfloat16", nu_dtype="bfloat16")
    tmpl = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        TrainState.create(params, opt16, 0),
    )
    restored = mgr.manager.restore(1, args=ocp.args.StandardRestore(tmpl))
    mgr.manager.close()
    assert jax.tree.leaves(restored.opt_state.mu)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(restored.opt_state.nu)[0].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.opt_state.mu)[0], np.float32),
        np.asarray(jax.tree.leaves(s2.mu)[0], np.float32), rtol=1e-2,
    )
