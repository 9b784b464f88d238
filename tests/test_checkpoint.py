"""Checkpoint manager behaviors: rotation (save_total_limit) and sharded
restore templates (reference surface: main.py:299-357 rotate_checkpoints)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mic_tpu.io.checkpoint import TrainCheckpointManager, load_params, save_params
from mic_tpu.train.state import TrainState


def make_state(seed):
    params = {"w": jax.random.normal(jax.random.PRNGKey(seed), (4, 4))}
    return TrainState.create(params, optax.sgd(0.1), seed)


def test_rotation_keeps_max_to_keep(tmp_path):
    mgr = TrainCheckpointManager(str(tmp_path), max_to_keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(step, make_state(step), data_meta={"epoch": 0, "next_batch": step})
    mgr.wait()
    kept = sorted(
        int(d) for d in os.listdir(str(tmp_path / "checkpoints")) if d.isdigit()
    )
    assert kept == [3, 4], kept
    assert mgr.latest_step() == 4

    state, meta = mgr.restore(jax.eval_shape(lambda: make_state(0)))
    assert int(jax.device_get(state.step)) == 0  # step field of saved state
    assert meta == {"epoch": 0, "next_batch": 4}
    np.testing.assert_array_equal(
        np.asarray(state.params["w"]), np.asarray(make_state(4).params["w"])
    )
    mgr.close()


def test_params_roundtrip_with_template(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    save_params(str(tmp_path), params)
    restored = load_params(str(tmp_path), template=jax.eval_shape(lambda: params))
    for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
