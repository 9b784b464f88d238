"""Jitted train/eval/generate steps over a sharded mesh.

The reference wrapped these in `jax.pmap(..., "batch")` with explicit
`lax.pmean` all-reduces (main.py:684-735).  Here each step is a plain function
jitted with `NamedSharding`s: the batch arrives sharded over the "data" axis,
params follow the rule table (mic_tpu/parallel/sharding.py), and GSPMD emits
the gradient all-reduce over ICI on its own.  Donation of the train state
gives in-place buffer reuse (the pmap `donate_argnums` equivalent).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mic_tpu.models.captioner import Captioner
from mic_tpu.train.fused_adamw import apply_gradients
from mic_tpu.train.loss import label_smoothed_cross_entropy
from mic_tpu.train.state import TrainState


# Pad-prepend shift (reference main.py:362-369): the training decoder start
# token is PAD, while generation starts from EOS/lang-code — a quirky but
# load-bearing asymmetry of the reference that we preserve. Implementation
# lives in the (JAX-free) loader module so data workers stay lightweight.
from mic_tpu.data.loader import shift_tokens_right  # noqa: F401,E402


def make_train_step(
    model: Captioner,
    optimizer: optax.GradientTransformation,
    label_smoothing: float = 0.0,
    lr_fn: Callable | None = None,
) -> Callable:
    """batch: {pixel_values (B,H,W,3), labels (B,T), decoder_input_ids (B,T),
    decoder_attention_mask (B,T)} -> (new_state, metrics)."""

    from mic_tpu.train.shadow import shadow_spec, shadowed_params

    def train_step(state: TrainState, batch):
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params):
            logits = model(
                shadowed_params(params, state.shadow),
                batch["pixel_values"],
                batch["decoder_input_ids"],
                batch["decoder_attention_mask"],
                rng=step_rng,
            )
            return label_smoothed_cross_entropy(
                logits, batch["labels"], batch["decoder_attention_mask"],
                label_smoothing,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        sh_spec = (
            shadow_spec(state.params, model.dtype)
            if state.shadow is not None else None
        )
        out = apply_gradients(
            optimizer, state.params, grads, state.opt_state,
            shadow_spec=sh_spec, shadow_dtype=model.dtype,
        )
        new_state = TrainState(
            params=out[0], opt_state=out[1], step=state.step + 1,
            dropout_rng=state.dropout_rng,
            shadow=out[2] if len(out) == 3 else None,
        )
        metrics = {"loss": loss}
        if lr_fn is not None:
            metrics["learning_rate"] = lr_fn(state.step)
        return new_state, metrics

    return train_step


def make_eval_step(model: Captioner, label_smoothing: float = 0.0) -> Callable:
    def eval_step(params, batch):
        logits = model(
            params,
            batch["pixel_values"],
            batch["decoder_input_ids"],
            batch["decoder_attention_mask"],
        )
        loss = label_smoothed_cross_entropy(
            logits, batch["labels"], batch["decoder_attention_mask"], label_smoothing
        )
        return {"loss": loss}

    return eval_step


def make_generate_step(model: Captioner, **gen_kwargs) -> Callable:
    def generate_step(params, pixel_values, start_token_id):
        out = model.generate(
            params, pixel_values, decoder_start_token_id=start_token_id, **gen_kwargs
        )
        return out.sequences

    return generate_step


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
