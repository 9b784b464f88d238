"""Train state: one pytree carrying everything a step mutates.

Unlike the reference's flax TrainState + separate msgpack'd opt_state
(main.py:247-251, 299-357), this is a plain NamedTuple — jit/donate/shard/
checkpoint all see one pytree, and full resume is restoring one object.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray        # int32 scalar
    dropout_rng: jax.Array
    # compute-dtype shadow of the bf16-consumed param leaves
    # (train/shadow.py) — None when disabled; stripped from checkpoints
    # and rebuilt on restore (it is a pure cast of params)
    shadow: Any = None

    @classmethod
    def create(cls, params: Any, optimizer: optax.GradientTransformation,
               seed: int = 0, shadow_dtype=None):
        shadow = None
        if shadow_dtype is not None:
            from mic_tpu.train.shadow import cast_shadow, shadow_spec

            shadow = cast_shadow(
                params, shadow_spec(params, shadow_dtype), shadow_dtype
            )
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            dropout_rng=jax.random.PRNGKey(seed),
            shadow=shadow,
        )


def make_optimizer(
    learning_rate_fn,
    *,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: float | None = None,
    mu_dtype=None,
    nu_dtype=None,
    fused: bool = True,
):
    """AdamW with no decay on LayerNorm/bias params (standard practice; the
    reference decayed everything uniformly via optax.adamw, main.py:629-635).

    `fused=True` (default) returns the single-pass FusedAdamW
    (train/fused_adamw.py): same math as optax.adamw to float tolerance
    (tests/test_fused_adamw.py) but new params + moments in one HBM
    traversal — ~16 ms/step faster at the flagship shape, where optax's
    updates-tree-then-apply costs two round-trips over the 1 GB embedding
    slab.  `fused=False` gives the plain optax chain.  Either way, apply
    one step with `fused_adamw.apply_gradients(optimizer, params, grads,
    opt_state)`.

    `mu_dtype`/`nu_dtype` store the adam moments reduced-precision (update
    math stays f32 — see fused_adamw.make_fused_adamw).  Env override:
    MIC_TPU_MOMENT_DTYPE sets BOTH when set (deployment A/B lever, resolved
    here).  `nu_dtype` needs the fused path: optax.adamw only supports
    mu_dtype, so fused=False raises rather than silently keeping f32 nu."""
    from mic_tpu.core.knobs import override

    md = override("MIC_TPU_MOMENT_DTYPE")
    if md is not None:
        mu_dtype = nu_dtype = md
    # "float32" (the config default) == f32 master-dtype moments == None
    norm = lambda d: None if d in (None, "", "float32", "f32") else d
    mu_dtype, nu_dtype = norm(mu_dtype), norm(nu_dtype)

    def decay_mask(params):
        def is_decayed(path, leaf):
            del leaf
            names = {getattr(k, "key", getattr(k, "name", "")) for k in path}
            return not ({"bias", "scale", "final_logits_bias"} & names)

        return jax.tree_util.tree_map_with_path(is_decayed, params)

    if fused:
        from mic_tpu.train.fused_adamw import make_fused_adamw

        return make_fused_adamw(
            learning_rate_fn, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype,
            nu_dtype=nu_dtype, weight_decay=weight_decay,
            decay_mask_fn=decay_mask if weight_decay > 0 else None,
            max_grad_norm=max_grad_norm,
        )
    if nu_dtype is not None:
        raise ValueError(
            "nu_dtype requires the fused optimizer (optax.adamw keeps nu f32)"
        )
    tx = optax.adamw(
        learning_rate=learning_rate_fn, b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype,
        weight_decay=weight_decay, mask=decay_mask if weight_decay > 0 else None,
    )
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
