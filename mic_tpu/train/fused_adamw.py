"""Single-pass fused AdamW: new params + moments in one traversal.

optax.adamw materializes an `updates` tree (scale_by_adam -> weight decay ->
lr scale) that `optax.apply_updates` then adds to the params in a second
pass.  On TPU at the flagship shape that costs two HBM round-trips over the
1 GB f32 embedding slab per step (~30 ms measured in the train profile:
the 3-output scale_by_adam mega-fusion at 26.2 ms/step plus the apply add
— tools/bench_adamw.py bounds the single-pass traversal at ~12-14 ms).

`FusedAdamW.step(params, grads, state)` computes

    mu'  = b1*mu + (1-b1)*g
    nu'  = b2*nu + (1-b2)*g^2
    p'   = p - lr * ( (mu'/(1-b1^c)) / (sqrt(nu'/(1-b2^c)) + eps) + wd*p )

directly — bit-compatible with optax.adamw's formula (scale_by_adam with
eps_root=0, add_decayed_weights, scale_by_learning_rate), verified to float
tolerance in tests/test_fused_adamw.py — as ONE jnp expression per leaf, so
XLA emits a single 3-output fusion that reads p,g,mu,nu and writes
p',mu',nu'.  Plain jnp keeps it GSPMD-partitionable: under dp/tp/fsdp
meshes the update stays elementwise on whatever shards the leaves already
have (no custom-call opacity).

Global-norm clipping composes in front exactly like optax.chain(
clip_by_global_norm, adamw): the norm is one reduction over the grads and
the scale folds into the elementwise pass.

The reference trained with plain optax.adamw (/root/reference/main.py:629-645);
this is the same optimizer restructured for TPU HBM bandwidth.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray   # int32 scalar, steps applied so far
    mu: Any              # first-moment tree (params-like)
    nu: Any              # second-moment tree (params-like; f32 unless nu_dtype)


class FusedAdamW(NamedTuple):
    """`init(params) -> state`; `step(params, grads, state) -> (params', state')`.

    Not an optax.GradientTransformation on purpose: the whole point is to
    never materialize an `updates` tree.  `make_optimizer(fused=True)`
    returns this; TrainState.create and the trainer branch on the `step`
    attribute.
    """
    init: Callable[[Any], FusedAdamWState]
    step: Callable[[Any, Any, FusedAdamWState], tuple]


def make_fused_adamw(
    learning_rate: Union[float, Callable],
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decay_mask_fn: Optional[Callable] = None,
    max_grad_norm: Optional[float] = None,
    mu_dtype=None,
    nu_dtype=None,
) -> FusedAdamW:
    """``mu_dtype``/``nu_dtype`` store the moments reduced-precision (the
    update math stays f32: moments are upcast on read, rounded on write —
    same contract as optax's ``mu_dtype``, extended to ``nu``).  bf16
    moments halve the optimizer's m/v HBM stream (~4 GB/step at the
    flagship shape); convergence A/B in PERFORMANCE.md."""
    lr_fn = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params) -> FusedAdamWState:
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return FusedAdamWState(jnp.zeros((), jnp.int32), mu, nu)

    def step(params, grads, state: FusedAdamWState, shadow_spec=None,
             shadow_dtype=jnp.bfloat16):
        count = state.count + 1
        cf = count.astype(jnp.float32)
        # scalar strength-reductions: the per-element pass multiplies by
        # precomputed 1/(1-b^c) instead of dividing
        inv_bc1 = 1.0 / (1.0 - b1 ** cf)
        inv_bc2 = 1.0 / (1.0 - b2 ** cf)
        lr = jnp.asarray(lr_fn(state.count), jnp.float32)

        if max_grad_norm is not None:
            # matches optax.clip_by_global_norm: one reduction pass, then the
            # scale folds into the fused elementwise update below
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads)
            ))
            gscale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
        else:
            gscale = None

        mask = decay_mask_fn(params) if decay_mask_fn is not None else None

        def leaf(p, g, mu, nu, decayed, shadowed):
            if gscale is not None:
                g = g * gscale.astype(g.dtype)
            gf = g.astype(jnp.float32)
            mu2 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * gf
            nu2 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * gf * gf
            upd = (mu2 * inv_bc1) / (jnp.sqrt(nu2 * inv_bc2) + eps)
            if weight_decay and decayed:
                upd = upd + weight_decay * p.astype(jnp.float32)
            p2 = (p.astype(jnp.float32) - lr * upd).astype(p.dtype)
            # compute-dtype shadow (train/shadow.py): cast while the updated
            # value is still in registers — one extra fusion output, no
            # separate read pass over the master tree next step
            sh2 = p2.astype(shadow_dtype) if shadowed else p2
            return p2, mu2.astype(mu.dtype), nu2.astype(nu.dtype), sh2

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_mask = (
            treedef.flatten_up_to(mask) if mask is not None
            else [True] * len(flat_p)
        )
        flat_sh = (
            treedef.flatten_up_to(shadow_spec) if shadow_spec is not None
            else [False] * len(flat_p)
        )
        out = [
            leaf(p, g, mu, nu, d, sh)
            for p, g, mu, nu, d, sh in zip(flat_p, flat_g, flat_mu, flat_nu,
                                           flat_mask, flat_sh)
        ]
        new_p = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        new_state = FusedAdamWState(count, new_mu, new_nu)
        if shadow_spec is None:
            return new_p, new_state
        return new_p, new_state, treedef.unflatten([o[3] for o in out])

    return FusedAdamW(init=init, step=step)


def apply_gradients(optimizer, params, grads, opt_state, shadow_spec=None,
                    shadow_dtype=jnp.bfloat16):
    """One optimizer application, fused or optax: returns (params', state'),
    or (params', state', shadow') when ``shadow_spec`` (a bool tree from
    train/shadow.py::shadow_spec) is given.  The fused path emits the shadow
    casts inside the update fusions; the optax path casts in a second pass
    (correctness fallback — same values)."""
    if isinstance(optimizer, FusedAdamW):
        return optimizer.step(params, grads, opt_state, shadow_spec,
                              shadow_dtype)
    import optax

    updates, opt_state = optimizer.update(grads, opt_state, params)
    new_p = optax.apply_updates(params, updates)
    if shadow_spec is None:
        return new_p, opt_state
    from mic_tpu.train.shadow import cast_shadow

    return new_p, opt_state, cast_shadow(new_p, shadow_spec, shadow_dtype)
