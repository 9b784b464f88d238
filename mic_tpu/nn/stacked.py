"""Stacked-layer utilities: init with vmap, apply with lax.scan.

All transformer stacks in mic_tpu store their per-layer params with a leading
layer axis (every leaf is (L, ...)) and are applied with `lax.scan`.  On TPU
this compiles the layer body once instead of L times (a large compile-time win,
especially inside the beam-search `while_loop`) and gives `jax.checkpoint` a
natural per-layer remat boundary.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def init_stacked(key, num_layers: int, init_fn: Callable[[jax.Array], Any]):
    """Stack `num_layers` independent inits: every leaf gains a leading L axis."""
    keys = jax.random.split(key, num_layers)
    return jax.vmap(init_fn)(keys)


def num_layers_of(stacked_params) -> int:
    return jax.tree_util.tree_leaves(stacked_params)[0].shape[0]


def scan_apply(
    body: Callable,
    h: jnp.ndarray,
    stacked_params,
    per_layer_xs: Optional[Any] = None,
    remat: "bool | str" = False,
):
    """Run `body(h, layer_params, layer_idx, per_layer_x) -> (h, ys)` over layers.

    Returns (final_h, stacked_ys). `per_layer_xs` leaves must have a leading L
    axis; pass None when the body has no per-layer inputs.

    `remat` selects the per-layer checkpoint policy: False/"none" = no remat;
    True/"full" = recompute everything; "masks" = save dropout masks (the
    backward reuses the forward's bool masks instead of re-deriving the rng
    streams); "dots" = save matmul outputs (backward skips GEMM recompute).
    """
    L = num_layers_of(stacked_params)
    idxs = jnp.arange(L, dtype=jnp.int32)

    def scan_body(carry, xs):
        params, idx, extra = xs
        return body(carry, params, idx, extra)

    if remat and remat != "none":
        policy = None
        if remat == "masks":
            policy = jax.checkpoint_policies.save_only_these_names(
                "dropout_mask"
            )
        elif remat == "dots":
            policy = jax.checkpoint_policies.dots_saveable
        elif remat not in (True, "full"):
            raise ValueError(f"unknown remat policy: {remat!r}")
        scan_body = jax.checkpoint(scan_body, prevent_cse=False, policy=policy)
    # MIC_TPU_UNROLL_LAYERS=1: apply the layers as a Python loop over STATIC
    # param slices instead of lax.scan.  Compiles the body L times (slower
    # build) but frees XLA from the scan backward's structural costs — the
    # per-layer grad-slab dynamic-update-slices and the xs->ys cache
    # double-buffering become static-index updates it can fuse.  Experiment
    # knob for the train step (PERFORMANCE.md train budget).
    if os.environ.get("MIC_TPU_UNROLL_LAYERS") == "1":
        ys_all = []
        for l in range(L):
            xs_l = jax.tree.map(
                lambda a, _l=l: a[_l], (stacked_params, idxs, per_layer_xs)
            )
            h, ys = scan_body(h, xs_l)
            ys_all.append(ys)
        return h, jax.tree.map(lambda *a: jnp.stack(a), *ys_all)
    # _split_transpose splits the scan's backward into a separate loop, which
    # can change how XLA lays out the per-layer grad-slab updates; measured
    # experiment knob (see PERFORMANCE.md train budget: grad-stack DUS row)
    split = os.environ.get("MIC_TPU_SCAN_SPLIT_TRANSPOSE") == "1"
    return jax.lax.scan(
        scan_body, h, (stacked_params, idxs, per_layer_xs),
        _split_transpose=split,
    )
