"""Stacked-layer utilities: init with vmap, apply with lax.scan.

All transformer stacks in mic_tpu store their per-layer params with a leading
layer axis (every leaf is (L, ...)) and are applied with `lax.scan`.  On TPU
this compiles the layer body once instead of L times (a large compile-time win,
especially inside the beam-search `while_loop`) and gives `jax.checkpoint` a
natural per-layer remat boundary.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.knobs import experimental


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

    # MIC_TPU_CUSTOM_SCAN_VJP=1: hand-written backward-as-reverse-scan.
    # The autodiff transpose of lax.scan accumulates per-layer param grads
    # with dynamic-update-slices the TPU backend turns into full-slab
    # read-modify-writes (~24.9 ms/step at the flagship train shape —
    # PERFORMANCE.md train budget).  Here the backward is its own reverse
    # scan whose per-layer grads leave as scan YS (one aligned write per
    # layer into the preallocated output) and whose per-layer forward is
    # recomputed via jax.vjp (== full remat; the "masks" policy's saved
    # dropout masks do not apply on this path).  Experiment knob.
    if experimental("custom_scan_vjp") == "1":
        return _scan_custom_vjp(scan_body, h, (stacked_params, idxs,
                                               per_layer_xs))
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
    # MIC_TPU_EXPERIMENTAL=unroll_layers: apply the layers as a Python loop over STATIC
    # param slices instead of lax.scan.  Compiles the body L times (slower
    # build) but frees XLA from the scan backward's structural costs — the
    # per-layer grad-slab dynamic-update-slices and the xs->ys cache
    # double-buffering become static-index updates it can fuse.  Experiment
    # knob for the train step (PERFORMANCE.md train budget).
    if experimental("unroll_layers") == "1":
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
    split = experimental("scan_split_transpose") == "1"
    return jax.lax.scan(
        scan_body, h, (stacked_params, idxs, per_layer_xs),
        _split_transpose=split,
    )


def _scan_custom_vjp(scan_body, h, xs):
    """lax.scan with a hand-written VJP (see scan_apply's experiment knob).

    scan_body may close over differentiable arrays (enc_states, masks) and
    integer ones (rng keys): jax.closure_convert hoists them into explicit
    arguments; float cotangents accumulate in the backward carry (summed
    across layers), integer arguments get float0 cotangents.  Residuals are
    only the per-layer carry inputs — each layer's forward is recomputed in
    the backward via jax.vjp (full-remat semantics).
    """
    xs0 = jax.tree.map(lambda a: a[0], xs)
    conv, consts = jax.closure_convert(scan_body, h, xs0)
    # conv(h, x, *consts) -> (h, ys)
    fi = [i for i, c in enumerate(consts)
          if jnp.issubdtype(jnp.result_type(c), jnp.inexact)]
    ii = [i for i, c in enumerate(consts) if i not in fi]
    fc = tuple(consts[i] for i in fi)
    ic = tuple(consts[i] for i in ii)

    def merge(fcs, ics):
        out = [None] * len(consts)
        for i, c in zip(fi, fcs):
            out[i] = c
        for i, c in zip(ii, ics):
            out[i] = c
        return out

    @jax.custom_vjp
    def run(h, xs, fc, ic):
        def step(c, x):
            return conv(c, x, *merge(fc, ic))
        return jax.lax.scan(step, h, xs)

    def run_fwd(h, xs, fc, ic):
        def step(c, x):
            c2, ys = conv(c, x, *merge(fc, ic))
            return c2, (c, ys)  # residual: this layer's INPUT carry
        hT, (h_ins, ys) = jax.lax.scan(step, h, xs)
        return (hT, ys), (h_ins, xs, fc, ic)

    def run_bwd(res, cts):
        h_ins, xs, fc, ic = res
        dhT, dys = cts

        def step(carry, x):
            dh, dfc = carry
            h_in, x_l, dys_l = x

            def layer(hh, xx, *ff):
                return conv(hh, xx, *merge(ff, ic))

            _, vjp = jax.vjp(layer, h_in, x_l, *fc)
            dh2, dx_l, *dfl = vjp((dh, dys_l))
            dfc = tuple(a + b for a, b in zip(dfc, dfl))
            return (dh2, dfc), dx_l

        zeros_fc = tuple(jnp.zeros(c.shape, c.dtype) for c in fc)
        (dh0, dfc), dxs = jax.lax.scan(
            step, (dhT, zeros_fc), (h_ins, xs, dys), reverse=True
        )
        import numpy as _np
        dic = tuple(
            _np.zeros(c.shape, jax.dtypes.float0) for c in ic
        )
        return dh0, dxs, dfc, dic

    run.defvjp(run_fwd, run_bwd)
    return run(h, xs, fc, ic)
