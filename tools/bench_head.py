"""Microbenchmark: candidate-selection head variants at decode shapes.

Compares, at the flagship decode step shape (N rows = batch x beams,
D=1024, V=250054), the per-step cost of:

  dense-approx : bf16 dot -> (N, V) logits -> approx_max_k (+ lse on the
                 survivors) — the current default path's head portion
  dense-exact  : bf16 dot -> top_k custom-call + logsumexp
  fused        : ops/fused_head.fused_head_topk (Pallas, one weight stream)
  fused-q8     : ops/fused_head.fused_head_topk_q8 (int8 weights+acts)
  dense-q8     : int8 dot (ops/quant) -> dense logits -> approx_max_k

Run on the real TPU:  python tools/bench_head.py [--n 512] [--k 9] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D = 1024
V = 250054


LOOP = 32


def looped(head_fn):
    """Wrap a head fn in a LOOP-long fori_loop with a sequential data
    dependency (next h depends on this step's output).  The TPU relay here
    adds ~30 ms of per-dispatch latency and dedupes same-input dispatches,
    so per-op cost is only measurable amortized inside ONE dispatch."""

    @jax.jit
    def run(h0, *rest):
        def body(i, carry):
            h, acc = carry
            lp = head_fn(h, *rest)[0]
            s = jnp.sum(lp) * 1e-8
            return (h0 + s.astype(h0.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, LOOP, body, (h0, jnp.float32(0)))
        return acc

    return run


def measure(fn, args_list, reps):
    """Median per-op ms: reps dispatches of the LOOP-iteration jit, distinct
    h0 per dispatch (relay dedup), host readback each time."""
    np.asarray(fn(*args_list[0]))  # compile
    times = []
    for r in range(reps):
        a = args_list[(r + 1) % len(args_list)]
        t0 = time.perf_counter()
        np.asarray(fn(*a))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3 / LOOP


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--only", default="", help="comma list of variant names")
    args = ap.parse_args()
    n, k = args.n, args.k

    rng = jax.random.PRNGKey(0)
    r2, r3, *hr = jax.random.split(rng, 2 + 8)
    hiddens = [jax.random.normal(r, (n, D), jnp.bfloat16) for r in hr]
    weight = jax.random.normal(r2, (V, D), jnp.bfloat16) * 0.02
    bias = jax.random.normal(r3, (V,), jnp.float32) * 0.01

    from mic_tpu.ops.fused_head import fused_head_topk, fused_head_topk_q8
    from mic_tpu.ops.quant import quantize_array, quantize_rows_dynamic

    wq, ws = jax.jit(lambda w: quantize_array(w, axis=1))(weight)
    jax.block_until_ready((wq, ws))

    def dense_approx(h, w, b):
        logits = jax.lax.dot_general(
            h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + b
        vals, ids = jax.lax.approx_max_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids

    def dense_exact(h, w, b):
        logits = jax.lax.dot_general(
            h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + b
        vals, ids = jax.lax.top_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids

    def dense_q8(h, w8, s8, b):
        xq, xs = quantize_rows_dynamic(h)
        acc = jax.lax.dot_general(
            xq, w8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        logits = acc.astype(jnp.float32) * xs * s8[None, :] + b
        vals, ids = jax.lax.approx_max_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids

    wt = jnp.asarray(weight.T)            # (D, V) pre-transposed, like the
    wqt = jnp.asarray(wq.T)               # captioner does outside the loop

    def fused(h, w, b):
        return fused_head_topk(h, w, b, k)

    def fused_q8(h, w8, s8, b):
        return fused_head_topk_q8(h, w8, s8, b, k)

    def fused_win(h, w, b):
        return fused_head_topk(h, w, b, k, "window")

    def fused_q8_win(h, w8, s8, b):
        return fused_head_topk_q8(h, w8, s8, b, k, "window")

    def fused_bkt(h, w, b):
        return fused_head_topk(h, w, b, k, "bucket")

    def fused_q8_bkt(h, w8, s8, b):
        return fused_head_topk_q8(h, w8, s8, b, k, "bucket")

    rows = [
        ("dense-approx", looped(dense_approx), [(h, weight, bias) for h in hiddens]),
        ("dense-exact", looped(dense_exact), [(h, weight, bias) for h in hiddens]),
        ("dense-q8", looped(dense_q8), [(h, wq, ws, bias) for h in hiddens]),
        ("fused", looped(fused), [(h, wt, bias) for h in hiddens]),
        ("fused-q8", looped(fused_q8), [(h, wqt, ws, bias) for h in hiddens]),
        ("fused-win", looped(fused_win), [(h, wt, bias) for h in hiddens]),
        ("fused-q8-win", looped(fused_q8_win), [(h, wqt, ws, bias) for h in hiddens]),
        ("fused-bkt", looped(fused_bkt), [(h, wt, bias) for h in hiddens]),
        ("fused-q8-bkt", looped(fused_q8_bkt), [(h, wqt, ws, bias) for h in hiddens]),
    ]
    print(f"n={n} k={k} D={D} V={V}  (bf16 weight = {V*D*2/1e6:.0f} MB, "
          f"int8 = {V*D/1e6:.0f} MB; ~440 GB/s floor: "
          f"{V*D*2/440e6:.2f} / {V*D/440e6:.2f} ms)")
    only = [x for x in args.only.split(",") if x]
    for name, fn, a_list in rows:
        if only and name not in only:
            continue
        try:
            ms = measure(fn, a_list, args.reps)
            print(f"{name:14s} {ms:8.3f} ms")
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
