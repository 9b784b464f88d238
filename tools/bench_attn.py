"""Standalone decode-attention bench: XLA lazy path vs the fused kernel.

Times one layer's lazy beam attention at the flagship decode shape, loop-
amortized inside a single dispatch (the TPU relay dedupes same-input
dispatches; distinct carries defeat that).

  python tools/bench_attn.py [--batch 128] [--t 64] [--reps 50]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--t", type=int, default=64)
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args(argv)

    B, K, H, Dh, T = args.batch, args.beams, args.heads, args.head_dim, args.t
    HD = H * Dh
    rng = np.random.default_rng(0)

    from mic_tpu.ops.lazy_attention import (
        build_ancestry_mask, fused_lazy_attention,
    )
    from mic_tpu.ops.quant import quantize_rows_dynamic

    q = jnp.asarray(rng.normal(size=(B, K, HD)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    ck = jnp.asarray(
        rng.normal(size=(B * K, T, H, Dh)).astype(np.float32) * 0.5,
        jnp.bfloat16)
    cv = jnp.asarray(
        rng.normal(size=(B * K, T, H, Dh)).astype(np.float32) * 0.5,
        jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, K, size=(B, K, T)).astype(np.int32))
    amask = build_ancestry_mask(anc, jnp.asarray(T - 1, jnp.int32))
    kq8, ksc = quantize_rows_dynamic(ck)
    vq8, vsc = quantize_rows_dynamic(cv)
    ck8 = {"q": kq8, "s": ksc[..., 0]}
    cv8 = {"q": vq8, "s": vsc[..., 0]}

    def xla_layer(q, ck, cv, anc):
        index = jnp.asarray(T - 1, jnp.int32)
        q4 = q.reshape(B, K, H, Dh)
        kg = ck.reshape(B, K, T, H, Dh)
        vg = cv.reshape(B, K, T, H, Dh)
        scores = jnp.einsum("bkhd,bjthd->bhkjt", q4, kg.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        live = jnp.arange(T) <= index
        sel = anc[:, :, :, None] == jnp.arange(K, dtype=jnp.int32)
        mask = (sel & live[None, None, :, None]).transpose(0, 1, 3, 2)
        scores = jnp.where(mask[:, None], scores, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(scores.reshape(B, H, K, K * T), axis=-1)
        w = w.reshape(B, H, K, K, T).astype(q.dtype)
        out = jnp.einsum("bhkjt,bjthd->bkhd", w, vg.astype(q.dtype),
                         preferred_element_type=q.dtype)
        return out.reshape(B, K, HD)

    def timed(name, fn, *xs):
        @jax.jit
        def loop(q, *xs):
            def body(carry, _):
                out = fn(carry, *xs)
                # feed the output back so reps can't be deduped/overlapped
                return (q + out[..., :HD].astype(q.dtype) * 1e-6), None

            carry, _ = jax.lax.scan(body, q, None, length=args.reps)
            return carry

        jax.block_until_ready(loop(q, *xs))  # compile + warm
        q2 = q + jnp.asarray(1e-3, q.dtype)  # distinct input: defeat dedupe
        t0 = time.perf_counter()
        np.asarray(loop(q2, *xs))            # host readback, not just ready
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        gb = 2 * B * K * T * HD * (1 if "int8" in name else 2) / 1e9
        print(f"{name:24s} {dt:7.3f} ms/layer  ({gb / dt * 1e3:6.1f} GB/s "
              f"cache stream)")
        return dt

    kst = jnp.asarray(rng.normal(size=(B, K, HD)) * 0.5, jnp.bfloat16)
    vst = jnp.asarray(rng.normal(size=(B, K, HD)) * 0.5, jnp.bfloat16)

    timed("xla lazy bf16", xla_layer, ck, cv, anc)
    timed("fused bf16", lambda q, ck, cv, am: fused_lazy_attention(
        q, ck, cv, kst, vst, am, K, H), ck, cv, amask)
    timed("fused int8", lambda q, ck, cv, am: fused_lazy_attention(
        q, ck, cv, kst, vst, am, K, H), ck8, cv8, amask)

    # v3 DMA kernel at a sweep of write indices: flat timing = the kernel is
    # fixed-overhead bound (DMA issue/wait latency per grid cell); timing
    # that scales with index = live-prefix stream/compute bound
    from mic_tpu.ops.lazy_attention import fused_lazy_attention_dma

    ckm = ck.reshape(B * K, T, HD)
    cvm = cv.reshape(B * K, T, HD)

    def timed_dma(name, index):
        idx = jnp.asarray(index, jnp.int32)
        am = build_ancestry_mask(anc, idx)

        @jax.jit
        def loop(q, ckm, cvm):
            def body(carry, _):
                qq, ckc, cvc = carry
                out, ckc, cvc = fused_lazy_attention_dma(
                    qq, ckc, cvc, kst, vst, am, idx, K, H)
                return (qq + out.astype(qq.dtype) * 1e-6, ckc, cvc), None

            carry, _ = jax.lax.scan(body, (q, ckm, cvm), None,
                                    length=args.reps)
            return carry[0]

        jax.block_until_ready(loop(q, ckm, cvm))
        q2 = q + jnp.asarray(1e-3, q.dtype)
        t0 = time.perf_counter()
        np.asarray(loop(q2, ckm, cvm))
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        live_gb = 2 * B * K * index * HD * 2 / 1e9
        print(f"{name:24s} {dt:7.3f} ms/layer  ({live_gb / dt * 1e3:6.1f} "
              f"GB/s live stream)")
        return dt

    for index in (1, 16, 32, 48, T - 1):
        timed_dma(f"dma v3 bf16 idx={index}", index)


if __name__ == "__main__":
    main()
