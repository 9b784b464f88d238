"""Micro-bench: decode-cache column-write strategies on the real TPU.

The lazy decode cache writes ONE time column per layer per step.  How that
write lowers depends entirely on the storage layout:

  4dim    (B*K, T, H, Dh)  — the (16, 64) trailing block is tile-aligned
                             (fast write) but lane-padded to (16, 128) in HBM
                             (2x cache bytes on every read).
  merged  (B*K, T, HD)     — padding-free reads, but a (B*K, 1, HD) write
                             touches ONE sublane of every (8, 128) tile: a
                             read-modify-write of the full tile set
                             (~16 MB/array, profiled 0.06 ms vs 0.004).
  flat    (B*K, T*HD)      — same bytes as merged (bitcast); the write is a
                             1024-lane band at dynamic lane offset
                             index*HD: every touched (8, 128) tile is fully
                             covered (all 512 sublane rows, aligned lanes).
  dma     merged storage, written by a Pallas kernel holding the cache in
                             ANY memory space (input_output_aliased) issuing
                             ONE strided async_copy VMEM -> HBM.

  python tools/bench_cache_write.py [--t 48] [--reps 200]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dma_write_kernel(cache_ref, col_ref, idx_ref, out_ref, sem):
    del out_ref  # aliased with cache_ref: the DMA below IS the output write
    idx = idx_ref[0]
    copy = pltpu.make_async_copy(
        col_ref, cache_ref.at[:, pl.ds(idx, 1), :], sem
    )
    copy.start()
    copy.wait()


@functools.partial(jax.jit, donate_argnums=(0,))
def dma_write(cache, col, idx):
    """cache (R, T, HD) merged; col (R, 1, HD); ONE strided DMA writes the
    column in place (input_output_aliased, cache never copied)."""
    r, t, hd = cache.shape
    return pl.pallas_call(
        _dma_write_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        input_output_aliases={0: 0},
    )(cache, col, jnp.asarray([idx], jnp.int32))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rows", type=int, default=512)
    p.add_argument("--t", type=int, default=48)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--head_dim", type=int, default=64)
    p.add_argument("--reps", type=int, default=200)
    args = p.parse_args(argv)
    R, T, H, Dh = args.rows, args.t, args.heads, args.head_dim
    HD = H * Dh

    rng = np.random.default_rng(0)
    col = jnp.asarray(
        rng.normal(size=(R, 1, HD)).astype(np.float32), jnp.bfloat16
    )

    def timed(name, make, step):
        @jax.jit
        def loop(cache, col):
            def body(carry, i):
                return step(carry, col, i % T), None

            carry, _ = jax.lax.scan(
                body, cache, jnp.arange(args.reps, dtype=jnp.int32)
            )
            return carry

        cache = make()
        out = loop(cache, col)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(make(), col))
        dt = (time.perf_counter() - t0) / args.reps
        mb = R * HD * 2 / 1e6
        print(f"{name:8s} {dt*1e6:8.1f} us/write  ({mb/dt/1e3:.0f} GB/s of "
              f"{mb:.1f} MB payload)")

    timed(
        "4dim",
        lambda: jnp.zeros((R, T, H, Dh), jnp.bfloat16),
        lambda c, col, i: jax.lax.dynamic_update_slice(
            c, col.reshape(R, 1, H, Dh), (0, i, 0, 0)
        ),
    )
    timed(
        "merged",
        lambda: jnp.zeros((R, T, HD), jnp.bfloat16),
        lambda c, col, i: jax.lax.dynamic_update_slice(c, col, (0, i, 0)),
    )
    timed(
        "flat",
        lambda: jnp.zeros((R, T * HD), jnp.bfloat16),
        lambda c, col, i: jax.lax.dynamic_update_slice(
            c, col.reshape(R, HD), (0, i * HD)
        ),
    )
    timed(
        "dma",
        lambda: jnp.zeros((R, T, HD), jnp.bfloat16),
        lambda c, col, i: dma_write(c, col, i),
    )


if __name__ == "__main__":
    main()
