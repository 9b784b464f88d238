"""Microbench: AdamW update on the flagship embedding slab (250054, 1024).

The train profile attributes ~26 ms/step to the embedding's XLA adamw
mega-fusion (three 1 GB f32 outputs) against a ~8.5 ms HBM floor
(7 GB of read+write at 819 GB/s).  This times the update in isolation:

  1. XLA fused jnp expression (donated inputs)
  2. same at the MLP-slab shape (12, 4096, 1024) for reference

  PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon python3 tools/bench_adamw.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def adamw_update(p, g, m, v, count):
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 5e-5
    c = count + 1
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * g * g
    mhat = m2 / (1.0 - b1 ** c.astype(jnp.float32))
    vhat = v2 / (1.0 - b2 ** c.astype(jnp.float32))
    p2 = p - lr * mhat / (jnp.sqrt(vhat) + eps)
    # tiny-slice probe: reading this scalar on the host forces the whole
    # executable (the relay's block_until_ready can return early)
    probe = p2.ravel()[:8].sum() + m2.ravel()[:8].sum() + v2.ravel()[:8].sum()
    return p2, m2, v2, c, probe


def bench(shape, inner=16, reps=4, label=""):
    """Median time of ONE update, measured as an inner lax.scan of `inner`
    updates per dispatch (amortizes the ~30 ms relay dispatch+readback gap),
    distinct grads per update, scalar probe readback per dispatch."""
    n = int(np.prod(shape))
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, shape, jnp.float32)
    m = jnp.zeros(shape, jnp.float32)
    v = jnp.zeros(shape, jnp.float32)
    count = jnp.zeros((), jnp.int32)

    def many(p, m, v, count, seed):
        def one(carry, i):
            p, m, v, c = carry
            g = jax.random.normal(jax.random.fold_in(seed, i), shape,
                                  jnp.float32)
            p, m, v, c, probe = adamw_update(p, g, m, v, c)
            return (p, m, v, c), probe
        (p, m, v, count), probes = jax.lax.scan(
            one, (p, m, v, count), jnp.arange(inner))
        return p, m, v, count, probes.sum()

    step = jax.jit(many, donate_argnums=(0, 1, 2))
    p, m, v, count, probe = step(p, m, v, count, jax.random.PRNGKey(99))
    np.asarray(probe)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        p, m, v, count, probe = step(p, m, v, count,
                                     jax.random.PRNGKey(100 + r))
        np.asarray(probe)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / inner
    # traffic: read p,g(generated on-chip: free),m,v + write p,m,v = 6 arrays
    gb = n * 4 * 6 / 1e9
    print(f"{label:28s} {dt*1e3:7.2f} ms/update  ({gb/dt:6.0f} GB/s of "
          f"{gb:.1f} GB)", file=sys.stderr)
    return dt


if __name__ == "__main__":
    bench((250054, 1024), label="embedding slab (1 GB f32)")
    bench((12, 4096, 1024), label="MLP slab (201 MB f32)")
    bench((250056, 1024), label="embedding, 8-aligned rows")
