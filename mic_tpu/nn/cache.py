"""Explicit, stacked KV cache for autoregressive decoding.

A single NamedTuple pytree carries every decoder layer's caches with a leading
layer axis, so:
- `lax.scan` over layers threads per-layer cache slices in/out naturally,
- beam-search reordering is ONE gather over the batch axis of four arrays
  (vs the reference's per-layer pytree gather,
  generation_clip_vision_utils.py:945-953),
- cross-attention K/V are projected once at generation start and never
  recomputed per step (the reference re-projects encoder states every decode
  step inside the layer).

Shapes:
  self_k / self_v : (L, B, max_len, H, Dh)
  cross_k/ cross_v: (L, B, enc_len, H, Dh)
  index           : scalar int32 — number of tokens already written.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DecoderCache(NamedTuple):
    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    index: jnp.ndarray  # int32 scalar

    @property
    def batch(self) -> int:
        return self.self_k.shape[1]

    @property
    def max_len(self) -> int:
        return self.self_k.shape[2]

    def reorder(self, batch_indices: jnp.ndarray) -> "DecoderCache":
        """Gather the SELF cache along its batch axis (beam reordering).
        Cross K/V are stored per true-batch row (shared across beams via
        grouped cross-attention) and never move."""
        return DecoderCache(
            self_k=jnp.take(self.self_k, batch_indices, axis=1),
            self_v=jnp.take(self.self_v, batch_indices, axis=1),
            cross_k=self.cross_k,
            cross_v=self.cross_v,
            index=self.index,
        )

    def reorder_beams(self, beam_indices: jnp.ndarray, num_beams: int) -> "DecoderCache":
        """Beam-search reordering, TPU-fast.

        `beam_indices` (B, K) holds WITHIN-GROUP source beams.  Two tricks vs
        a flat axis-1 gather (which lowers to a ~13%-of-HBM-bandwidth gather
        on TPU, measured 14.8ms/step at the flagship config):
        - the self-attention K/V are permuted with a one-hot (B, K_new, K_old)
          matmul — a streaming contraction that runs at full HBM bandwidth;
        - cross K/V are untouched: within a group every beam shares the same
          image's encoder states, so the permutation is an identity on them.
        """
        k = num_beams
        onehot = jax.nn.one_hot(beam_indices, k, dtype=self.self_k.dtype)  # (B,Kn,Ko)

        def permute(kv: jnp.ndarray) -> jnp.ndarray:
            L, BK, T, H, Dh = kv.shape
            grouped = kv.reshape(L, BK // k, k, T * H * Dh)
            out = jnp.einsum(
                "bnk,lbkf->lbnf", onehot, grouped, preferred_element_type=kv.dtype
            )
            return out.reshape(L, BK, T, H, Dh)

        return DecoderCache(
            self_k=permute(self.self_k),
            self_v=permute(self.self_v),
            cross_k=self.cross_k,
            cross_v=self.cross_v,
            index=self.index,
        )


def init_cache(
    num_layers: int,
    batch: int,
    max_len: int,
    enc_len: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.float32,
) -> DecoderCache:
    kv = jnp.zeros((num_layers, batch, max_len, num_heads, head_dim), dtype)
    xkv = jnp.zeros((num_layers, batch, enc_len, num_heads, head_dim), dtype)
    return DecoderCache(
        self_k=kv, self_v=kv, cross_k=xkv, cross_v=xkv,
        index=jnp.zeros((), jnp.int32),
    )
