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

    def beam_reorder(self, beam_indices: jnp.ndarray, num_beams: int) -> "DecoderCache":
        """Physical beam reorder: move the self K/V rows with the one-hot
        batch-axis matmul (mic_tpu/ops/beam_permute.py). ~1.6 GB of cache
        read+write per step at the flagship config — LazyDecoderCache below
        avoids the move entirely."""
        from mic_tpu.ops.beam_permute import beam_permute_matmul

        return self._replace(
            self_k=beam_permute_matmul(self.self_k, beam_indices, num_beams),
            self_v=beam_permute_matmul(self.self_v, beam_indices, num_beams),
        )

    def grow(self, new_len: int) -> "DecoderCache":
        """Pad the self K/V time axis to new_len (segmented decoding: the
        decode loop runs in phases over geometrically growing static cache
        sizes, so early steps stream only a prefix-sized cache — a one-time
        copy here buys a smaller per-step read for the whole next phase)."""
        if new_len <= self.max_len:
            return self
        pad = [(0, 0)] * self.self_k.ndim
        pad[2] = (0, new_len - self.max_len)
        return self._replace(
            self_k=jnp.pad(self.self_k, pad),
            self_v=jnp.pad(self.self_v, pad),
        )


class LazyDecoderCache(NamedTuple):
    """Beam-search KV cache that is NEVER physically reordered.

    Row (b, k) of each per-layer self K/V array always holds the K/V written
    by running-beam slot k of image b at each step; which *earlier* slot a
    beam's token at position t actually came from is tracked in ``ancestry``
    (int32, within-group source slot per position).  Attention folds the
    ancestry into its mask (mic_tpu/nn/attention.py mha_decode_step_lazy), so
    a beam reorder is an O(B·K·T) int gather instead of the physical path's
    ~1.6 GB/step cache permute, and the per-step cache write is one column per
    layer (in-place `dynamic_update_slice` on loop-carried buffers — the
    self K/V are a TUPLE of per-layer arrays precisely so XLA can alias each
    layer's update; a stacked (L, ...) array threaded through the layer scan
    double-buffers the whole cache every step, measured ~1.6 GB/step extra).

    Replaces the reference's per-step pytree cache gather
    (generation_clip_vision_utils.py:945-953) with zero data movement.

    Shapes:
      self_k / self_v : L-tuple of (B*K, max_len, H, Dh) — or MERGED
                        (B*K, max_len, H*Dh) when the fused Pallas attention
                        kernel drives decoding: XLA lane-pads a trailing
                        (16, 64) dim pair to (16, 128) (2x physical bytes and
                        a 9.9 ms/layer physical reshape into the kernel's
                        merged view, profiled); the merged layout is padding-
                        free and bitcasts to the kernel's (B, K*T, HD) view
      cross_k/ cross_v: (L, B, enc_len, H, Dh)  — per image, beam-invariant
      ancestry        : (B, K, max_len) int32
      index           : scalar int32 — number of tokens already written.
    """

    self_k: tuple
    self_v: tuple
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    ancestry: jnp.ndarray
    index: jnp.ndarray

    def _kv0(self):
        e = self.self_k[0]
        return e["q"] if isinstance(e, dict) else e

    @property
    def batch(self) -> int:
        return self._kv0().shape[0]

    @property
    def max_len(self) -> int:
        return self._kv0().shape[1]

    @property
    def num_beams(self) -> int:
        return self.ancestry.shape[1]

    def beam_reorder(self, beam_indices: jnp.ndarray, num_beams: int) -> "LazyDecoderCache":
        """Reorder = compose the ancestry with the chosen source slots.

        Positions already written (< index) inherit the source beam's
        ancestry; unwritten positions reset to identity (each slot writes its
        own K/V there on a later step)."""
        gathered = jnp.take_along_axis(
            self.ancestry, beam_indices[:, :, None].astype(jnp.int32), axis=1
        )
        ident = jnp.broadcast_to(
            jnp.arange(num_beams, dtype=jnp.int32)[None, :, None],
            self.ancestry.shape,
        )
        written = (jnp.arange(self.max_len) < self.index)[None, None, :]
        return self._replace(ancestry=jnp.where(written, gathered, ident))

    def grow(self, new_len: int) -> "LazyDecoderCache":
        """Pad the self K/V time axis (and ancestry) to new_len — see
        DecoderCache.grow.  New positions are unwritten, so their ancestry is
        the identity (each slot writes its own K/V there later), matching
        beam_reorder's reset convention."""
        cur = self.max_len
        if new_len <= cur:
            return self
        ext = new_len - cur

        def pad_t(a):  # pad axis 1 (time) whatever the trailing rank
            pad = [(0, 0)] * a.ndim
            pad[1] = (0, ext)
            return jnp.pad(a, pad)

        def pad_kv(e):
            if isinstance(e, dict):  # int8 KV: values + per-(row,pos,head) scales
                return {"q": pad_t(e["q"]), "s": pad_t(e["s"])}
            return pad_t(e)

        b, k, _ = self.ancestry.shape
        ident_ext = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, :, None], (b, k, ext)
        )
        return self._replace(
            self_k=tuple(pad_kv(e) for e in self.self_k),
            self_v=tuple(pad_kv(e) for e in self.self_v),
            ancestry=jnp.concatenate([self.ancestry, ident_ext], axis=2),
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


def init_lazy_cache(
    num_layers: int,
    batch: int,          # true batch (images)
    num_beams: int,
    max_len: int,
    enc_len: int,
    num_heads: int,
    head_dim: int,
    dtype=jnp.float32,
    kv_quant: str | None = None,
    merged: bool = False,
) -> LazyDecoderCache:
    """kv_quant="int8" stores the self K/V as int8 with per-(row, position,
    head) f32 scales — halves the decode loop's dominant HBM stream (the
    cache read) at ~0.4% attention-output quantization noise (opt-in,
    BLEU-validated by tools/validate_fast_decode.py).

    merged=True stores the self K/V with the head dims merged,
    (B*K, T, H*Dh) — the layout the fused Pallas decode-attention kernel
    consumes; padding-free on TPU (see LazyDecoderCache docstring)."""
    if kv_quant == "int8":
        # merged int8 (the fused DMA kernel's layout) quantizes per ROW —
        # one (B*K, T) scale plane; Mosaic rejects the sub-128-lane slices a
        # per-head scale tile would take in-kernel.  The canonical 4-dim
        # int8 cache keeps per-(row, position, head) scales.
        if merged:
            kv = {
                "q": jnp.zeros(
                    (batch * num_beams, max_len, num_heads * head_dim),
                    jnp.int8,
                ),
                "s": jnp.zeros((batch * num_beams, max_len), jnp.float32),
            }
        else:
            kv = {
                "q": jnp.zeros(
                    (batch * num_beams, max_len, num_heads, head_dim),
                    jnp.int8,
                ),
                "s": jnp.zeros(
                    (batch * num_beams, max_len, num_heads), jnp.float32
                ),
            }
    elif kv_quant:
        raise ValueError(f"unsupported kv_quant: {kv_quant!r}")
    elif merged:
        kv = jnp.zeros(
            (batch * num_beams, max_len, num_heads * head_dim), dtype
        )
    else:
        kv = jnp.zeros((batch * num_beams, max_len, num_heads, head_dim), dtype)
    xkv = jnp.zeros((num_layers, batch, enc_len, num_heads, head_dim), dtype)
    ancestry = jnp.broadcast_to(
        jnp.arange(num_beams, dtype=jnp.int32)[None, :, None],
        (batch, num_beams, max_len),
    )
    return LazyDecoderCache(
        self_k=tuple(kv for _ in range(num_layers)),
        self_v=tuple(kv for _ in range(num_layers)),
        cross_k=xkv, cross_v=xkv,
        ancestry=jnp.asarray(ancestry),
        index=jnp.zeros((), jnp.int32),
    )
