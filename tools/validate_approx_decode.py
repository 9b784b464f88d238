"""Adversarial in-model study of the approximate candidate selection on TPU.

tests/test_fused_head_adversarial.py pins the selection math on CPU (the
approximations' only failure mode is a bucket/window collision, verified
against the analytic prediction under near-tie margins).  This tool runs the
same study at FLAGSHIP dims on the real TPU, where the approximations
actually execute (CPU lowers approx_max_k to exact top-k):

  1. per-step candidate recall@9 (beam-4's 2K+1 slate) of each approximate
     mode vs exact top-k, measured on teacher-forced positions of beam-4
     sequences >= 20 tokens long.  Random-init weights are the NEAR-TIE
     WORST CASE (logit margins are tiny everywhere); --perturb adds scaled
     noise to shaped embeddings for a mass-concentrated ("trained-like")
     regime.
  2. end-sequence agreement: full beam-4 generates, exact vs bucket vs
     the dense approx_max_k path, with beam-score deltas for rows that
     diverge.

Fallback policy (documented in PERFORMANCE.md): the approximations drop a
true top-j candidate only on an id collision (same residue mod 512 /
same 128-window), so recall is a property of WHICH ids score high, not of
the margins.  If a deployment measures per-step recall@2K+1 < 0.95 with
this tool, serve with MIC_TPU_FUSED_SELECT=exact (fused head, exact
in-kernel select) or MIC_TPU_EXACT_TOPK=1 (dense path) — both exact, ~1.5
ms/step slower at B=256.

  python tools/validate_approx_decode.py [--batch 16] [--max-length 24]
                                         [--perturb 0.0]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


K_SLATE = 9  # beam-4's 2K+1 candidate slate


def per_step_recall(logits, k=K_SLATE):
    """(N, V) f32 -> dict of per-mode mean recall vs exact top-k."""
    from mic_tpu.ops.fused_head import (
        _bucket_topk_dense,
        _window_topk_dense,
    )

    ev, ei = jax.lax.top_k(logits, k)
    _, bi = _bucket_topk_dense(logits, k, 512)
    _, wi = _window_topk_dense(logits, k)
    av, ai = jax.lax.approx_max_k(logits, k)

    def recall(ids):
        hit = (ids[:, :, None] == ei[:, None, :]).any(axis=-1)
        return float(jnp.mean(jnp.sum(hit, axis=-1) / k))

    return {
        "bucket(512)": recall(bi),
        "window(128)": recall(wi),
        "approx_max_k": recall(ai),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--max-length", type=int, default=24)
    p.add_argument("--perturb", type=float, default=0.0,
                   help="scale of embedding shaping toward a trained-like "
                        "mass-concentrated logit regime (0 = random init, "
                        "the near-tie worst case)")
    args = p.parse_args(argv)

    from mic_tpu.core.config import CaptionerConfig
    from mic_tpu.core.params import make_serving_params
    from mic_tpu.models.captioner import Captioner

    config = CaptionerConfig.clip_vit_b32_mbart50(dtype="bfloat16")
    model = Captioner(config)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    if args.perturb:
        # concentrate mass: scale a random low-rank direction into the
        # shared embedding so a few hundred ids dominate, like a trained LM
        emb = params["shared"]["embedding"]
        g = jax.random.normal(jax.random.PRNGKey(1), (emb.shape[0], 1))
        params = dict(params)
        params["shared"] = dict(params["shared"])
        params["shared"]["embedding"] = emb * (1 + args.perturb * g)
    params = make_serving_params(params)

    rng = np.random.default_rng(0)
    px = jnp.asarray(
        rng.integers(0, 255, size=(args.batch, 224, 224, 3), dtype=np.uint8)
        .astype(np.float32) / 255.0
    )

    def gen(tag):
        @jax.jit
        def run(params, px):
            return model.generate(
                params, px, max_length=args.max_length, num_beams=4,
                forced_bos_token_id=250004, forced_eos_token_id=None,
                min_length=args.max_length - 1,
            )
        out = run(params, px)
        return np.asarray(out.sequences), np.asarray(out.scores)

    # -- end-sequence agreement --------------------------------------------
    os.environ["MIC_TPU_FUSED_SELECT"] = "exact"
    os.environ["MIC_TPU_FUSED_HEAD"] = "1"
    e_seq, e_sc = gen("exact")
    os.environ["MIC_TPU_FUSED_SELECT"] = "bucket"
    b_seq, b_sc = gen("bucket")
    del os.environ["MIC_TPU_FUSED_SELECT"]
    os.environ["MIC_TPU_FUSED_HEAD"] = "0"  # dense path -> approx_max_k
    a_seq, a_sc = gen("approx")
    del os.environ["MIC_TPU_FUSED_HEAD"]

    for tag, seq, sc in (("bucket", b_seq, b_sc), ("approx_max_k", a_seq, a_sc)):
        agree = (seq == e_seq).all(axis=1)
        deltas = np.abs(sc - e_sc)[~agree]
        print(
            f"end-sequence agreement vs exact [{tag}]: "
            f"{agree.mean():.3f} ({int(agree.sum())}/{len(agree)}); "
            f"diverging-row |score delta| max "
            f"{deltas.max() if len(deltas) else 0.0:.4f}"
        )

    # -- per-step recall on teacher-forced positions ------------------------
    enc = model.encode(params, px)
    seqs = jnp.asarray(e_seq)
    logits = model.decode_train(params, enc, seqs, jnp.ones_like(seqs))
    n = logits.shape[0] * logits.shape[1]
    logits = logits.reshape(n, -1).astype(jnp.float32)
    # chunk the (N, 250054) f32 rows to bound HBM
    rows = []
    for i in range(0, n, 128):
        rows.append(per_step_recall(logits[i : i + 128]))
    table = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    print(f"per-step candidate recall@{K_SLATE} over {n} teacher-forced "
          f"positions (perturb={args.perturb}):")
    for k, v in table.items():
        print(f"  {k:14s} {v:.4f}")
    if min(table.values()) < 0.95:
        print("BELOW the 0.95 fallback threshold: serve with "
              "MIC_TPU_FUSED_SELECT=exact / MIC_TPU_EXACT_TOPK=1")


if __name__ == "__main__":
    main()
