"""Two behavioral A/Bs on a CONVERGED hard-synthetic model (real TPU).

The color task (make_synthetic.py default) converges to near-deterministic
captions, so every decode mode trivially agrees and every training-numerics
variant converges identically — it cannot discriminate.  The --hard task
(make_synthetic.py --hard) is built so it CAN: 12-20-token captions whose
synonym slots are uniformly sampled at data-generation time, giving the
converged model genuine ~50/50 near-tie continuations exactly where the
approximate candidate selection could change the argmax.

A/B 1 — shadow params (VERDICT r4 item 4): train the same model to
convergence twice, `TrainConfig.shadow_params` on vs off, same seed/data
order; report the loss curves, final eval loss, and per-language beam-4
BLEU of both arms.  The shadow step is documented as within-XLA-noise, not
bit-identical (train/shadow.py) — this is the long-horizon convergence
evidence for the default-on setting.

A/B 2 — exact vs approximate candidate selection (VERDICT r4 item 5): with
the converged shadow-on model, run the full beam-4 decode under each
candidate-selection mode and report (a) per-language BLEU, (b) full-sequence
agreement rate vs exact, with beam-score deltas on diverging rows, and
(c) per-step candidate recall@9 on teacher-forced positions of the trained
model (the trained-weights counterpart of tools/validate_approx_decode.py's
random/perturbed study).  Reference semantics being matched: exact top-2K
selection, generation_clip_vision_utils.py:872-903.

  python tools/data/make_synthetic.py --out /tmp/hard --n 4096 --hard
  python tools/ab_hard_synthetic.py --data /tmp/hard --out /tmp/abrun

Results land in PERFORMANCE.md ("hard-synthetic behavioral A/Bs").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)                        # validate_approx_decode
sys.path.insert(0, os.path.dirname(_here))       # mic_tpu

import numpy as np


def build_trainer(args, shadow: bool):
    from mic_tpu.core.config import (
        CaptionerConfig, DataConfig, TrainConfig, VisionConfig,
    )
    from mic_tpu.train.trainer import Trainer

    # Full mBART-50 decoder (vocab 250054, d_model 1024 — real candidate-
    # select shapes) + tiny vision tower, as in tools/validate_fast_decode.py.
    flagship = CaptionerConfig.clip_vit_b32_mbart50(dtype="bfloat16")
    mc = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=flagship.decoder,
        tie_word_embeddings=True,
        dtype="bfloat16",
    )
    dc = DataConfig(
        train_file=os.path.join(args.data, "train.tsv"),
        validation_file=os.path.join(args.data, "val.tsv"),
        images_dir=os.path.join(args.data, "images"),
        max_seq_length=24,              # hard captions run 12-20 tokens
        num_workers=0,                  # in-process decode (1-core bench VM)
        decode_size=mc.vision.image_size,
    )
    tc = TrainConfig(
        output_dir=os.path.join(args.out, "shadow_on" if shadow else "shadow_off"),
        num_epochs=args.epochs,
        per_device_batch_size=args.batch, learning_rate=args.lr,
        warmup_steps=100, logging_steps=args.log_every, eval_steps=10**9,
        save_steps=10**9, seed=0, gen_eval=False,
        shadow_params=shadow,
    )
    return Trainer(mc, dc, tc)


def train_arm(args, shadow: bool):
    """Train one arm to convergence; return (trainer, state, loss_history,
    eval metrics)."""
    trainer = build_trainer(args, shadow)
    train_loader, eval_loaders = trainer.make_loaders()
    trainer.build(len(train_loader))
    state = trainer.init_or_resume(train_loader)
    losses = []
    step = 0
    while train_loader.epoch < trainer.tc.num_epochs:
        for dev_batch, _ in trainer._device_prefetch(train_loader):
            state, metrics = trainer.p_train_step(state, dev_batch)
            step += 1
            if step % args.log_every == 0:
                loss = float(metrics["loss"])
                losses.append([step, round(loss, 4)])
                print(f"[shadow={'on' if shadow else 'off'}] step {step} "
                      f"loss {loss:.4f}", flush=True)
    trainer.tc = trainer.tc.replace(gen_eval=True)
    trainer.build(steps_per_epoch=1)
    metrics = trainer.evaluate(state.params, eval_loaders)
    metrics = {k: round(float(v), 4) for k, v in metrics.items()
               if "bleu" in k or k.endswith("loss")}
    print(f"[shadow={'on' if shadow else 'off'}] eval {json.dumps(metrics)}",
          flush=True)
    return trainer, state, eval_loaders, losses, metrics


DECODE_MODES = {
    # exact reference-semantics baseline (dense head, exact top-2K)
    "exact": {
        "MIC_TPU_EXACT_TOPK": "1", "MIC_TPU_FUSED_HEAD": "0",
        "MIC_TPU_FUSED_SELECT": "",
    },
    # (the fused-exact in-kernel-select fallback is covered by the oracle
    # tests; dropped here to save one beam compile on the slow-compile relay)
    # fused kernel, bucket select — the TPU serving DEFAULT
    "fused-bucket": {
        "MIC_TPU_EXACT_TOPK": "0", "MIC_TPU_FUSED_HEAD": "1",
        "MIC_TPU_FUSED_SELECT": "bucket",
    },
    # fused kernel, sliding-window select
    "fused-window": {
        "MIC_TPU_EXACT_TOPK": "0", "MIC_TPU_FUSED_HEAD": "1",
        "MIC_TPU_FUSED_SELECT": "window",
    },
    # dense head + jax.lax.approx_max_k candidate select
    "approx_max_k": {
        "MIC_TPU_EXACT_TOPK": "0", "MIC_TPU_FUSED_HEAD": "0",
        "MIC_TPU_FUSED_SELECT": "",
    },
}


def decode_ab(trainer, state, eval_loaders, args):
    """BLEU + sequence agreement + trained-model per-step recall, per mode."""
    import jax
    import jax.numpy as jnp

    from validate_approx_decode import K_SLATE, per_step_recall

    results = {}
    sequences = {}
    scores = {}
    for name, env in DECODE_MODES.items():
        for k, v in env.items():
            if v:
                os.environ[k] = v
            else:
                os.environ.pop(k, None)
        trainer.build(steps_per_epoch=1)  # re-jit generate under this mode
        metrics = trainer.evaluate(state.params, eval_loaders)
        results[name] = {
            k: round(float(v), 4) for k, v in metrics.items() if "bleu" in k
        }
        # full beam-4 sequences on a fixed val batch per language
        seq_rows, score_rows = [], []
        for lang, loader in sorted(eval_loaders.items()):
            loader.next_batch = 0
            batch = next(loader.epoch_iterator(epoch=0))
            batch, n_real = trainer._pad_to_multiple(
                dict(batch), trainer.eval_batch
            )
            dev = trainer._put_batch(batch)
            out = trainer.p_generate_step(
                state.params, dev["pixel_values"],
                jnp.asarray(trainer.tokenizer.lang_code_to_id[lang],
                            jnp.int32),
            )
            seq_rows.append(np.asarray(out)[:n_real])
        sequences[name] = np.concatenate(seq_rows, axis=0)
        print(f"[decode-ab] {name} bleu {json.dumps(results[name])}",
              flush=True)
    for k in list(DECODE_MODES["exact"]):
        os.environ.pop(k, None)

    e_seq = sequences["exact"]
    for name, seq in sequences.items():
        if name == "exact":
            continue
        width = min(seq.shape[1], e_seq.shape[1])
        agree = (seq[:, :width] == e_seq[:, :width]).all(axis=1)
        results[name]["seq_agreement_vs_exact"] = round(float(agree.mean()), 4)
        results[name]["n_diverging"] = int((~agree).sum())
        print(f"[decode-ab] {name} agreement {agree.mean():.4f} "
              f"({int((~agree).sum())} diverging)", flush=True)

    # per-step candidate recall@9 on teacher-forced positions of the
    # TRAINED model (near-tie regime by construction at the synonym slots)
    import jax

    model = trainer.model
    lang, loader = sorted(eval_loaders.items())[0]
    loader.next_batch = 0
    batch = next(loader.epoch_iterator(epoch=0))
    batch, n_real = trainer._pad_to_multiple(dict(batch), trainer.eval_batch)
    dev = trainer._put_batch(batch)
    from mic_tpu.ops.image_prep import maybe_preprocess
    px = maybe_preprocess(
        dev["pixel_values"], trainer.mc.vision.image_size,
        trainer.mc.compute_dtype,
    )
    enc = model.encode(state.params, px)
    seqs = jnp.asarray(sequences["exact"][: px.shape[0]])
    logits = model.decode_train(
        state.params, enc, seqs, jnp.ones_like(seqs)
    )
    n = logits.shape[0] * logits.shape[1]
    flat = logits.reshape(n, -1).astype(jnp.float32)
    rows = [per_step_recall(flat[i: i + 128]) for i in range(0, n, 128)]
    recall = {k: round(float(np.mean([r[k] for r in rows])), 4)
              for k in rows[0]}
    print(f"[decode-ab] trained-model per-step recall@{K_SLATE}: "
          f"{json.dumps(recall)}", flush=True)
    return results, recall


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help="make_synthetic --hard dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--log_every", type=int, default=20)
    ap.add_argument("--skip_shadow_off", action="store_true",
                    help="only train the shadow-on arm (decode A/B only)")
    ap.add_argument("--skip_decode_ab", action="store_true",
                    help="train + eval only (e.g. an optimizer-numerics A/B "
                         "arm driven via MIC_TPU_MOMENT_DTYPE)")
    ap.add_argument("--save_model", action="store_true",
                    help="save the converged primary arm to <out>/model "
                         "(tools/bench_trained.py input: realistic-length "
                         "trained-weights serving numbers)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    report = {}
    trainer, state, eval_loaders, losses_on, eval_on = train_arm(args, True)
    if args.save_model:
        model_dir = os.path.join(args.out, "model")
        trainer.model.save_pretrained(model_dir, state.params)
        trainer.tokenizer.save(os.path.join(model_dir, "tokenizer.json"))
        print(f"saved converged model to {model_dir}", file=sys.stderr)
    report["shadow_on"] = {"losses": losses_on, "eval": eval_on}
    if not args.skip_shadow_off:
        t_off, s_off, el_off, losses_off, eval_off = train_arm(args, False)
        report["shadow_off"] = {"losses": losses_off, "eval": eval_off}
        t_off.ckpt.close()
        del t_off, s_off, el_off

    if not args.skip_decode_ab:
        decode, recall = decode_ab(trainer, state, eval_loaders, args)
        report["decode_ab"] = decode
        report["trained_per_step_recall"] = recall
    trainer.ckpt.close()

    path = os.path.join(args.out, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {path}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
