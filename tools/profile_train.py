"""Profile the training step on the real TPU and print the op-family table.

Builds EXACTLY bench.py's train step (flash-CE forward + XLA CE backward,
full remat, rbg dropout, donated state) at the production per-device batch,
traces a few steps, and aggregates the xplane into per-family ms/step — the
training twin of tools/profile_serving.py + agg_profile.py.

  python tools/profile_train.py [--batch 128] [--steps 3] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


# Train-step op families.  Leaf ops only (while/cond wrappers include their
# children and are skipped); everything unmatched is bucketed by opcode prefix.
FAMILIES = [
    ("while/cond wrappers", re.compile(r"^%?(while|cond|conditional)")),
    ("flash-CE fwd kernel", re.compile(r"flash_ce|_ce_fwd")),
    ("fused-CE chunk (bwd logits GEMM + grads)", re.compile(r"fused_ce|ce_chunk")),
    # NB: TPU XLA names many dot/GEMM fusions "convolution*", not just the
    # patch-embed conv — this family is "GEMM-ish fusions"
    ("convolution/dot fusions", re.compile(r"convolution")),
    ("rng (dropout masks)", re.compile(r"rng|threefry|philox|rbg|bit-generator")),
    ("copy", re.compile(r"^%?copy")),
    ("dynamic-update", re.compile(r"dynamic-update|update-slice")),
    ("all-reduce/collective", re.compile(r"all-reduce|all-gather|reduce-scatter|collective")),
    ("transpose fusions", re.compile(r"transpose")),
]


def build_step(batch_size: int, seq: int = 64, remat="full", attn="xla"):
    """bench.py's train step, verbatim semantics (bench.py:62-158)."""
    import optax

    jax.config.update("jax_default_prng_impl", "rbg")

    from mic_tpu import CaptionerConfig
    from mic_tpu.models.captioner import Captioner
    from mic_tpu.ops.fused_ce import fused_lm_loss
    from mic_tpu.ops.image_prep import maybe_preprocess
    from mic_tpu.train.schedule import linear_warmup_linear_decay
    from mic_tpu.train.fused_adamw import apply_gradients
    from mic_tpu.train.state import TrainState, make_optimizer

    from mic_tpu.train.shadow import (
        ce_embedding, shadow_spec, shadowed_params,
    )

    config = CaptionerConfig.clip_vit_b32_mbart50(dtype="bfloat16")
    model = Captioner(config, remat=remat, attn_impl=attn)
    # bf16 adam moments, matching TrainConfig/bench.py defaults
    optimizer = make_optimizer(
        linear_warmup_linear_decay(5e-5, 10000, 1000),
        mu_dtype="bfloat16", nu_dtype="bfloat16",
    )
    # compute-dtype shadow params, matching bench.py (MIC_TPU_SHADOW=0 A/B)
    use_shadow = os.environ.get("MIC_TPU_SHADOW", "1") != "0"
    sh_spec = None

    def init_state():
        params = model.init_params(jax.random.PRNGKey(0))
        return TrainState.create(
            params, optimizer, 0,
            shadow_dtype=config.compute_dtype if use_shadow else None,
        )

    state = jax.jit(init_state)()
    jax.block_until_ready(state.params)
    if use_shadow:
        sh_spec = shadow_spec(state.params, config.compute_dtype)

    def train_step(state, batch):
        pixels = maybe_preprocess(
            batch["pixel_values"], config.vision.image_size,
            config.compute_dtype,
        )
        rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params):
            cp = shadowed_params(params, state.shadow)
            vision_rng = jax.random.fold_in(rng, 0x5649)
            enc = model.encode(cp, pixels, rng=vision_rng)
            hidden = model.decode_hidden(
                cp, enc, batch["decoder_input_ids"],
                batch["decoder_attention_mask"], rng,
            )
            return fused_lm_loss(
                hidden, params["shared"]["embedding"],
                params["final_logits_bias"], batch["labels"],
                batch["decoder_attention_mask"], 0.1,
                int(os.environ.get("MIC_TPU_CE_CHUNK", "4096")),
                ce_embedding(state.shadow),
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        out = apply_gradients(
            optimizer, state.params, grads, state.opt_state,
            shadow_spec=sh_spec, shadow_dtype=config.compute_dtype,
        )
        params, opt_state = out[0], out[1]
        shadow = out[2] if len(out) == 3 else None
        return (
            TrainState(params, opt_state, state.step + 1, state.dropout_rng,
                       shadow),
            loss,
        )

    p_step = jax.jit(train_step, donate_argnums=(0,))

    rng = np.random.default_rng(1)
    vocab = config.decoder.vocab_size

    def make_batch():
        return {
            "pixel_values": jnp.asarray(rng.integers(
                0, 255, size=(batch_size, 256, 256, 3), dtype=np.uint8
            )),
            "labels": jnp.asarray(rng.integers(
                4, vocab, size=(batch_size, seq)
            ).astype(np.int32)),
            "decoder_input_ids": jnp.asarray(rng.integers(
                4, vocab, size=(batch_size, seq)
            ).astype(np.int32)),
            "decoder_attention_mask": jnp.ones((batch_size, seq), jnp.int32),
        }

    return p_step, state, make_batch


def classify_scope(tf_op: str, name: str) -> str:
    """Attribute a leaf op to a model-level family from its jaxpr scope path
    (the xplane ``tf_op`` stat XLA carries through from op_metadata).

    This is the dissection of the old budget table's "remaining fusions"
    blob: every generic `fusion.N` lands in a named row (VERDICT r4 item 2).
    """
    bwd = "transpose(jvp" in tf_op
    in_scan = "/while/" in tf_op
    if "flash_ce" in tf_op or "fused_ce" in tf_op:
        if "nv,nd->vd" in tf_op:
            return "CE demb GEMM (nv,nd->vd)"
        return "CE bwd glue" if bwd else "CE fwd glue"
    if "rng" in name or "rbg" in name or "threefry" in tf_op:
        return "rng (dropout masks)"
    if "_take" in tf_op or "scatter" in name:
        return "embedding gather/scatter-add"
    if in_scan:
        side = "bwd" if bwd else "fwd"
        if "bqhd" in tf_op or "bhqk" in tf_op:
            return f"layer-stack {side}: attention einsums"
        if "dot_general" in tf_op:
            return f"layer-stack {side}: projection/MLP GEMMs"
        if "dynamic" in tf_op or "dynamic" in name:
            return f"layer-stack {side}: grad-slab/param DUS + slices"
        return f"layer-stack {side}: LN/residual/elementwise"
    if bwd or "jvp" in tf_op:
        return "non-scan fwd/bwd glue (vision bridge, loss, masks)"
    if tf_op.startswith("jit(train_step)/"):
        # top-level, outside autodiff: the optimizer + shadow refresh
        return "optimizer: adamw + bf16 shadow refresh"
    return "other"


def aggregate(xplane_path: str, steps: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_scope = {}
        for i, m in plane.event_metadata.items():
            tf_op = ""
            for s in m.stats:
                if stat_names.get(s.metadata_id) == "tf_op":
                    tf_op = s.str_value
            ev_scope[i] = tf_op
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            tot = defaultdict(int)
            for ev in line.events:
                tot[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
            fam = defaultdict(int)
            other = defaultdict(int)
            wrapper_ms = 0.0
            for name, ps in tot.items():
                for fname, rx in FAMILIES:
                    if rx.search(name):
                        if fname == "while/cond wrappers":
                            wrapper_ms += ps / 1e9
                        else:
                            fam[fname] += ps
                        break
                else:
                    key = name.lstrip("%").split(".")[0].split(" ")[0][:40]
                    other[key] += ps

            leaf_total = sum(fam.values()) + sum(other.values())
            print(f"leaf total: {leaf_total/1e9:.1f} ms "
                  f"({leaf_total/1e9/steps:.2f} ms/step); "
                  f"wrappers (incl. children): {wrapper_ms:.1f} ms")
            rows = [(k, v) for k, v in fam.items()] + list(other.items())
            for k, v in sorted(rows, key=lambda kv: -kv[1]):
                ms = v / 1e9
                if ms < 0.5:
                    continue
                print(f"  {ms:9.2f} ms  {ms/steps:8.3f} ms/step  {k}")

            # model-level attribution from the jaxpr scope paths: no more
            # "remaining fusions" blob — every leaf lands in a named row
            print("\n-- by model family (tf_op scope) --")
            scope = defaultdict(int)
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                if FAMILIES[0][1].search(name):
                    continue
                scope[classify_scope(ev_scope.get(ev.metadata_id, ""),
                                     name)] += ev.duration_ps
            for k, v in sorted(scope.items(), key=lambda kv: -kv[1]):
                ms = v / 1e9
                if ms < 0.5:
                    continue
                print(f"  {ms:9.2f} ms  {ms/steps:8.3f} ms/step  {k}")
            if top:
                print("\n-- top leaves --")
                leaves = [
                    (n, ps) for n, ps in tot.items()
                    if not FAMILIES[0][1].search(n)
                ]
                for n, ps in sorted(leaves, key=lambda kv: -kv[1])[:top]:
                    print(f"  {ps/1e9:9.2f} ms  {n[:150]}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=3, help="traced steps")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default=None, help="trace dir (default: tmp)")
    p.add_argument("--remat", default="full",
                   choices=["none", "full", "masks", "dots"])
    p.add_argument("--attn", default="xla", choices=["xla", "pallas"])
    p.add_argument("--no-trace", action="store_true",
                   help="just measure the step, skip tracing")
    args = p.parse_args(argv)

    p_step, state, make_batch = build_step(
        args.batch, remat=args.remat, attn=args.attn
    )

    # pre-stage all batches on device BEFORE timing (bench.py does the same):
    # host->device transfers ride a network tunnel here and would otherwise
    # land inside the timed step
    batches = [make_batch() for _ in range(6 + args.steps)]
    jax.block_until_ready(batches)

    t0 = time.perf_counter()
    state, loss = p_step(state, batches[0])
    float(loss)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # honest per-step wall time (distinct inputs, loss readback)
    times = []
    for b in batches[1:6]:
        t0 = time.perf_counter()
        state, loss = p_step(state, b)
        assert np.isfinite(float(loss))
        times.append(time.perf_counter() - t0)
    step_ms = float(np.median(times)) * 1e3
    print(f"measured step: {step_ms:.1f} ms "
          f"({args.batch/np.median(times):.1f} samples/s/chip)")
    if args.no_trace:
        return

    trace_dir = args.out or tempfile.mkdtemp(prefix="mic_train_trace_")
    with jax.profiler.trace(trace_dir):
        for b in batches[6:]:
            state, loss = p_step(state, b)
            float(loss)

    print(f"trace: {trace_dir}")
    from parse_profile import find_xplane  # noqa: E402
    aggregate(find_xplane(trace_dir), args.steps, args.top)


if __name__ == "__main__":
    _here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, _here)                       # parse_profile
    sys.path.insert(0, os.path.dirname(_here))      # mic_tpu
    main()
