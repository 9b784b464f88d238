"""The training driver: sharded state init, jitted steps, epoch loop, periodic
eval (loss + per-language BLEU via on-device beam search), full-state
checkpointing with rotation and mid-epoch resume.

Capability surface = reference main.py:372-885, rebuilt:
- pmap+replicate        -> 2-D ("data","model") mesh; state initialized
                           *directly sharded* with jit out_shardings (params
                           never materialize unsharded on one device)
- host f32 image batches-> uint8 host batches, device-side preprocess fused
                           into the train step
- params-only restore   -> full resume: params/opt/step/rng + data position
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.core.config import CaptionerConfig, DataConfig, TrainConfig
from mic_tpu.data.dataset import CaptionDataset
from mic_tpu.data.loader import CaptionLoader
from mic_tpu.data.tokenizer import TokenizerBase, load_tokenizer
from mic_tpu.evals.bleu import bleu_1_to_4
from mic_tpu.io.checkpoint import TrainCheckpointManager, host_pytree
from mic_tpu.models.captioner import Captioner
from mic_tpu.ops.image_prep import maybe_preprocess
from mic_tpu.parallel.mesh import make_mesh
from mic_tpu.parallel.sharding import batch_sharding, param_specs
from mic_tpu.train.loss import label_smoothed_cross_entropy
from mic_tpu.train.metrics import MetricLogger, StepTimer
from mic_tpu.train.schedule import linear_warmup_linear_decay
from mic_tpu.train.fused_adamw import apply_gradients
from mic_tpu.train.shadow import (
    cast_shadow, ce_embedding, shadow_spec, shadowed_params,
)
from mic_tpu.train.state import TrainState, make_optimizer
from mic_tpu.train.steps import count_params


def state_shardings(state_shape, mesh, fsdp: bool = False):
    """Apply the param sharding rules across the WHOLE train state: adam
    moments mirror the param tree paths, so the same trailing-path rules shard
    them identically; scalars/rng fall through to replicated.  With fsdp=True
    every leaf additionally shards its largest divisible dim over "data"
    (ZeRO-3: weights all-gathered just-in-time, grads reduce-scattered)."""
    from jax.sharding import NamedSharding

    specs = param_specs(state_shape, mesh.shape["model"],
                        fsdp_axis_size=mesh.shape["data"] if fsdp else 1)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)


class Trainer:
    def __init__(
        self,
        model_config: CaptionerConfig,
        data_config: DataConfig,
        train_config: TrainConfig,
        tokenizer: Optional[TokenizerBase] = None,
        tokenizer_path: Optional[str] = None,
    ):
        self.mc, self.dc, self.tc = model_config, data_config, train_config
        if train_config.prng_impl and jax.default_backend() == "tpu":
            # dropout-mask generation cost: threefry2x32 is pure VPU math
            # (~25 ms/step at per-device batch 128 on v5e); "rbg" uses the
            # TPU hardware RNG (+5% step throughput, 333 -> 350 samples/s).
            # Streams differ between impls; checkpoints store the key array,
            # so resume under the SAME impl is exact either way.  TPU-only:
            # CPU (tests) keeps the reproducible threefry default.
            jax.config.update("jax_default_prng_impl", train_config.prng_impl)
        self.model = Captioner(
            model_config,
            remat=(train_config.remat if train_config.remat != "none" else False),
        )
        self.tokenizer = tokenizer or load_tokenizer(tokenizer_path)
        self.mesh = make_mesh(dp=train_config.dp, tp=train_config.tp)
        self.logger = MetricLogger(train_config.output_dir)
        self.ckpt = TrainCheckpointManager(
            train_config.output_dir, max_to_keep=train_config.save_total_limit
        )

        self.global_batch = train_config.per_device_batch_size * self.mesh.size
        self.eval_batch = (
            train_config.eval_batch_size or train_config.per_device_batch_size
        ) * self.mesh.size

    # -- data -----------------------------------------------------------------

    def make_loaders(self):
        lang_codes = self.dc.lang_codes
        train_ds = CaptionDataset(
            self.dc.train_file, self.dc.images_dir, lang_codes
        )
        train_loader = CaptionLoader(
            train_ds, self.tokenizer, self.global_batch,
            process_shard=(jax.process_index(), jax.process_count()),
            image_size=self.dc.decode_size, max_length=self.dc.max_seq_length,
            shuffle=True, drop_last=True, seed=self.dc.shuffle_seed,
            num_workers=self.dc.num_workers, lang_codes=lang_codes,
        )
        eval_loaders = {}
        if self.dc.validation_file:
            val_ds = CaptionDataset(
                self.dc.validation_file, self.dc.images_dir, lang_codes
            )
            for lang, sub in val_ds.split_by_language().items():
                eval_loaders[lang] = CaptionLoader(
                    sub, self.tokenizer, self.eval_batch,
                    image_size=self.dc.decode_size,
                    max_length=self.dc.max_seq_length,
                    shuffle=False, drop_last=False, seed=0,
                    num_workers=0, lang_codes=lang_codes,
                )
        return train_loader, eval_loaders

    # -- jitted steps ----------------------------------------------------------

    def build(self, steps_per_epoch: int):
        tc = self.tc
        total_steps = steps_per_epoch * tc.num_epochs
        self.lr_fn = linear_warmup_linear_decay(
            tc.learning_rate, total_steps, tc.warmup_steps
        )
        self.optimizer = make_optimizer(
            self.lr_fn, weight_decay=tc.weight_decay, b1=tc.adam_b1,
            b2=tc.adam_b2, eps=tc.adam_eps, max_grad_norm=tc.max_grad_norm,
            mu_dtype=tc.adam_mu_dtype, nu_dtype=tc.adam_nu_dtype,
            fused=tc.fused_adamw,
        )

        model, image_size = self.model, self.mc.vision.image_size
        dtype = self.mc.compute_dtype
        # compute-dtype shadow params (train/shadow.py): bit-identical step,
        # no per-step f32->bf16 master-tree casts
        self._shadow_dtype = (
            dtype if tc.shadow_params and jnp.dtype(dtype) != jnp.float32
            else None
        )

        def init_state():
            params = model.init_params(jax.random.PRNGKey(tc.seed))
            return TrainState.create(
                params, self.optimizer, tc.seed,
                shadow_dtype=self._shadow_dtype,
            )

        state_shape = jax.eval_shape(init_state)
        self._shadow_spec = (
            shadow_spec(state_shape.params, self._shadow_dtype)
            if self._shadow_dtype is not None else None
        )
        self.shardings = state_shardings(state_shape, self.mesh, fsdp=tc.fsdp)
        self.batch_shard = batch_sharding(self.mesh)
        self._init_state = jax.jit(init_state, out_shardings=self.shardings)
        self._state_shape = state_shape

        label_smoothing = tc.label_smoothing

        def compute_loss(params, pixels, batch, rng, loss_mask=None,
                         shadow=None):
            # loss_mask defaults to the attention mask; eval passes a version
            # with padded examples zeroed (the model still sees the real
            # attention mask so no row is fully masked out of the softmax).
            if loss_mask is None:
                loss_mask = batch["decoder_attention_mask"]
            # the model computes from the compute-dtype shadow (bit-equal to
            # its own per-use casts); gradients route to the f32 masters
            cp = shadowed_params(params, shadow)
            if tc.fused_ce and tc.ce_chunk > 0:
                from mic_tpu.ops.fused_ce import fused_lm_loss

                vision_rng = (
                    jax.random.fold_in(rng, 0x5649) if rng is not None else None
                )
                enc = model.encode(cp, pixels, rng=vision_rng)
                hidden = model.decode_hidden(
                    cp, enc, batch["decoder_input_ids"],
                    batch["decoder_attention_mask"], rng,
                )
                return fused_lm_loss(
                    hidden, params["shared"]["embedding"],
                    params["final_logits_bias"], batch["labels"],
                    loss_mask, label_smoothing, tc.ce_chunk,
                    ce_embedding(shadow),
                    mode=tc.flash_ce, dl_max_rows=tc.dl_max_rows,
                )
            logits = model(
                cp, pixels, batch["decoder_input_ids"],
                batch["decoder_attention_mask"], rng=rng,
            )
            return label_smoothed_cross_entropy(
                logits, batch["labels"], loss_mask, label_smoothing,
            )

        def train_step(state: TrainState, batch):
            pixels = maybe_preprocess(batch["pixel_values"], image_size, dtype)
            step_rng = jax.random.fold_in(state.dropout_rng, state.step)

            def loss_fn(params):
                return compute_loss(params, pixels, batch, step_rng,
                                    shadow=state.shadow)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            out = apply_gradients(
                self.optimizer, state.params, grads, state.opt_state,
                shadow_spec=self._shadow_spec, shadow_dtype=dtype,
            )
            params, opt_state = out[0], out[1]
            shadow = out[2] if len(out) == 3 else None
            new_state = TrainState(params, opt_state, state.step + 1,
                                   state.dropout_rng, shadow)
            return new_state, {"loss": loss, "learning_rate": self.lr_fn(state.step)}

        self.p_train_step = jax.jit(
            train_step,
            in_shardings=(self.shardings, self.batch_shard),
            out_shardings=(self.shardings, None),
            donate_argnums=(0,),
        )

        def eval_step(params, batch):
            pixels = maybe_preprocess(batch["pixel_values"], image_size, dtype)
            loss_mask = (
                batch["decoder_attention_mask"] * batch["loss_weight"][:, None]
            )
            loss = compute_loss(params, pixels, batch, None, loss_mask=loss_mask)
            ntok = jnp.sum(loss_mask)
            return {"loss": loss, "ntok": ntok}

        self.p_eval_step = jax.jit(
            eval_step, in_shardings=(self.shardings.params, self.batch_shard)
        )

        @partial(
            jax.jit,
            in_shardings=(self.shardings.params, self.batch_shard, None),
            static_argnums=(),
        )
        def generate_step(params, pixels_u8, lang_token):
            pixels = maybe_preprocess(pixels_u8, image_size, dtype)
            # decode training-consistently: PAD start token (the pad-prepend
            # shift's position 0) + language code forced at position 1. The
            # reference mixed three start conventions between training and its
            # two eval paths (main.py:820 vs evaluation.py:80-107); matching
            # the training distribution measurably improves BLEU.
            out = model.generate(
                params, pixels,
                max_length=self.dc.max_seq_length,
                num_beams=4,
                decoder_start_token_id=self.mc.decoder.pad_token_id,
                forced_bos_token_id=lang_token,
            )
            return out.sequences

        self.p_generate_step = generate_step

    # -- state / resume --------------------------------------------------------

    def init_or_resume(self, train_loader: CaptionLoader):
        """Resume preference order: an explicit ``resume_from`` path (another
        run's output_dir / checkpoints dir / specific step dir — reference
        main.py:332-346 was dead code for this), then this run's own latest
        checkpoint, then fresh init."""
        template = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            self._state_shape, self.shardings,
        )
        # checkpoints never carry the shadow (_save strips it): restore the
        # persistent fields only, rebuild the shadow from params afterwards
        template = template._replace(shadow=None)

        def restore(fn):
            try:
                return fn(template)
            except Exception:
                # PRNG impl changed since the checkpoint was written (e.g.
                # a pre-round-3 threefry checkpoint restored under the rbg
                # default, or vice versa): the stored key array's shape
                # differs from the template's.  Retry with the other key
                # shape, then RE-SEED dropout_rng under the current impl —
                # dropout streams are not part of model state, only
                # same-impl resumes are bit-exact (config.py prng_impl).
                cur = template.dropout_rng
                alt_shape = (2,) if cur.shape == (4,) else (4,)
                alt = template._replace(dropout_rng=jax.ShapeDtypeStruct(
                    alt_shape, cur.dtype, sharding=cur.sharding
                ))
                state, meta = fn(alt)
                if state is None:
                    return state, meta
                print(
                    "[mic_tpu] checkpoint dropout_rng was written under a "
                    "different PRNG impl; re-seeding (set train.prng_impl "
                    "to the original impl for bit-exact resume)"
                )
                fresh = jax.random.fold_in(
                    jax.random.PRNGKey(0), int(state.step)
                )
                return state._replace(dropout_rng=fresh), meta

        if self.tc.resume_from is not None:
            manager, step = TrainCheckpointManager.open(self.tc.resume_from)
            state, meta = restore(
                lambda t: manager.restore(t, step=step)
            )
            manager.close()
            if state is None:
                raise FileNotFoundError(
                    f"--resume_from {self.tc.resume_from}: no checkpoint found"
                )
            if meta:
                train_loader.set_state(meta)
            return self._rebuild_shadow(state)
        if self.ckpt.latest_step() is not None:
            state, meta = restore(self.ckpt.restore)
            if state is not None:
                if meta:
                    train_loader.set_state(meta)
                return self._rebuild_shadow(state)
        return self._init_state()

    def _rebuild_shadow(self, state: TrainState) -> TrainState:
        """The shadow is stripped from checkpoints; cast it fresh from the
        restored params (sharded like the step expects)."""
        if self._shadow_dtype is None or state.shadow is not None:
            return state
        fn = jax.jit(
            lambda p: cast_shadow(p, self._shadow_spec, self._shadow_dtype),
            out_shardings=self.shardings.shadow,
        )
        return state._replace(shadow=fn(state.params))

    # -- eval -------------------------------------------------------------------

    @staticmethod
    def _pad_to_multiple(batch: dict, multiple: int) -> tuple[dict, int]:
        """Pad a ragged eval batch up to a data-axis multiple by repeating the
        first example (valid compute, no fully-masked rows), with a per-example
        ``loss_weight`` zeroing the padding out of loss/ntok/BLEU. The
        reference evaluated every batch (its loaders never dropped the eval
        tail, main.py:560-571); skipping tails would silently shrink small
        per-language validation splits."""
        n = batch["pixel_values"].shape[0]
        pad = (-n) % multiple
        out = {
            k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)]) if pad else v
            for k, v in batch.items()
        }
        out["loss_weight"] = np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        )
        return out, n

    def evaluate(self, params, eval_loaders) -> dict:
        metrics = {}
        for lang, loader in eval_loaders.items():
            losses, ntoks, preds, refs = [], [], [], []
            loader.next_batch = 0
            for batch in loader.epoch_iterator(epoch=0):
                # pad the ragged tail to the FULL eval batch: keeps the
                # jitted eval/generate shapes static (one compile), and the
                # wasted compute is at most one batch per language
                batch, n_real = self._pad_to_multiple(dict(batch), self.eval_batch)
                dev_batch = self._put_batch(batch)
                m = self.p_eval_step(params, dev_batch)
                losses.append(float(m["loss"]))
                ntoks.append(float(m["ntok"]))
                if self.tc.gen_eval:
                    start = self.tokenizer.lang_code_to_id[lang]
                    seqs = self.p_generate_step(
                        params, dev_batch["pixel_values"],
                        jnp.asarray(start, jnp.int32),
                    )
                    decoded = self.tokenizer.batch_decode(np.asarray(seqs))
                    preds.extend(decoded[:n_real])
                    refs.extend(
                        self.tokenizer.batch_decode(batch["labels"][:n_real])
                    )
            if losses:
                metrics[f"{lang}/loss"] = float(
                    np.average(losses, weights=ntoks)
                )
            if preds:
                for k, v in bleu_1_to_4(preds, refs, lang[:2]).items():
                    metrics[f"{lang}/{k}"] = v
        return metrics

    def _put_batch(self, batch: dict):
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    self.batch_shard, np.asarray(x)
                ),
                dict(batch),
            )
        return jax.tree.map(
            lambda x: jax.device_put(x, self.batch_shard), dict(batch)
        )

    def _device_prefetch(self, loader: CaptionLoader):
        """Double-buffered host->device transfer: batch N+1 is device_put
        (async) while step N executes, so H2D rides under compute instead of
        serializing with it. Combined with the loader's decode-ahead pool this
        is the input-overlap the reference lacked (its torch loader fed
        numpy synchronously into pmap dispatch, main.py:548-556, the
        documented bottleneck README.md:103).

        Yields (device_batch, loader_state) — the state snapshot taken when
        THIS batch was pulled, because pulling ahead advances the loader's
        resume position one batch early; checkpoints must record the position
        of the batch actually trained on, not the one in the buffer."""
        it = loader.epoch_iterator()
        prev = None
        for batch in it:
            snap = loader.state()
            dev = self._put_batch(batch)
            if prev is not None:
                yield prev
            prev = (dev, snap)
        if prev is not None:
            yield prev

    # -- main loop ---------------------------------------------------------------

    def train(self) -> TrainState:
        train_loader, eval_loaders = self.make_loaders()
        steps_per_epoch = len(train_loader)
        self.build(steps_per_epoch)
        state = self.init_or_resume(train_loader)

        self.logger.log(0, {"param_count_m": count_params(state.params) / 1e6})
        timer = StepTimer()
        step = int(jax.device_get(state.step))
        prof_range = None
        if self.tc.profile_steps:
            a, _, z = self.tc.profile_steps.partition(":")
            prof_range = (int(a), int(z or int(a) + 3))

        try:
            while train_loader.epoch < self.tc.num_epochs:
                for dev_batch, data_state in self._device_prefetch(train_loader):
                    if prof_range and step == prof_range[0]:
                        jax.profiler.start_trace(
                            os.path.join(self.tc.output_dir, "profile")
                        )
                    state, metrics = self.p_train_step(state, dev_batch)
                    step += 1
                    timer.tick()
                    if prof_range and step == prof_range[1]:
                        jax.block_until_ready(metrics["loss"])
                        jax.profiler.stop_trace()
                        prof_range = None

                    if step % self.tc.logging_steps == 0:
                        scalars = {k: float(v) for k, v in host_pytree(metrics).items()}
                        scalars.update(timer.rates(self.global_batch))
                        self.logger.log(step, scalars, prefix="train")
                        timer.reset()

                    if eval_loaders and step % self.tc.eval_steps == 0:
                        self.logger.log(step, self.evaluate(state.params, eval_loaders),
                                        prefix="eval")

                    if step % self.tc.save_steps == 0:
                        self._save(step, state, data_state)

            self._save(step, state, train_loader.state())
            self.ckpt.wait()
            if eval_loaders:
                self.logger.log(step, self.evaluate(state.params, eval_loaders),
                                prefix="eval")
        finally:
            # spawn workers otherwise outlive training (and leak per test run)
            train_loader.close()
            for loader in eval_loaders.values():
                loader.close()
        # export a servable model directory alongside the train checkpoints
        model_dir = os.path.join(self.tc.output_dir, "model")
        self.model.save_pretrained(model_dir, state.params)
        if hasattr(self.tokenizer, "save"):  # SimpleTokenizer vocab travels too
            self.tokenizer.save(os.path.join(model_dir, "tokenizer.json"))
        return state

    def _save(self, step: int, state: TrainState, data_meta: dict) -> None:
        # the shadow is a pure cast of params: strip it from checkpoints
        # (keeps the on-disk format identical to pre-shadow runs) and
        # rebuild it on restore (init_or_resume)
        self.ckpt.save(step, state._replace(shadow=None), data_meta=data_meta)
