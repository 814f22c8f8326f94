"""GANTrainer: adversarial training (generator + discriminator) on the mesh.

Extends :class:`Trainer` for models carrying a ``.generator`` and a
``.discriminator`` submodule (``VocoderModel``). Everything non-step-related
(epoch loop, callbacks, eval/save/log strategies, checkpointing with
barriers, resume) is inherited unchanged; the differences are exactly:

- TWO optimizers (one per submodule), stored as ``opt_state = {"gen", "disc"}``
  — a pytree, so the base checkpoint leaf serialization and mesh sharding
  work unmodified;
- ONE jitted train step performing the standard alternating GAN update
  (HiFi-GAN order): discriminator step against stop-gradiented generator
  output, then generator step against the UPDATED discriminator. Both
  updates, both grad computations, and the on-device mel front-end compile
  into a single XLA program — no host round-trips between G and D phases;
- eval reuses the base Trainer's eval step via the criterion's plain
  ``criterion(inputs, outputs, step)`` contract (generator-only metrics).

TPU-first notes: the discriminator ensemble's convs and the generator's
ConvNeXt matmuls are all channel-last NHWC; SPMD data parallelism falls out
of the mesh shardings exactly as in the base Trainer (XLA inserts the grad
all-reduces for BOTH parameter groups).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
from flax import nnx

from .optimizers import build_optimizer, set_learning_rate
from .trainer import Trainer, optax_apply_updates, optax_global_norm

logger = logging.getLogger("isp_tts_tpu")


class GANTrainer(Trainer):
    def __init__(self, model, criterion, config, **kwargs):
        if not (hasattr(model, "generator") and hasattr(model, "discriminator")):
            raise ValueError("GANTrainer requires a model with .generator and "
                             ".discriminator submodules")
        # the criterion's mel-reconstruction contract must match the model's
        # feature front-end: inject it (single source of truth)
        if hasattr(model, "features_config") and hasattr(criterion, "config"):
            fc = model.features_config
            for name in ("sample_rate", "n_fft", "hop_length", "win_length",
                         "n_mels", "f_min", "f_max"):
                if hasattr(criterion.config, name):
                    setattr(criterion.config, name, getattr(fc, name))
        super().__init__(model, criterion, config, **kwargs)

    # -- optimizers ------------------------------------------------------------

    def _init_optimizer(self):
        cfg = self.config
        gen_params = nnx.state(self.model.generator, nnx.Param)
        disc_params = nnx.state(self.model.discriminator, nnx.Param)

        # finetune_layers freezing, per branch: model paths are full-tree
        # ("generator.blocks.3....") while each optimizer sees its
        # submodule's tree — re-anchor the prefix before matching (the
        # reference's frozen-backbone fine-tune workflow, colab recipe
        # train_ru_en.yaml:12, applied to the GAN lane)
        def branch_mask(params, branch: str):
            if not self.model.frozen_prefixes:
                return None, False
            from .trainer import _path_str

            mask = jax.tree_util.tree_map_with_path(
                lambda path, leaf: self.model.is_trainable(
                    f"{branch}.{_path_str(path)}"), params)
            import numpy as np

            n_opt = int(sum(np.prod(np.shape(l)) for l, m in zip(
                jax.tree_util.tree_leaves(params),
                jax.tree_util.tree_leaves(mask)) if m))
            total = int(sum(np.prod(np.shape(l))
                            for l in jax.tree_util.tree_leaves(params)))
            logger.info("%s: optimizing %d / %d params", branch, n_opt, total)
            return mask, True

        g_mask, g_frozen = branch_mask(gen_params, "generator")
        d_mask, d_frozen = branch_mask(disc_params, "discriminator")
        self.tx_g, self.schedule = build_optimizer(cfg.optimization,
                                                   gen_params, g_mask)
        self.tx_d, _ = build_optimizer(cfg.optimization, disc_params, d_mask)
        if self._restored_base_lr is not None and cfg.restore_lr:
            self.schedule.base_lr = float(self._restored_base_lr)
            logger.info("restored schedule base lr %.3g", self.schedule.base_lr)
        self.opt_state = {
            "gen": self.tx_g.init(gen_params),
            "disc": self.tx_d.init(disc_params),
        }
        self._grad_accum = cfg.optimization.grad_accum_steps > 1
        self._has_freeze_mask = False  # per-branch flags below
        self._g_frozen, self._d_frozen = g_frozen, d_frozen
        self._restore_opt_state()

    def _apply_lr(self, lr: float):
        set_learning_rate(self.opt_state["gen"], lr, self._grad_accum,
                          self._g_frozen)
        set_learning_rate(self.opt_state["disc"], lr, self._grad_accum,
                          self._d_frozen)
        return self.opt_state

    # -- jitted steps ------------------------------------------------------------

    def _build_steps(self):
        criterion = self.criterion
        tx_g, tx_d = self.tx_g, self.tx_d

        @nnx.jit
        def train_step(model, opt_state, batch, step):
            inputs = model.prepare_inputs(batch)
            audio = inputs["audio"]
            gen = model.generator
            disc = model.discriminator

            # the generator's INPUT: real audio's mel normally, or the
            # paired acoustic-model-PREDICTED mel (joint fine-tune — closes
            # the train/serve mel mismatch the reference's frozen
            # TorchScript vocoder can never train away); the mel-L1
            # reconstruction target is ALWAYS the real audio's
            mel_target = jax.lax.stop_gradient(model.features(audio))
            mel = inputs.get("mel", mel_target)

            # --- discriminator update (fake detached) ---
            fake = jax.lax.stop_gradient(gen(mel))

            def d_loss_fn(d):
                loss, metrics = criterion.disc_loss(d, audio, fake)
                return loss.astype(jnp.float32), metrics

            (d_loss, d_metrics), d_grads = nnx.value_and_grad(
                d_loss_fn, has_aux=True)(disc)
            d_params = nnx.state(disc, nnx.Param)
            d_updates, d_state = tx_d.update(d_grads, opt_state["disc"], d_params)
            nnx.update(disc, optax_apply_updates(d_params, d_updates))

            # --- generator update (vs the updated discriminator) ---
            def g_loss_fn(g):
                fake2 = g(mel)
                loss, metrics = criterion.gen_loss(disc, audio, fake2,
                                                   mel_target)
                return loss.astype(jnp.float32), metrics

            (g_loss, g_metrics), g_grads = nnx.value_and_grad(
                g_loss_fn, has_aux=True)(gen)
            g_params = nnx.state(gen, nnx.Param)
            g_updates, g_state = tx_g.update(g_grads, opt_state["gen"], g_params)
            nnx.update(gen, optax_apply_updates(g_params, g_updates))

            metrics = {
                "loss": g_loss,
                **{k: v.astype(jnp.float32) for k, v in d_metrics.items()},
                **{k: v.astype(jnp.float32) for k, v in g_metrics.items()},
                "stats/grad_norm": optax_global_norm(g_grads),
                "stats/grad_norm_disc": optax_global_norm(d_grads),
            }
            return {"gen": g_state, "disc": d_state}, metrics

        @nnx.jit
        def eval_step(model, batch, step):
            inputs = model.prepare_inputs(batch)
            outputs = model(**inputs)
            loss, losses = criterion(inputs, outputs, step)
            metrics = {"loss": loss.astype(jnp.float32),
                       **{k: v.astype(jnp.float32) for k, v in losses.items()}}
            return outputs, metrics

        self._train_step_fn = train_step
        self._eval_step_fn = eval_step
        # chunked dispatch is a single-optimizer-path feature; GAN training
        # alternates two updates per batch and stays per-step
        self._train_chunk_fn = None
        if self.config.steps_per_call > 1:
            logger.warning("steps_per_call > 1 is not supported by "
                           "GANTrainer; training per-step")
        self._cached_mode = None
        self._steps_built = True
