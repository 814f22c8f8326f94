"""Experiment factory: recipe YAML -> dataset/collator/model/criterion/
trainer/evaluator objects.

Capability parity with reference `tts/experiments/modules.py:18-194`:
- ``ExperimentConfig`` = {dataset, collator, model, criterion, trainer,
  evaluator} sections
- recursive ``base:`` include-merge + ``_disable_`` pruning + interpolation
  (handled by the config loader)
- builders keyed by ``_name_`` against the registries
- ``_train_`` / ``_eval_`` split-specific dataset overrides
- ``model.inject_data_config(config, dataset)`` before model construction
"""

from __future__ import annotations

import logging
from pathlib import Path

from flax import nnx

from ..config.loader import load_recipe, merge_dicts
from ..config.registry import build_config, strip_meta
from ..data import COLLATORS, DATASETS
from ..models import CRITERIA, EVALUATORS, MODELS
from .trainer import Trainer
from .trainer_config import TrainerConfig

logger = logging.getLogger("isp_tts_tpu")


class ExperimentModules:
    def __init__(self, config_name: str, config_root: str = "recipes",
                 overrides: dict | None = None):
        self.config = load_recipe(config_name, config_root, overrides=overrides)
        self.config_name = config_name

        self.train_dataset = None
        self.eval_dataset = None
        self.collator = None
        self.model = None
        self.criterion = None
        self.evaluator = None

    # -- builders ------------------------------------------------------------

    def build_dataset(self, split: str):
        cfg = self.config.get("dataset")
        if cfg is None:
            return None
        cfg = dict(cfg)
        split_key = f"_{split}_"
        for key in ("_train_", "_eval_"):
            override = cfg.pop(key, None)
            if key == split_key and override:
                cfg = merge_dicts(cfg, override)
        cls = DATASETS.get(cfg.get("_name_", "AcousticDataset"))
        return cls(build_config(cls.Config, cfg))

    def build_collator(self):
        cfg = dict(self.config.get("collator") or {"_name_": "AcousticCollator"})
        cls = COLLATORS.get(cfg.get("_name_", "AcousticCollator"))
        return cls(build_config(cls.Config, cfg))

    def build_model(self, dataset, seed: int = 0, precision: str = "fp32"):
        from ..nn.policy import compute_dtype

        cfg = dict(self.config["model"])
        cls = MODELS.get(cfg.get("_name_", "AcousticModel"))
        if dataset is not None:
            cfg = cls.inject_data_config(cfg, dataset)
        config = build_config(cls.Config, cfg)
        with compute_dtype(precision):
            return cls(config, rngs=nnx.Rngs(seed))

    def build_criterion(self):
        cfg = dict(self.config.get("criterion") or {"_name_": "AcousticModelLoss"})
        cls = CRITERIA.get(cfg.get("_name_", "AcousticModelLoss"))
        return cls(build_config(cls.Config, cfg))

    def build_evaluator(self, model):
        cfg = self.config.get("evaluator")
        if cfg is None:
            return None
        cls = EVALUATORS.get(cfg.get("_name_", "AcousticModelEvaluator"))
        return cls(model, **strip_meta(cfg))

    def build_trainer_config(self) -> TrainerConfig:
        return build_config(TrainerConfig, dict(self.config.get("trainer") or {}))

    # -- assembly --------------------------------------------------------------

    def init_modules(self) -> "ExperimentModules":
        trainer_cfg = self.build_trainer_config()
        import jax

        if trainer_cfg.fast_rng:
            jax.config.update("jax_default_prng_impl", "rbg")
        if trainer_cfg.compilation_cache:
            from ..utils.compile_cache import enable_compile_cache

            enable_compile_cache(trainer_cfg.compilation_cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        self.train_dataset = self.build_dataset("train")
        self.eval_dataset = self.build_dataset("eval")
        self.collator = self.build_collator()
        self.model = self.build_model(self.train_dataset or self.eval_dataset,
                                      seed=trainer_cfg.seed,
                                      precision=trainer_cfg.precision)
        self.criterion = self.build_criterion()
        self.evaluator = self.build_evaluator(self.model)
        return self

    def build_trainer(self) -> Trainer:
        if self.model is None:
            self.init_modules()
        trainer_cls = Trainer
        if getattr(type(self.model), "TRAINER", None) == "gan":
            from .gan_trainer import GANTrainer

            trainer_cls = GANTrainer
        trainer = trainer_cls(
            model=self.model,
            criterion=self.criterion,
            config=self.build_trainer_config(),
            train_dataset=self.train_dataset,
            eval_dataset=self.eval_dataset,
            collator=self.collator,
            evaluator=self.evaluator,
            experiment_config=self.config,
        )
        # persist the resolved recipe next to the checkpoints
        if trainer.is_main_process:
            import yaml

            (Path(trainer.run_dir) / "config.yaml").write_text(
                yaml.safe_dump(self.config, allow_unicode=True, sort_keys=False))
        return trainer
