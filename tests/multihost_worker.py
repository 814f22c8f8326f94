"""Worker process for the 2-process multi-host integration test.

Each process owns 4 virtual CPU devices and joins a jax.distributed
coordination service, exactly the multi-host TPU-pod bring-up pattern
(`parallel/mesh.py:init_distributed`; reference semantics: Accelerate process
groups, `tts/experiments/trainer.py:203-236`). Run via
``python tests/multihost_worker.py <pid> <nproc> <port> <root> <out>``.

Phase 1: train 2 epochs (epoch checkpointing), phase 2: resume from
checkpoint_last and train 1 more epoch. The per-step loss history and the
list of files this process wrote are dumped to ``<out>/result_<pid>.json``
so the parent test can assert cross-process agreement, rank-0-only writes,
and fp-tolerance equality with a single-process 8-device run.
"""

import json
import os
import sys


def build_overrides(root, outdir, **trainer_over):
    tiny_model = {
        "_charset_": ["<pad>", "</s>", "#punct", "#en"],
        "text_dim": 16,
        "encoder": {"dim": 16, "depth": 1, "transformer_layer": {
            "attention": {"heads": 2, "head_dim": 8, "one_kv_head": True,
                          "alibi_pos_bias": True, "dropout": 0.0},
            "feed_forward": {"inner_dim": 32, "activation": "gelu",
                             "dropout": 0.0}}},
        "decoder": "${model.encoder}",
        "temporal_adaptor": {
            "predictor": {"time_embedding_dim": 8, "transformer": {
                "dim": 16, "depth": 1, "transformer_layer": {
                    "attention": {"heads": 2, "head_dim": 8,
                                  "one_kv_head": True,
                                  "alibi_pos_bias": True, "dropout": 0.0},
                    "feed_forward": {"inner_dim": 32, "dropout": 0.0}}}},
            "embedding": {"transformer": {
                "dim": 16, "depth": 1, "transformer_layer": {
                    "attention": {"heads": 2, "head_dim": 8,
                                  "one_kv_head": True,
                                  "alibi_pos_bias": True, "dropout": 0.0},
                    "feed_forward": {"inner_dim": 32, "dropout": 0.0}}}},
            "soft_duration": True},
        # dropout zeroed everywhere: the 2-process global batch interleaves
        # sample order differently from the 1-process batch, so positional
        # dropout masks would make the loss histories incomparable
        "aligner": {"attention_dim": 8, "key_kernel_size": 3,
                    "query_kernel_size": 3, "dropout": 0.0},
    }
    return {
        "dataset": {"root": str(root),
                    "stats": {"pitch": {"mean": 170.0, "std": 40.0},
                              "energy": {"mean": 0.0, "std": 1.0}}},
        "collator": {"text_pad_multiple": 16, "mel_pad_multiple": 32,
                     "max_mel_len": 64, "max_text_len": 16},
        "model": tiny_model,
        "trainer": dict({
            "output_dir": str(outdir),
            "experiment_name": "mh",
            "label": "run",
            "epochs": 2,
            "batch_size": 8,
            "eval_batch_size": 8,
            "eval_strategy": "no",
            "save_strategy": "epoch",
            "logging_steps": 1,
            "progress": False,
            "log_with": [],
            "precision": "fp32",
            "callbacks": {},
            "seed": 1234,
        }, **trainer_over),
    }


def loss_history(trainer):
    return [h["train_step/loss"] for h in trainer.state.log_history
            if "train_step/loss" in h]


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    root, outdir = sys.argv[4], sys.argv[5]

    n_local = 8 // nproc
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()

    import jax

    # this environment's sitecustomize force-registers a TPU platform and
    # overrides JAX_PLATFORMS; force CPU after import (as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    if nproc > 1:
        from isp_tts_tpu.parallel.mesh import init_distributed

        init_distributed(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from isp_tts_tpu.training import trainer as trainer_mod
    from isp_tts_tpu.training.experiment import ExperimentModules

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recipes = os.path.join(repo, "recipes")

    # record every checkpoint write THIS process performs (the filesystem is
    # shared, so rank-0-only write discipline is observable only this way)
    writes: list[str] = []
    real_save = trainer_mod.save_checkpoint

    def recording_save(path, payload):
        writes.append(os.path.basename(str(path)))
        return real_save(path, payload)

    trainer_mod.save_checkpoint = recording_save

    # --- phase 1: fresh 2-epoch run with epoch checkpoints ---
    modules = ExperimentModules(
        "acoustic/core", recipes, overrides=build_overrides(root, outdir))
    modules.init_modules()
    trainer = modules.build_trainer()
    assert trainer.is_main_process == (pid == 0)
    assert trainer.num_processes == nproc
    trainer.train()
    phase1 = {
        "losses": loss_history(trainer),
        "global_step": trainer.state.global_step,
        "checkpoint_writes": list(writes),
        "run_dir": str(trainer.run_dir),
    }

    # --- phase 2: resume from checkpoint_last, one more epoch ---
    writes.clear()
    resume = os.path.join(phase1["run_dir"], "checkpoint_last.ckpt")
    modules2 = ExperimentModules(
        "acoustic/core", recipes,
        overrides=build_overrides(root, outdir, epochs=3, save_strategy="no",
                                  resume_from_checkpoint=resume))
    modules2.init_modules()
    trainer2 = modules2.build_trainer()
    resumed_at = trainer2.state.global_step
    trainer2.train()
    phase2 = {
        "resumed_at": resumed_at,
        "losses": loss_history(trainer2),
        "global_step": trainer2.state.global_step,
        "checkpoint_writes": list(writes),
    }

    result = {"process_id": pid, "num_processes": nproc,
              "phase1": phase1, "phase2": phase2}
    with open(os.path.join(outdir, f"result_{nproc}p_{pid}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(f"worker {pid}/{nproc} done: phase1 losses={phase1['losses']}")


if __name__ == "__main__":
    main()
