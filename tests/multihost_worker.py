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


def cross_host_collectives(pid):
    """Phase 3: the sequence-parallel ring and the GPipe pipeline over the
    GLOBAL 8-device mesh — with >1 process the ``ppermute`` hop between
    device 3 and device 4 crosses the host boundary, executing the
    cross-host collective path no single-process test can reach. Each
    process compares against a locally computed oracle."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from isp_tts_tpu.nn.embeddings import alibi_slopes
    from isp_tts_tpu.ops.attention import scaled_dot_product_attention
    from isp_tts_tpu.ops.ring_attention import ring_attention
    from isp_tts_tpu.parallel.mesh import gather_to_host
    from isp_tts_tpu.parallel.pipeline import microbatch, pipeline_apply

    mesh = Mesh(np.asarray(jax.devices()), ("seq",))

    def garray(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    # --- ring attention ---
    B, H, N, D = 2, 4, 64, 16
    rng = np.random.RandomState(7)  # same seed on every process
    q, k, v = (rng.randn(B, H, N, D).astype(np.float32) * 0.4
               for _ in range(3))
    sl = np.asarray(alibi_slopes(H), np.float32)
    slopes2 = np.stack([sl, sl])
    key_lens = np.asarray([N, N - 11], np.int32)
    scale = D ** -0.5
    seq = P(None, None, "seq", None)

    out = jax.jit(jax.shard_map(
        lambda q, k, v, s, kl: ring_attention(
            q, k, v, s, kl, scale, axis_name="seq"),
        mesh=mesh, in_specs=(seq, seq, seq, P(), P()), out_specs=seq))(
        garray(q, seq), garray(k, seq), garray(v, seq),
        garray(slopes2, P()), garray(key_lens, P()))
    out = gather_to_host(out)

    i = np.arange(N)[:, None]
    j = np.arange(N)[None, :]
    bias = sl[:, None, None] * -np.abs(j - i).astype(np.float32)
    mask = (j < key_lens[:, None])[:, None, None, :]
    ref = np.asarray(scaled_dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        bias=jnp.asarray(bias)[None], mask=jnp.asarray(mask)))
    ring_err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9))

    # --- pipeline ---
    S, Dp, Bp, n_micro = 8, 16, 16, 4
    W = rng.randn(S, Dp, Dp).astype(np.float32) / np.sqrt(Dp)
    b = rng.randn(S, Dp).astype(np.float32) * 0.1
    x = rng.randn(Bp, Dp).astype(np.float32)

    def layer(p, h):
        return jax.nn.gelu(h @ p[0][0] + p[1][0])

    pout = jax.jit(jax.shard_map(
        lambda W, b, xm: pipeline_apply(layer, (W, b), xm, axis_name="seq"),
        mesh=mesh, in_specs=(P("seq"), P("seq"), P()), out_specs=P()))(
        garray(W, P("seq")), garray(b, P("seq")),
        garray(microbatch(jnp.asarray(x), n_micro), P()))
    pout = gather_to_host(pout).reshape(Bp, Dp)
    pref = x
    for s in range(S):
        pref = np.asarray(jax.nn.gelu(pref @ W[s] + b[s]))
    pipe_err = float(np.max(np.abs(pout - pref))
                     / (np.max(np.abs(pref)) + 1e-9))
    print(f"worker {pid} phase3: ring_err={ring_err:.2e} "
          f"pipe_err={pipe_err:.2e}")
    return {"ring_rel_err": ring_err, "pipeline_rel_err": pipe_err}


def strategy_training(root, outdir, recipes, which: str = "both"):
    """Phase 4: recipe-selectable SP and PP through the REAL Trainer across
    the process group (round 4): `mesh_seq_axis` ring-shards the
    encoder/decoder attention over a live seq axis while the batch stays
    sharded over the cross-host data axis; `mesh_pipeline_axis` runs the
    stacked encoder as a GPipe schedule over a stage axis. Loss histories
    land in the result json; the parent compares 2-proc vs 1-proc."""
    import copy

    from isp_tts_tpu.training.experiment import ExperimentModules

    def run(tag, model_over, **trainer_over):
        overrides = build_overrides(root, outdir, epochs=1, max_steps=2,
                                    save_strategy="no", **trainer_over)
        for path, value in model_over.items():
            node = overrides["model"]
            *parts, leaf = path.split(".")
            for p in parts:
                node = node.setdefault(p, {})
            node[leaf] = value
        overrides["trainer"]["label"] = f"run_{tag}"
        modules = ExperimentModules("acoustic/core", recipes,
                                    overrides=overrides)
        modules.init_modules()
        trainer = modules.build_trainer()
        trainer.train()
        return loss_history(trainer)

    out = {}
    if which in ("both", "sp"):
        out["sp_losses"] = run(
            "sp", {"encoder.transformer_layer.attention.flash": "ring"},
            mesh_seq_axis=4)
    if which in ("both", "pp"):
        out["pp_losses"] = run(
            "pp", {"encoder.depth": 2, "encoder.pipeline": True},
            mesh_pipeline_axis=2)
    return out


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    root, outdir = sys.argv[4], sys.argv[5]
    # "phase4": run ONLY the SP/PP strategy phase, in fresh processes.
    # XLA:CPU Gloo deadlocks when one process lifetime creates a SECOND
    # distinct cross-process communicator-clique structure; the PRODUCT now
    # enforces this as a fail-fast error (`parallel/mesh.py:
    # check_gloo_clique`, registered by every Trainer) — a user mixing
    # strategies in one Gloo process gets an actionable RuntimeError
    # telling them to use fresh process groups, not a silent hang. This
    # split runs each strategy in the fresh group that error prescribes.
    # Real TPU pods don't use Gloo and are unaffected.
    mode = sys.argv[6] if len(sys.argv) > 6 else "full"

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

    if mode.startswith("phase4"):
        # one strategy per PROCESS GROUP: even two different clique
        # structures within one fresh process can hit the gloo race
        which = mode.split("_", 1)[1] if "_" in mode else "both"
        result = {"process_id": pid, "num_processes": nproc,
                  "phase4": strategy_training(root, outdir, recipes, which)}
        with open(os.path.join(outdir, f"result_{mode}_{nproc}p_{pid}.json"),
                  "w") as f:
            json.dump(result, f, indent=1)
        print(f"worker {pid}/{nproc} {mode} done")
        return

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

    phase3 = cross_host_collectives(pid)

    result = {"process_id": pid, "num_processes": nproc,
              "phase1": phase1, "phase2": phase2, "phase3": phase3}
    with open(os.path.join(outdir, f"result_{nproc}p_{pid}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(f"worker {pid}/{nproc} done: phase1 losses={phase1['losses']}")


if __name__ == "__main__":
    main()
