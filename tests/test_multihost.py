"""Executed multi-process (multi-host) integration test.

Spawns TWO actual OS processes, each owning 4 virtual CPU devices, joined via
`jax.distributed.initialize` — the real TPU-pod bring-up path
(`parallel/mesh.py:161-171`). Each runs a full Trainer cycle: per-process
loader shards -> `make_array_from_process_local_data` batches -> 2 epochs of
training with barriered epoch checkpoints -> resume -> 1 more epoch. Then a
single-process 8-device run on the same data/seed executes for comparison.

Asserts (reference semantics: Accelerate process groups + wait_for_everyone +
rank-0 checkpoint discipline, `tts/experiments/trainer.py:203-236,441,470,637`):
- both workers exit cleanly and observe process_count()==2,
- their loss histories agree exactly (SPMD: same global computation),
- the 2-process loss history matches the 1-process 8-device run to fp
  tolerance (global batch set is identical; only device reduction order and
  the interleaved global batch layout differ),
- ONLY rank 0 wrote checkpoint files, in both phases,
- resume restored the optimizer-step count on both ranks.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from isp_tts_tpu.data.audio import write_wav

SR = 22050
WORKER = Path(__file__).parent / "multihost_worker.py"


@pytest.fixture(scope="module")
def toy_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh_ds")
    (root / "wavs").mkdir()
    rng = np.random.RandomState(0)
    texts = ["hello there.", "nice day!", "how are you?", "fine thanks.",
             "testing tts.", "one two three.", "red blue green.", "the end."]
    lines = []
    for i, text in enumerate(texts):
        n = int(SR * (0.3 + 0.05 * (i % 4)))
        t = np.arange(n) / SR
        wav = 0.4 * np.sin(2 * np.pi * (130 + 20 * i) * t) + 0.03 * rng.randn(n)
        write_wav(root / "wavs" / f"u{i}.wav", wav.astype(np.float32), SR)
        lines.append(f"wavs/u{i}.wav|{text}")
    (root / "meta.csv").write_text("\n".join(lines) + "\n")
    return root


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(pid, nproc, port, root, outdir, mode="full"):
    env = dict(os.environ)
    # worker appends its own device count; raise Gloo's context-init /
    # GetKeyValue deadline from the hardcoded-feeling 30 s default — on this
    # 1-core host two ranks' concurrent compiles can easily skew context
    # creation past 30 s (XLA exposes this as a debug flag)
    env["XLA_FLAGS"] = "--xla_cpu_collective_timeout_seconds=300"
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
         str(root), str(outdir), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=repo, env=env,
    )


def _run_group(nproc, root, outdir, timeout=2400, attempts=6, mode="full"):
    for attempt in range(attempts):
        port = _free_port()
        procs = [_spawn(i, nproc, port, root, outdir, mode)
                 for i in range(nproc)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
        # this box has ONE physical core: a cold run can skew the two
        # processes' jit compiles past Gloo's 30 s rendezvous deadline.
        # The persistent compile cache makes retries progressively faster
        # (each attempt caches the programs it reached before dying — with
        # phase 4's four fresh cross-process programs, several attempts can
        # be needed on a fully cold cache) — retry on that failure only.
        gloo_skew = any("DEADLINE_EXCEEDED" in o or "Gloo" in o for o in outs)
        if not (gloo_skew and attempt + 1 < attempts):
            for p, out in zip(procs, outs):
                assert p.returncode == 0, \
                    f"worker {p.args} failed:\n{out[-4000:]}"
    results = []
    prefix = f"result_{mode}" if mode != "full" else "result"
    for i in range(nproc):
        with open(Path(outdir) / f"{prefix}_{nproc}p_{i}.json") as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_training_matches_single_process(toy_root, tmp_path):
    two = _run_group(2, toy_root, tmp_path / "mh2")
    r0, r1 = two

    # SPMD: every process computes the same global metrics
    np.testing.assert_allclose(r0["phase1"]["losses"], r1["phase1"]["losses"],
                               rtol=1e-6)
    np.testing.assert_allclose(r0["phase2"]["losses"], r1["phase2"]["losses"],
                               rtol=1e-6)
    assert r0["phase1"]["global_step"] == r1["phase1"]["global_step"] == 2
    assert r0["phase2"]["resumed_at"] == r1["phase2"]["resumed_at"] == 2
    assert r0["phase2"]["global_step"] == r1["phase2"]["global_step"] == 3

    # rank-0-only checkpoint write discipline, both phases
    assert r0["phase1"]["checkpoint_writes"], "rank 0 wrote no checkpoints"
    assert r0["phase2"]["checkpoint_writes"], "rank 0 wrote no final save"
    assert r1["phase1"]["checkpoint_writes"] == []
    assert r1["phase2"]["checkpoint_writes"] == []

    # checkpoints landed on disk (barriered save; resume read them)
    run_dir = Path(r0["phase1"]["run_dir"])
    assert (run_dir / "checkpoint_last.ckpt").exists()
    assert (run_dir / "trainer_state.json").exists()

    # full resume restores the logged history; its head must be phase 1's
    np.testing.assert_allclose(r0["phase2"]["losses"][:2],
                               r0["phase1"]["losses"], rtol=1e-7)

    # cross-host ppermute collectives: ring attention and the GPipe
    # pipeline over the global 8-device mesh, checked vs local oracles by
    # both processes (the device-3 -> device-4 hop crosses the host boundary)
    for r in (r0, r1):
        assert r["phase3"]["ring_rel_err"] < 1e-4, r["phase3"]
        assert r["phase3"]["pipeline_rel_err"] < 1e-4, r["phase3"]

    # recipe-selectable SP / PP training across the process group, each
    # strategy in its OWN fresh worker group (XLA:CPU gloo races context
    # init when one process creates multiple distinct cross-process clique
    # structures — see multihost_worker): both ranks computed the same
    # global losses (SPMD)
    s0, s1 = _run_group(2, toy_root, tmp_path / "mh2sp", mode="phase4_sp")
    q0, q1 = _run_group(2, toy_root, tmp_path / "mh2pp", mode="phase4_pp")
    np.testing.assert_allclose(s0["phase4"]["sp_losses"],
                               s1["phase4"]["sp_losses"], rtol=1e-6)
    np.testing.assert_allclose(q0["phase4"]["pp_losses"],
                               q1["phase4"]["pp_losses"], rtol=1e-6)
    assert len(s0["phase4"]["sp_losses"]) == 2
    assert len(q0["phase4"]["pp_losses"]) == 2

    # --- equivalence with a single-process 8-device run ---
    one = _run_group(1, toy_root, tmp_path / "mh1")[0]
    assert len(one["phase1"]["losses"]) == len(r0["phase1"]["losses"])
    np.testing.assert_allclose(r0["phase1"]["losses"], one["phase1"]["losses"],
                               rtol=5e-3)
    # post-resume steps compound fp reduction-order noise through 3 optimizer
    # updates (training is chaotic); observed drift ~0.8% on the final step
    np.testing.assert_allclose(r0["phase2"]["losses"], one["phase2"]["losses"],
                               rtol=3e-2)

    # dp x sp / dp x pp trained the same losses as the 1-process run of the
    # identical recipe (strategy = config, numerics invariant)
    one_sp = _run_group(1, toy_root, tmp_path / "mh1sp", mode="phase4_sp")[0]
    one_pp = _run_group(1, toy_root, tmp_path / "mh1pp", mode="phase4_pp")[0]
    np.testing.assert_allclose(s0["phase4"]["sp_losses"],
                               one_sp["phase4"]["sp_losses"], rtol=5e-3)
    np.testing.assert_allclose(q0["phase4"]["pp_losses"],
                               one_pp["phase4"]["pp_losses"], rtol=5e-3)
