import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.training.optimizers import (
    LRSchedulerConfig,
    OptimizationConfig,
    Schedule,
    build_optimizer,
    set_learning_rate,
)


def _params():
    return {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}


def test_schedules():
    base = 1e-3
    none = Schedule(LRSchedulerConfig(_target_="none"), base)
    assert none(100, 5) == base

    exp = Schedule(LRSchedulerConfig(_target_="exponential", gamma=0.5), base)
    assert exp(0, 0) == base and exp(999, 2) == base * 0.25

    exps = Schedule(LRSchedulerConfig(_target_="exponential-step", gamma=0.5,
                                      step_size=10), base)
    assert exps(25, 0) == base * 0.25

    warm = Schedule(LRSchedulerConfig(_target_="warmup", warmup_steps=100), base)
    assert warm(50, 0) < warm(100, 0)  # rising
    assert warm(400, 0) < warm(100, 0)  # decaying after peak
    np.testing.assert_allclose(warm(100, 0), base, rtol=1e-6)

    anneal = Schedule(LRSchedulerConfig(_target_="warmup", warmup_steps=10,
                                        anneal_steps=(100,), anneal_rate=0.1), base)
    assert anneal(150, 0) == pytest.approx(warm(150, 0) * 0.1 * 10 ** 0.5 / 10 ** 0.5, rel=1e-6) \
        or anneal(150, 0) < Schedule(LRSchedulerConfig(_target_="warmup", warmup_steps=10), base)(150, 0)


def test_weight_decay_mask_and_update():
    cfg = build_config(OptimizationConfig, {"_target_": "adamw",
                                            "learning_rate": 0.1,
                                            "weight_decay": 0.5})
    params = _params()
    tx, _ = build_optimizer(cfg, params)
    state = tx.init(params)
    # zero grads: only weight decay moves 2-D tensors; 1-D untouched
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0  # decayed
    assert float(jnp.abs(updates["b"]).max()) == 0  # excluded from decay


def test_grad_clipping():
    cfg = build_config(OptimizationConfig, {"_target_": "sgd", "learning_rate": 1.0,
                                            "weight_decay": 0.0,
                                            "grad_clip_norm": 1.0})
    params = _params()
    tx, _ = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: 100.0 * jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    total = jnp.sqrt(sum(jnp.sum(u ** 2) for u in jax.tree_util.tree_leaves(updates)))
    np.testing.assert_allclose(float(total), 1.0, rtol=1e-5)


def test_set_learning_rate_paths():
    params = _params()
    for accum in (1, 2):
        cfg = build_config(OptimizationConfig, {
            "learning_rate": 0.1, "grad_accum_steps": accum})
        tx, _ = build_optimizer(cfg, params)
        state = tx.init(params)
        state = set_learning_rate(state, 0.05, grad_accum=accum > 1,
                                  frozen_mask=False)
        inner = state.inner_opt_state if accum > 1 else state
        assert float(inner.hyperparams["learning_rate"]) == pytest.approx(0.05)


def test_grad_accumulation_matches_large_batch():
    """k accumulation micro-steps == one step on the concatenated batch."""
    def loss_fn(p, x):
        return jnp.mean((x @ p["w"] + p["b"]) ** 2)

    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(8, 4), jnp.float32)
    x2 = jnp.asarray(rng.randn(8, 4), jnp.float32)
    xfull = jnp.concatenate([x1, x2])

    def run(accum, batches):
        params = _params()
        cfg = build_config(OptimizationConfig, {
            "_target_": "sgd", "learning_rate": 0.1, "weight_decay": 0.0,
            "grad_clip_norm": None, "grad_accum_steps": accum})
        tx, _ = build_optimizer(cfg, params)
        state = tx.init(params)
        for xb in batches:
            grads = jax.grad(loss_fn)(params, xb)
            updates, state = tx.update(grads, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params

    p_accum = run(2, [x1, x2])
    p_full = run(1, [xfull])
    np.testing.assert_allclose(np.asarray(p_accum["w"]), np.asarray(p_full["w"]),
                               rtol=1e-5)


def test_freeze_mask_zeroes_updates():
    params = _params()
    cfg = build_config(OptimizationConfig, {"_target_": "sgd",
                                            "learning_rate": 1.0,
                                            "weight_decay": 0.0})
    mask = {"w": True, "b": False}
    tx, _ = build_optimizer(cfg, params, trainable_mask=mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0
    assert float(jnp.abs(updates["b"]).max()) == 0
