"""Mesh / sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from isp_tts_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_params,
)


def test_make_mesh_shapes():
    mesh = make_mesh(data=-1, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(data=-1, model=1)
    assert mesh.shape == {"data": 8, "model": 1}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(data=-1, model=1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4), "name": ["a"]}
    out = shard_batch(batch, mesh)
    assert out["name"] == ["a"]
    assert out["x"].sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)


def test_shard_params_tp_rules():
    from isp_tts_tpu.config import build_config
    from isp_tts_tpu.nn import Transformer, TransformerConfig

    cfg = build_config(TransformerConfig, {
        "dim": 32, "depth": 1, "transformer_layer": {
            "attention": {"heads": 4, "head_dim": 16, "one_kv_head": True},
            "feed_forward": {"inner_dim": 64}}})
    model = Transformer(cfg, rngs=nnx.Rngs(0))
    mesh = make_mesh(data=-1, model=2)
    state = shard_params(nnx.state(model), mesh)
    nnx.update(model, state)

    fc1 = model.layers[0].feed_forward.fc1.kernel.value
    fc2 = model.layers[0].feed_forward.fc2.kernel.value
    to_q = model.layers[0].attention.to_q.kernel.value
    to_kv = model.layers[0].attention.to_kv.kernel.value
    assert "model" in str(fc1.sharding.spec)
    assert "model" in str(fc2.sharding.spec)
    assert "model" in str(to_q.sharding.spec)
    # MQA kv projection (2*head_dim=32 not head-sharded) stays replicated
    assert "model" not in str(to_kv.sharding.spec)


def test_tp_training_step_matches_replicated():
    """One training step with TP=2 sharding must equal the replicated run."""
    import __graft_entry__ as g

    model_a = g._build(g._tiny_model_config())
    model_b = g._build(g._tiny_model_config())
    model_a.train()
    model_b.train()
    from isp_tts_tpu.models.acoustic.loss import AcousticModelLoss

    criterion = AcousticModelLoss()
    tx = optax.adamw(1e-3)

    rng = np.random.RandomState(0)
    B, T, M = 8, 12, 48
    batch = {
        "text_vector": rng.randint(1, 40, (B, T)).astype(np.int32),
        "text_vector_len": np.full((B,), T, np.int32),
        "mel": rng.randn(B, M, 80).astype(np.float32),
        "mel_len": np.full((B,), M, np.int32),
        "pitch": rng.randn(B, M).astype(np.float32),
        "energy": np.abs(rng.randn(B, M)).astype(np.float32),
    }

    def run(model, mesh):
        params = nnx.state(model, nnx.Param)
        opt_state = tx.init(params)
        nnx.update(model, shard_params(nnx.state(model), mesh))
        opt_state = shard_params(opt_state, mesh)
        sharded = shard_batch(batch, mesh)

        @nnx.jit
        def step(model, opt_state, batch):
            def loss_fn(m):
                inputs = m.prepare_inputs(batch)
                out = m(**inputs)
                loss, _ = criterion(inputs, out, 0)
                return loss.astype(jnp.float32)

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            params = nnx.state(model, nnx.Param)
            updates, opt_state = tx.update(grads, opt_state, params)
            nnx.update(model, optax.apply_updates(params, updates))
            return opt_state, loss

        _, loss = step(model, opt_state, sharded)
        return float(loss)

    loss_dp = run(model_a, make_mesh(data=-1, model=1))
    loss_tp = run(model_b, make_mesh(data=-1, model=2))
    np.testing.assert_allclose(loss_dp, loss_tp, rtol=1e-4)
