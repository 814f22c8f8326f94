"""Pipeline parallelism (GPipe schedule over a 'stage' mesh axis) vs
sequential layer application, on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isp_tts_tpu.parallel.pipeline import microbatch, pipeline_apply

P = jax.sharding.PartitionSpec


def _mesh(n):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:n]), ("stage",))


def _mlp_layer(params, h):
    W, b = params
    return jax.nn.gelu(h @ W + b)


def _stack(S, D, seed=0):
    rng = np.random.RandomState(seed)
    W = jnp.asarray(rng.randn(S, D, D).astype(np.float32)) / np.sqrt(D)
    b = jnp.asarray(rng.randn(S, D).astype(np.float32)) * 0.1
    return W, b


def _sequential(W, b, x):
    h = x
    for i in range(W.shape[0]):
        h = _mlp_layer((W[i], b[i]), h)
    return h


def _pipelined(W, b, x, n_micro, n_stages, remat=True):
    mesh = _mesh(n_stages)

    def fn(W, b, xm):
        return pipeline_apply(
            lambda p, h: _mlp_layer((p[0][0], p[1][0]), h),
            (W, b), xm, axis_name="stage", remat=remat)

    xm = microbatch(x, n_micro)
    out = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("stage"), P("stage"), P()),
        out_specs=P())(W, b, xm)
    return out.reshape(x.shape)


@pytest.mark.parametrize("n_micro", [1, 4, 8])
def test_pipeline_matches_sequential(n_micro):
    S, D, B = 8, 16, 16
    W, b = _stack(S, D)
    x = jnp.asarray(np.random.RandomState(1).randn(B, D).astype(np.float32))
    out = _pipelined(W, b, x, n_micro, S)
    ref = _sequential(W, b, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_single_stage_degenerates():
    S, D, B = 1, 8, 8
    W, b = _stack(S, D, seed=2)
    x = jnp.asarray(np.random.RandomState(3).randn(B, D).astype(np.float32))
    out = _pipelined(W, b, x, 4, S)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(W, b, x)), atol=1e-5)


@pytest.mark.parametrize("remat", [True, False])
def test_pipeline_grads_match_sequential(remat):
    S, D, B, n_micro = 4, 12, 8, 4
    W, b = _stack(S, D, seed=4)
    x = jnp.asarray(np.random.RandomState(5).randn(B, D).astype(np.float32))

    def loss_pipe(W, b, x):
        return jnp.sum(_pipelined(W, b, x, n_micro, S, remat=remat) ** 2)

    def loss_seq(W, b, x):
        return jnp.sum(_sequential(W, b, x) ** 2)

    gp = jax.grad(loss_pipe, argnums=(0, 1, 2))(W, b, x)
    gs = jax.grad(loss_seq, argnums=(0, 1, 2))(W, b, x)
    for name, a, bb in zip(("dW", "db", "dx"), gp, gs):
        rel = float(jnp.max(jnp.abs(a - bb)) / (jnp.max(jnp.abs(bb)) + 1e-9))
        assert rel < 1e-5, f"{name} rel err {rel}"


def test_pipeline_real_transformer_layers():
    """Pipeline the framework's actual TransformerLayer stack: 4 stages, one
    layer per stage, vs applying the same layers sequentially."""
    from flax import nnx

    from isp_tts_tpu.nn.attention import AttentionConfig
    from isp_tts_tpu.nn.transformer import (TransformerLayer,
                                            TransformerLayerConfig)

    S, B, N, D = 4, 2, 8, 32
    cfg = TransformerLayerConfig(
        dim=D, attention=AttentionConfig(dim=D, heads=2, head_dim=16))

    @nnx.split_rngs(splits=S)
    @nnx.vmap(in_axes=0, out_axes=0)
    def make_layers(rngs):
        return TransformerLayer(cfg, rngs=rngs)

    layers = make_layers(nnx.Rngs(0))
    # rng counts are 0-d after split_rngs restore; keep them out of the
    # stage-sharded pytree (unused at eval call time) and pipeline the params
    graphdef, rng_state, params = nnx.split(layers, nnx.RngState, ...)
    state_arrays = (nnx.to_pure_dict(params) if hasattr(nnx, "to_pure_dict")
                    else params.to_pure_dict())

    x = jnp.asarray(np.random.RandomState(6).randn(B, N, D).astype(np.float32))

    def apply_one(slice_dict, h):
        layer = nnx.merge(graphdef, rng_state, slice_dict)
        out, _, _ = layer(h)
        return out

    # sequential reference
    h = x
    for i in range(S):
        h = apply_one(jax.tree.map(lambda a: a[i], state_arrays), h)
    ref = h

    mesh = _mesh(S)

    def fn(params, xm):
        return pipeline_apply(
            lambda p, hh: apply_one(jax.tree.map(lambda a: a[0], p), hh),
            params, xm, axis_name="stage")

    out = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("stage"), P()), out_specs=P())(
        state_arrays, microbatch(x, 2))
    np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                               np.asarray(ref), atol=1e-5)
