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


# ---------------------------------------------------------------------------
# recipe-selectable pipeline parallelism (round 4): stacked-storage
# Transformer, stage-sharded execution, checkpoint layout translation
# ---------------------------------------------------------------------------

def _stage_mesh(stage):
    from isp_tts_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    return make_mesh(data=n // stage, stage=stage)


def test_stacked_transformer_pipelined_matches_local():
    """Transformer(pipeline=True): the GPipe schedule over a live stage axis
    must equal the same module's local (no-context) execution."""
    from flax import nnx

    from isp_tts_tpu.nn.attention import AttentionConfig
    from isp_tts_tpu.nn.transformer import Transformer, TransformerConfig
    from isp_tts_tpu.parallel.context import parallel_context

    B, N, D = 4, 16, 32
    cfg = TransformerConfig(
        dim=D, depth=4, pipeline=True,
        transformer_layer={"attention": {"heads": 2, "head_dim": 16,
                                         "one_kv_head": True,
                                         "alibi_pos_bias": True}})
    tf = Transformer(cfg, rngs=nnx.Rngs(0))
    tf.eval()
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, D).astype(np.float32))
    mask = jnp.arange(N)[None, :] < jnp.asarray([[N], [N - 3], [N], [N - 7]])

    local = tf(x, mask=mask).out
    with parallel_context(mesh=_stage_mesh(4), stage_axis="stage", n_micro=2):
        piped = tf(x, mask=mask).out
    np.testing.assert_allclose(np.asarray(piped), np.asarray(local),
                               atol=2e-5)


def test_stacked_transformer_rejects_unsupported_calls():
    from flax import nnx

    from isp_tts_tpu.nn.transformer import Transformer, TransformerConfig

    cfg = TransformerConfig(dim=16, depth=2, pipeline=True,
                            transformer_layer={"attention": {"heads": 2,
                                                             "head_dim": 8}})
    tf = Transformer(cfg, rngs=nnx.Rngs(0))
    x = jnp.zeros((2, 8, 16))
    with pytest.raises(ValueError, match="pipeline"):
        tf(x, context=jnp.zeros((2, 4, 16)))


def test_layer_stack_checkpoint_translation_roundtrip():
    """A per-layer-trained checkpoint loads into a pipeline=True model (and
    back) with identical inference — checkpoints move freely between dp/tp
    and pp configurations (models/base._translate_layer_stacking)."""
    import jax as _jax
    from flax import nnx

    from isp_tts_tpu.config import build_config
    from isp_tts_tpu.models.acoustic.model import (AcousticModel,
                                                   AcousticModelConfig)
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
    from __graft_entry__ import _tiny_model_config

    cfg_plain = _tiny_model_config()
    cfg_piped = _tiny_model_config()
    cfg_piped["decoder"]["pipeline"] = True

    plain = AcousticModel(build_config(AcousticModelConfig, cfg_plain),
                          rngs=nnx.Rngs(0))
    piped = AcousticModel(build_config(AcousticModelConfig, cfg_piped),
                          rngs=nnx.Rngs(1))
    plain.eval()
    piped.eval()

    # per-layer -> stacked
    piped.load_params(plain.state_dict())
    toks = jnp.asarray(np.random.RandomState(3).randint(1, 40, (2, 10)),
                       jnp.int32)
    key = _jax.random.PRNGKey(0)
    mel_a, ad_a = plain.infer(toks, max_dec_len=64, steps=2, key=key)
    mel_b, ad_b = piped.infer(toks, max_dec_len=64, steps=2, key=key)
    assert np.array_equal(np.asarray(ad_a.dec_lengths),
                          np.asarray(ad_b.dec_lengths))
    np.testing.assert_allclose(np.asarray(mel_b), np.asarray(mel_a),
                               atol=5e-5)

    # stacked -> per-layer (round trip through the translated state)
    plain2 = AcousticModel(build_config(AcousticModelConfig, cfg_plain),
                           rngs=nnx.Rngs(2))
    plain2.eval()
    plain2.load_params(piped.state_dict())
    for k, v in plain.state_dict().items():
        np.testing.assert_array_equal(np.asarray(plain2.state_dict()[k]),
                                      np.asarray(v), err_msg=k)
