import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.nn import (
    AdaptiveLayerNorm,
    Attention,
    AttentionConfig,
    LearnedALiBiBias,
    MaskedInstanceNorm1d,
    Transformer,
    TransformerConfig,
    alibi_slopes,
)


def test_alibi_slopes_power_of_two():
    np.testing.assert_allclose(alibi_slopes(8), [2.0 ** -(i + 1) for i in range(8)])


def test_alibi_slopes_non_power_of_two():
    # 6 heads: 4 base slopes (start 0.25) + every other of the 8-head set
    expected = [0.25, 0.0625, 0.015625, 0.00390625, 0.5, 0.125]
    np.testing.assert_allclose(alibi_slopes(6), expected)


def test_learned_alibi_bias_values_and_head_padding():
    bias_mod = LearnedALiBiBias(heads=2, total_heads=4, symmetric=True)
    b = np.asarray(bias_mod(3, 3))
    assert b.shape == (4, 3, 3)
    slopes = alibi_slopes(2)
    np.testing.assert_allclose(b[0], slopes[0] * -np.abs(np.subtract.outer([0, 1, 2], [0, 1, 2])).T, rtol=1e-6)
    np.testing.assert_array_equal(b[2], 0)  # padded heads: zero bias
    np.testing.assert_array_equal(b[3], 0)


def test_learned_alibi_asymmetric():
    bias_mod = LearnedALiBiBias(heads=2, total_heads=2, symmetric=False)
    b = np.asarray(bias_mod(4, 4))
    s = alibi_slopes(2)
    dist = -np.abs(np.subtract.outer(np.arange(4), np.arange(4)))
    # lower triangle scaled by head slopes, upper by rolled slopes
    np.testing.assert_allclose(b[0], s[0] * np.tril(dist) + s[1] * np.triu(dist), rtol=1e-6)


def test_adaptive_layernorm_identity_at_init():
    rngs = nnx.Rngs(0)
    ada = AdaptiveLayerNorm(8, condition_dim=4, rngs=rngs)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), jnp.float32)
    cond = jnp.asarray(np.random.RandomState(1).randn(2, 4), jnp.float32)
    out = np.asarray(ada(x, cond))
    # zero-init projections -> weight=1, bias=0 -> plain parameter-free LN
    mean = x - jnp.mean(x, axis=-1, keepdims=True)
    expected = np.asarray(mean / jnp.sqrt(jnp.var(x, axis=-1, keepdims=True) + 1e-5))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_masked_instance_norm_ignores_padding():
    rng = np.random.RandomState(0)
    x_valid = rng.randn(2, 6, 3).astype(np.float32)
    norm = MaskedInstanceNorm1d(3)
    # pad with huge garbage; stats must not change
    x_padded = np.concatenate([x_valid, 1e6 * np.ones((2, 4, 3), np.float32)], axis=1)
    mask = np.zeros((2, 10), bool)
    mask[:, :6] = True
    out_padded = np.asarray(norm(jnp.asarray(x_padded), jnp.asarray(mask)))[:, :6]
    out_ref = np.asarray(norm(jnp.asarray(x_valid), jnp.asarray(np.ones((2, 6), bool))))
    np.testing.assert_allclose(out_padded, out_ref, atol=1e-4)


def _make_attention(**over):
    cfg = build_config(AttentionConfig, dict(dim=32, heads=4, head_dim=8, **over))
    return Attention(cfg, rngs=nnx.Rngs(0))


def test_attention_shapes_mqa_and_mha():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 32), jnp.float32)
    for one_kv in (False, True):
        attn = _make_attention(one_kv_head=one_kv)
        out, *_ = attn(x)
        assert out.shape == (2, 7, 32)


def test_attention_mask_invariance():
    """Padded-batch outputs must equal unpadded outputs on valid positions."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 5, 32).astype(np.float32)
    attn = _make_attention(one_kv_head=True, alibi_pos_bias=True, alibi_heads=2)
    attn.eval()
    out_short, *_ = attn(jnp.asarray(x), mask=jnp.ones((1, 5), bool))
    x_pad = np.concatenate([x, rng.randn(1, 3, 32).astype(np.float32)], axis=1)
    mask = jnp.asarray([[True] * 5 + [False] * 3])
    out_pad, *_ = attn(jnp.asarray(x_pad), mask=mask)
    np.testing.assert_allclose(np.asarray(out_pad)[:, :5], np.asarray(out_short), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_pad)[:, 5:], 0)


def test_transformer_end_to_end_mask_invariance():
    cfg = build_config(TransformerConfig, {
        "dim": 32, "depth": 2,
        "transformer_layer": {
            "attention": {"heads": 4, "head_dim": 8, "one_kv_head": True,
                          "alibi_pos_bias": True},
            "feed_forward": {"inner_dim": 64, "activation": "gelu"},
        },
    })
    model = Transformer(cfg, rngs=nnx.Rngs(0))
    model.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 32).astype(np.float32)
    out_short = np.asarray(model(jnp.asarray(x), mask=jnp.ones((1, 6), bool)).out)
    x_pad = np.concatenate([x, rng.randn(1, 4, 32).astype(np.float32)], axis=1)
    mask = jnp.asarray([[True] * 6 + [False] * 4])
    out_pad = np.asarray(model(jnp.asarray(x_pad), mask=mask).out)
    np.testing.assert_allclose(out_pad[:, :6], out_short, atol=2e-5)


def test_transformer_adaptive_norm_and_jit():
    cfg = build_config(TransformerConfig, {
        "dim": 16, "depth": 2, "adaptive_norm": True, "condition_dim": 8,
        "transformer_layer": {"attention": {"heads": 2, "head_dim": 8},
                              "feed_forward": {"inner_dim": 32}},
    })
    model = Transformer(cfg, rngs=nnx.Rngs(0))
    model.eval()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16), jnp.float32)
    cond = jnp.asarray(np.random.RandomState(1).randn(2, 8), jnp.float32)

    @nnx.jit
    def run(m, x, c):
        return m(x, adaptive_condition=c).out

    out = run(model, x, cond)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_transformer_abs_pos_only_without_alibi():
    mk = lambda alibi: Transformer(
        build_config(TransformerConfig, {
            "dim": 16, "depth": 1,
            "transformer_layer": {"attention": {"heads": 2, "head_dim": 8,
                                                "alibi_pos_bias": alibi}},
        }),
        rngs=nnx.Rngs(0),
    )
    assert mk(False).use_abs_pos_emb
    assert not mk(True).use_abs_pos_emb


def test_masked_batch_norm_running_stats():
    from isp_tts_tpu.nn.norms import MaskedBatchNorm1d

    rng = np.random.RandomState(0)
    x = rng.randn(4, 10, 3).astype(np.float32) * 2.0 + 1.0
    x_pad = np.concatenate([x, 1e5 * np.ones((4, 6, 3), np.float32)], axis=1)
    mask = np.zeros((4, 16), bool)
    mask[:, :10] = True

    bn = MaskedBatchNorm1d(3)
    out = np.asarray(bn(jnp.asarray(x_pad), jnp.asarray(mask)))
    # normalized over valid positions only; padding zeroed
    valid = out[:, :10].reshape(-1, 3)
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-3)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=2e-2)
    assert out[:, 10:].sum() == 0
    # running stats moved toward the masked batch stats, not the garbage
    assert np.abs(np.asarray(bn.mean.value) - 0.1 * x.reshape(-1, 3).mean(0)).max() < 0.05

    # eval mode: uses running averages, no update
    bn.eval()
    before = np.asarray(bn.mean.value).copy()
    bn(jnp.asarray(x_pad), jnp.asarray(mask))
    np.testing.assert_array_equal(before, np.asarray(bn.mean.value))


def test_choose_normalization_factory():
    from isp_tts_tpu.nn.layers import choose_normalization
    from isp_tts_tpu.nn.norms import MaskedBatchNorm1d, MaskedInstanceNorm1d

    assert choose_normalization(None) is None
    assert choose_normalization("batch") is MaskedBatchNorm1d
    assert choose_normalization("instance") is MaskedInstanceNorm1d
    import pytest

    with pytest.raises(KeyError):
        choose_normalization("nope")


def test_attention_kv_cache_incremental():
    """Incremental decoding with a KV cache == full-sequence attention."""
    attn = _make_attention(causal=True)
    attn.eval()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)

    full, _, _ = attn(x)

    cache = None
    outs = []
    for t in range(6):
        out_t, _, cache = attn(x[:, t:t + 1], cache=cache)
        outs.append(out_t)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-5)


def test_fast_dropout_mask_regeneration():
    """_dropout_regen's backward regenerates the same keep mask from the
    key: dx zeros line up exactly with y zeros and the scale matches; the
    module is the identity in eval mode."""
    import jax

    from isp_tts_tpu.nn.layers import FastDropout, _dropout_regen

    key = jax.random.key(7)
    x = jnp.ones((64, 128), jnp.float32)
    y, vjp = jax.vjp(lambda xx: _dropout_regen(xx, key, 0.25), x)
    (dx,) = vjp(jnp.ones_like(y))
    y, dx = np.asarray(y), np.asarray(dx)
    np.testing.assert_array_equal(y == 0.0, dx == 0.0)
    nz = y != 0.0
    assert nz.any() and (~nz).any()
    np.testing.assert_allclose(y[nz], dx[nz], rtol=1e-6)
    # keep fraction ~ round(0.75*256)/256
    assert abs(nz.mean() - 192 / 256) < 0.03

    drop = FastDropout(0.25, rngs=nnx.Rngs(0, dropout=7))
    assert not np.array_equal(np.asarray(drop(x)), np.asarray(x))
    drop.eval()
    np.testing.assert_array_equal(np.asarray(drop(x)), np.asarray(x))


def test_per_layer_alibi_slopes_are_live_on_einsum_path():
    """What the stack SHARES is the slope-free distance matrix; each
    layer's own learned slopes must multiply (reference attention.py:148-152
    caches get_bias's output only). Before the round-4 fix, layers 1+
    reused layer 0's slope-multiplied bias on the einsum path, so a trained
    checkpoint's layer-1 slopes were dead at serve time."""
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from isp_tts_tpu.config import build_config
    from isp_tts_tpu.nn import Transformer, TransformerConfig

    cfg = build_config(TransformerConfig, {
        "dim": 32, "depth": 2, "transformer_layer": {
            "attention": {"heads": 2, "head_dim": 16, "one_kv_head": True,
                          "alibi_pos_bias": True, "flash": "off"},
            "feed_forward": {"inner_dim": 64}}})
    tf = Transformer(cfg, rngs=nnx.Rngs(0))
    tf.eval()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 32), jnp.float32)
    base = np.asarray(tf(x).out)

    # perturb ONLY layer 1's slopes: the output must change
    sl = tf.layers[1].attention.rel_pos.log_slopes
    sl.value = sl.value + 1.0
    moved = np.asarray(tf(x).out)
    assert np.abs(moved - base).max() > 1e-4, \
        "layer-1 slopes are dead weights on the einsum path"

    # and layer-0 perturbation still matters too (sharing not inverted)
    tf2 = Transformer(cfg, rngs=nnx.Rngs(0))
    tf2.eval()
    s0 = tf2.layers[0].attention.rel_pos.log_slopes
    s0.value = s0.value + 1.0
    moved0 = np.asarray(tf2(x).out)
    assert np.abs(moved0 - base).max() > 1e-4
