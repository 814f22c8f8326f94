"""Ring (sequence-parallel) attention vs the einsum oracle, on the virtual
8-device CPU mesh. Covers MQA, ragged key/query lengths, ALiBi offset,
causal masking, and gradients through the whole ring (shard_map + scan +
ppermute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isp_tts_tpu.ops.attention import scaled_dot_product_attention
from isp_tts_tpu.ops.ring_attention import ring_attention

P = jax.sharding.PartitionSpec


def _mesh(n):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:n]), ("seq",))


def _ref_attn(q, k, v, slopes2, key_lens, scale, offset=0, q_lens=None,
              causal=False):
    """Same oracle as tests/test_flash_attention.py."""
    N, M = q.shape[2], k.shape[2]
    i = jnp.arange(N)[:, None]
    j = jnp.arange(M)[None, :]
    dist = -jnp.abs(j - i - offset).astype(jnp.float32)
    lower = j <= i + offset
    bias = jnp.where(lower, slopes2[0][:, None, None] * dist,
                     slopes2[1][:, None, None] * dist)
    mask = (j < key_lens[:, None])[:, None, None, :]
    if causal:
        mask = mask & lower[None, None]
    out = scaled_dot_product_attention(q, k, v, scale=scale, bias=bias[None],
                                       mask=mask)
    if q_lens is not None:
        out = out * (jnp.arange(N)[None, :] < q_lens[:, None])[
            :, None, :, None].astype(out.dtype)
    return out


def _ring(q, k, v, slopes2, key_lens, scale, offset=0, q_lens=None,
          causal=False, n_shards=8):
    mesh = _mesh(n_shards)
    seq = P(None, None, "seq", None)

    def fn(q, k, v, s, kl, ql):
        return ring_attention(q, k, v, s, kl, scale, axis_name="seq",
                              offset=offset, q_lens=ql, causal=causal)

    ql = q_lens if q_lens is not None else jnp.full(
        (q.shape[0],), q.shape[2], jnp.int32)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(seq, seq, seq, P(), P(), P()),
        out_specs=seq)(q, k, v, slopes2, key_lens, ql)


def _inputs(hkv, B=2, H=4, N=64, D=16, seed=0):
    from isp_tts_tpu.nn.embeddings import alibi_slopes

    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) * 0.4
    k = jnp.asarray(rng.randn(B, hkv, N, D).astype(np.float32)) * 0.4
    v = jnp.asarray(rng.randn(B, hkv, N, D).astype(np.float32)) * 0.4
    sl = jnp.asarray(alibi_slopes(H), jnp.float32)
    slopes2 = jnp.stack([sl, 0.5 * sl])  # asymmetric: exercises both sides
    key_lens = jnp.asarray([N, N - 29], jnp.int32)
    return q, k, v, slopes2, key_lens, D ** -0.5


@pytest.mark.parametrize("hkv", [1, 4])
def test_ring_matches_oracle(hkv):
    q, k, v, slopes2, key_lens, scale = _inputs(hkv)
    out = _ring(q, k, v, slopes2, key_lens, scale)
    ref = _ref_attn(q, k, v, slopes2, key_lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("offset", [0, 3])
def test_ring_causal_and_qlens(offset):
    q, k, v, slopes2, key_lens, scale = _inputs(4, seed=1)
    q_lens = jnp.asarray([64, 41], jnp.int32)
    out = _ring(q, k, v, slopes2, key_lens, scale, offset=offset,
                q_lens=q_lens, causal=True)
    ref = _ref_attn(q, k, v, slopes2, key_lens, scale, offset=offset,
                    q_lens=q_lens, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # causal + offset 0: the first shard's first row sees exactly key 0;
    # sanity that dead rows (beyond q_lens) are exact zeros
    np.testing.assert_array_equal(np.asarray(out)[1, :, 41:], 0.0)


@pytest.mark.parametrize("remat", [True, False])
def test_ring_grads_match_oracle(remat):
    q, k, v, slopes2, key_lens, scale = _inputs(4, seed=2)
    mesh = _mesh(8)
    seq = P(None, None, "seq", None)
    ql = jnp.full((2,), 64, jnp.int32)

    ring_fn = jax.shard_map(
        lambda q, k, v, s: ring_attention(
            q, k, v, s, key_lens, scale, axis_name="seq", q_lens=ql,
            remat=remat),
        mesh=mesh, in_specs=(seq, seq, seq, P()), out_specs=seq)

    def loss_ring(q, k, v, s):
        return jnp.sum(ring_fn(q, k, v, s) ** 2)

    def loss_ref(q, k, v, s):
        return jnp.sum(_ref_attn(q, k, v, s, key_lens, scale) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2, 3))(q, k, v, slopes2)
    go = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, slopes2)
    for name, a, b in zip(("dq", "dk", "dv", "dslopes"), gr, go):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel < 1e-4, f"{name} rel err {rel}"


def test_ring_zero_slopes_is_plain_attention():
    """slopes = 0 disables ALiBi: matches plain masked SDPA."""
    q, k, v, _, key_lens, scale = _inputs(4, seed=3)
    zeros = jnp.zeros((2, 4), jnp.float32)
    out = _ring(q, k, v, zeros, key_lens, scale)
    mask = (jnp.arange(64)[None, :] < key_lens[:, None])[:, None, None, :]
    ref = scaled_dot_product_attention(q, k, v, scale=scale, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_fully_masked_batch_element():
    """key_len = 0 for one batch element -> zero outputs, finite grads."""
    q, k, v, slopes2, _, scale = _inputs(4, seed=4)
    key_lens = jnp.asarray([64, 0], jnp.int32)
    out = _ring(q, k, v, slopes2, key_lens, scale)
    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)
    ref = _ref_attn(q, k, v, slopes2, key_lens, scale)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0],
                               atol=2e-5)


# ---------------------------------------------------------------------------
# recipe-selectable sequence parallelism (round 4): ring dispatch from the
# Attention module via the parallel context, sharded wrapper inside jit,
# shard-count-invariant probability dropout
# ---------------------------------------------------------------------------

def _seq_mesh(seq):
    from isp_tts_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    return make_mesh(data=n // seq, model=1, seq=seq, stage=1)


def test_ring_sharded_wrapper_matches_oracle():
    """ring_attention_sharded (partial-manual shard_map inside jit, the
    Attention dispatch target) == the einsum oracle, batch still sharded
    over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from isp_tts_tpu.ops.ring_attention import ring_attention_sharded

    q, k, v, slopes2, key_lens, scale = _inputs(1, B=2, H=4, N=64)
    mesh = _seq_mesh(4)  # data=2 x seq=4
    qs = jax.device_put(q, NamedSharding(mesh, P("data")))

    @jax.jit
    def f(q, k, v):
        return ring_attention_sharded(q, k, v, slopes2, key_lens, scale,
                                      mesh=mesh, axis_name="seq")

    out = f(qs, k, v)
    ref = _ref_attn(q, k, v, slopes2, key_lens, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_dropout_shard_count_invariant():
    """Probability dropout's keep mask hashes GLOBAL coordinates: seq=4 and
    seq=1 meshes drop identical probabilities (the property dryrun's
    sharded==single train equivalence rests on), and the kept fraction
    rescales like the einsum path."""
    from isp_tts_tpu.ops.ring_attention import ring_attention_sharded

    q, k, v, slopes2, key_lens, scale = _inputs(1, B=2, H=4, N=64)
    seed = jnp.asarray(1234, jnp.int32)

    outs = []
    for seq in (1, 4):
        mesh = _seq_mesh(seq)
        out = jax.jit(lambda q, k, v: ring_attention_sharded(
            q, k, v, slopes2, key_lens, scale, mesh=mesh, axis_name="seq",
            dropout_rate=0.25, dropout_seed=seed))(q, k, v)
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    # dropout actually dropped something, and E[out] ~ undropped out
    nodrop = np.asarray(_ring(q, k, v, slopes2, key_lens, scale, n_shards=8))
    assert np.abs(outs[0] - nodrop).max() > 1e-3
    # valid region only (key_lens masks rows differently)
    rel = (np.abs(outs[0] - nodrop).mean()
           / (np.abs(nodrop).mean() + 1e-9))
    assert rel < 1.0  # same scale (inv_keep rescale applied)


def test_attention_module_ring_dispatch():
    """Attention(flash='ring') under a live seq-axis parallel context ==
    the same module with flash='off' (einsum oracle); with no context the
    ring config must silently serve on the local path."""
    from flax import nnx

    from isp_tts_tpu.nn.attention import Attention, AttentionConfig
    from isp_tts_tpu.parallel.context import parallel_context

    B, N, D = 2, 64, 48
    cfg = dict(dim=D, heads=4, head_dim=16, one_kv_head=True,
               alibi_pos_bias=True)
    ring_mod = Attention(AttentionConfig(flash="ring", **cfg), rngs=nnx.Rngs(0))
    off_mod = Attention(AttentionConfig(flash="off", **cfg), rngs=nnx.Rngs(0))
    ring_mod.eval()
    off_mod.eval()

    x = jnp.asarray(np.random.RandomState(0).randn(B, N, D).astype(np.float32))
    mask = jnp.arange(N)[None, :] < jnp.asarray([[N], [N - 13]])

    ref, _, _ = off_mod(x, mask=mask)
    mesh = _seq_mesh(4)
    with parallel_context(mesh=mesh, seq_axis="seq"):
        out, _, _ = ring_mod(x, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # no context: local fallback, same numbers
    out2, _, _ = ring_mod(x, mask=mask)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)
