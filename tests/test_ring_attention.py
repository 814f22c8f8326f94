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
