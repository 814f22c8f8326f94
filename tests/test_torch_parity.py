"""Numerical parity vs an independent torch computation.

The `.pt` interop promise is: reference-layout weights -> identical outputs.
These tests export our modules' weights to torch layouts (via the same
transposition rules as the interop converter), recompute the layer in plain
torch (written here from the reference's documented semantics, not its code),
and require agreement to f32 tolerance. This validates the weight-layout
conversion AND the math of attention/ALiBi/FF/AdaLN/time-embedding.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp
from flax import nnx

from isp_tts_tpu.config import build_config
from isp_tts_tpu.nn import Attention, AttentionConfig, alibi_slopes
from isp_tts_tpu.nn.embeddings import TimePositionalEmbedding
from isp_tts_tpu.nn.feedforward import FeedForward, FeedForwardConfig
from isp_tts_tpu.nn.norms import AdaptiveLayerNorm

B, N, DIM, HEADS, HD = 2, 10, 32, 4, 8


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_attention_mqa_alibi_matches_torch():
    cfg = build_config(AttentionConfig, dict(
        dim=DIM, heads=HEADS, head_dim=HD, one_kv_head=True,
        alibi_pos_bias=True, flash="off"))
    attn = Attention(cfg, rngs=nnx.Rngs(0))
    attn.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(B, N, DIM).astype(np.float32) * 0.5
    ours, *_ = attn(jnp.asarray(x), mask=jnp.ones((B, N), bool))

    # torch recomputation with the torch-layout weights (out, in)
    wq = _t(attn.to_q.kernel.value).T  # (q_dim, dim)
    wkv = _t(attn.to_kv.kernel.value).T  # (2*hd, dim)
    wo = _t(attn.to_out.kernel.value).T  # (dim, q_dim)
    slopes = torch.exp(_t(attn.rel_pos.log_slopes.value))[:, 0, 0]  # (H,)

    xt = _t(x)
    q = (xt @ wq.T).view(B, N, HEADS, HD).transpose(1, 2)  # (B,H,N,hd)
    kv = xt @ wkv.T
    k, v = kv.chunk(2, dim=-1)  # (B,N,hd) single kv head
    logits = torch.einsum("bhnd,bmd->bhnm", q, k) * HD ** -0.5
    i = torch.arange(N)[:, None]
    j = torch.arange(N)[None, :]
    bias = slopes[:, None, None] * (-(j - i).abs().float())
    probs = torch.softmax(logits + bias[None], dim=-1)
    out = torch.einsum("bhnm,bmd->bhnd", probs, v)
    out = out.transpose(1, 2).reshape(B, N, HEADS * HD) @ wo.T

    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=2e-5)


def test_feedforward_glu_matches_torch():
    # gelu_exact = torch nn.GELU (erf); plain "gelu" is the fast tanh form
    # whose ~3e-3 deviation is below bf16 noise but above this test's f32 bar
    cfg = build_config(FeedForwardConfig, dict(
        dim=DIM, inner_dim=64, activation="gelu_exact", glu=True, bias=False))
    ff = FeedForward(cfg, rngs=nnx.Rngs(1))
    ff.eval()

    rng = np.random.RandomState(1)
    x = rng.randn(B, N, DIM).astype(np.float32)
    ours = ff(jnp.asarray(x))

    w1 = _t(ff.fc1.kernel.value).T  # (2*inner, dim)
    w2 = _t(ff.fc2.kernel.value).T  # (dim, inner)
    h = _t(x) @ w1.T
    a, gate = h.chunk(2, dim=-1)
    out = (a * torch.nn.functional.gelu(gate)) @ w2.T
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=2e-5)


def test_adaln_matches_torch():
    ada = AdaptiveLayerNorm(DIM, condition_dim=8, rngs=nnx.Rngs(2))
    # give the zero-initialised projections real values
    rng = np.random.RandomState(3)
    ada.weight.kernel.value = jnp.asarray(rng.randn(8, DIM) * 0.1, jnp.float32)
    ada.bias.kernel.value = jnp.asarray(rng.randn(8, DIM) * 0.1, jnp.float32)

    x = rng.randn(B, N, DIM).astype(np.float32)
    cond = rng.randn(B, 8).astype(np.float32)
    ours = ada(jnp.asarray(x), jnp.asarray(cond))

    w_w = _t(ada.weight.kernel.value).T
    w_b = _t(ada.weight.bias.value)
    b_w = _t(ada.bias.kernel.value).T
    b_b = _t(ada.bias.bias.value)
    xt = _t(x)
    ct = _t(cond)
    weight = (ct @ w_w.T + w_b)[:, None, :]
    bias = (ct @ b_w.T + b_b)[:, None, :]
    normed = torch.nn.functional.layer_norm(xt, (DIM,), None, None, eps=1e-5)
    out = weight * normed + bias
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=2e-5)


def test_time_embedding_matches_torch():
    emb = TimePositionalEmbedding(freq_dim=16, emb_dim=24, theta=1000.0,
                                  freq_scale=1000.0, with_steps=True,
                                  rngs=nnx.Rngs(4))
    t = np.asarray([0.0, 0.25, 1.0], np.float32)
    ours = emb(jnp.asarray(t))

    w1 = _t(emb.fc1.kernel.value).T
    b1 = _t(emb.fc1.bias.value)
    w2 = _t(emb.fc2.kernel.value).T
    b2 = _t(emb.fc2.bias.value)
    tt = _t(t)
    half = 8
    inv_freq = 1000.0 ** -(torch.arange(half).float() / half)
    ang = tt[:, None] * 1000.0 * inv_freq
    feats = torch.cat([tt[:, None], ang.sin(), ang.cos()], dim=-1)
    out = torch.nn.functional.silu(feats @ w1.T + b1) @ w2.T + b2
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=3e-5)


def test_alibi_slopes_match_reference_formula():
    """Slopes for the recipe's 6-head config against hand-derived values."""
    np.testing.assert_allclose(
        alibi_slopes(6),
        [0.25, 0.0625, 0.015625, 0.00390625, 0.5, 0.125])
