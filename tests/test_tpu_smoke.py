"""Minimal on-hardware kernel smoke suite (VERDICT r2 item 9).

Run every round with:  ISP_TTS_TPU_TESTS=1 pytest -m tpu_smoke -q
Target wall time through the relay: < 10 min (one fwd+bwd case per kernel
family + one serving call). The exhaustive TPU matrix lives in
test_flash_attention.py and is too slow for per-round execution (~350 s per
parametrized case through the relay).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_flash_attention import _ref_attn_mqa

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="TPU smoke tests need the real chip (ISP_TTS_TPU_TESTS=1)",
)

pytestmark = pytest.mark.tpu_smoke


@requires_tpu
def test_smoke_flash_mqa_symmetric_fwd_bwd():
    """The production configuration: folded-MQA, symmetric learned ALiBi,
    ragged key lengths — output + dq/dk/dv/dslopes vs the einsum oracle."""
    from isp_tts_tpu.nn.embeddings import alibi_slopes
    from isp_tts_tpu.ops.flash_attention import (
        DEF_BLOCK_K_MQA, DEF_BLOCK_R, flash_attention_mqa)

    rng = np.random.RandomState(0)
    B, N, H, D = 2, 256, 6, 64
    q = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, N, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, N, D).astype(np.float32)) * 0.3
    sl = jnp.asarray(alibi_slopes(H), jnp.float32)
    slopes2 = jnp.stack([sl, sl])
    key_lens = jnp.asarray([N, N - 57], jnp.int32)
    scale = D ** -0.5

    def run(q, k, v, s):
        return flash_attention_mqa(q, k, v, s, key_lens, scale, 0,
                                   DEF_BLOCK_R, DEF_BLOCK_K_MQA, True)

    def ref(q, k, v, s):
        s = jnp.stack([s[0], s[0]])
        return _ref_attn_mqa(q, k, v, s, key_lens, scale, 0)

    np.testing.assert_allclose(np.asarray(run(q, k, v, slopes2)),
                               np.asarray(ref(q, k, v, slopes2)), atol=5e-3)
    gf = jax.grad(lambda *a: jnp.sum(run(*a) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, slopes2)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, slopes2)
    for name, a, b in zip(("dq", "dk", "dv", "dslopes"), gf, gr):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel < 2e-2, f"{name} rel err {rel}"


@requires_tpu
def test_smoke_flash_mqa_causal_ragged_query():
    """Causal masking + query-validity on hardware (one case; the matrix is
    interpret-tested)."""
    from isp_tts_tpu.nn.embeddings import alibi_slopes
    from isp_tts_tpu.ops.flash_attention import (
        DEF_BLOCK_K_MQA, DEF_BLOCK_R, flash_attention_mqa)

    rng = np.random.RandomState(1)
    B, N, H, D = 2, 256, 6, 64
    q = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, N, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, N, D).astype(np.float32)) * 0.3
    sl = jnp.asarray(alibi_slopes(H), jnp.float32)
    slopes2 = jnp.stack([sl, sl * 0.5])
    key_lens = jnp.asarray([N, N - 33], jnp.int32)
    q_lens = jnp.asarray([N - 21, N], jnp.int32)
    scale = D ** -0.5

    out = flash_attention_mqa(q, k, v, slopes2, key_lens, scale, 0,
                              DEF_BLOCK_R, DEF_BLOCK_K_MQA, False,
                              q_lens=q_lens, causal=True)
    ref = _ref_attn_mqa(q, k, v, slopes2, key_lens, scale, 0,
                        q_lens=q_lens, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
    g = jax.grad(lambda q: jnp.sum(flash_attention_mqa(
        q, k, v, slopes2, key_lens, scale, 0, DEF_BLOCK_R, DEF_BLOCK_K_MQA,
        False, q_lens=q_lens, causal=True) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


@requires_tpu
def test_smoke_mas_pallas_matches_oracle():
    from isp_tts_tpu.ops import mas_numpy
    from isp_tts_tpu.ops.mas_pallas import monotonic_alignment_search_pallas

    rng = np.random.RandomState(2)
    B, M, T = 4, 128, 32
    logits = rng.randn(B, M, T).astype(np.float32)
    i = np.arange(M)[:, None] / M
    j = np.arange(T)[None, :] / T
    logits += -8.0 * (i - j) ** 2
    tl = np.array([32, 20, 9, 27], np.int32)
    ml = np.array([128, 80, 40, 100], np.int32)
    ours = np.asarray(monotonic_alignment_search_pallas(logits, tl, ml))
    np.testing.assert_array_equal(ours, mas_numpy(logits, tl, ml))


@requires_tpu
def test_smoke_serving_call():
    from flax import nnx

    from isp_tts_tpu.config import build_config
    from isp_tts_tpu.models.acoustic.model import (
        AcousticModel, AcousticModelConfig)
    from isp_tts_tpu.serving import Synthesizer, SynthesizerConfig
    from tests.test_serving import TINY

    from isp_tts_tpu.data.text.table import CodingTable

    charset = ["<pad>", "</s>", "#punct", "#en"]
    ct = CodingTable.from_charset(charset)
    model = AcousticModel(
        build_config(AcousticModelConfig,
                     dict(TINY, encoding_map=dict(ct.encoding_map))),
        rngs=nnx.Rngs(0))
    synth = Synthesizer(model, SynthesizerConfig(
        text_buckets=(32,), frame_budgets=(128,), frames_per_token=4.0,
        steps=2, charset=tuple(charset)))
    mels = synth("smoke test on hardware.")
    assert mels[0].shape[1] == 16 and np.isfinite(mels[0]).all()


@requires_tpu
def test_smoke_ctc_pallas_fwd_bwd():
    """Banded-CTC Pallas kernels vs the lax.scan oracle on hardware.

    Values agree to fp exactness; gradients to ~5e-3 absolute (occupancies
    are <= 1): the beta recursion recomputes the occupancy via TPU-precision
    exp/log1p over M log-space steps, while the scan oracle's gradient is
    the autodiff chain — two valid fp paths through the same math.
    """
    from isp_tts_tpu.models.acoustic.loss import _ordered_ctc_neg_logp
    from isp_tts_tpu.ops.ctc_pallas import ordered_ctc_neg_logp_pallas

    rng = np.random.RandomState(3)
    B, M, T = 8, 256, 64
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, M, T + 1).astype(np.float32)), axis=2)
    tl = jnp.asarray(rng.randint(1, T + 1, size=B), jnp.int32)
    ml = jnp.asarray(rng.randint(T + 1, M + 1, size=B), jnp.int32)
    w = jnp.asarray(rng.rand(B).astype(np.float32))

    def loss(fn, x):
        return jnp.sum(fn(x, tl, ml) * w)

    v_ref, g_ref = jax.value_and_grad(
        lambda x: loss(_ordered_ctc_neg_logp, x))(lp)
    v_pal, g_pal = jax.value_and_grad(
        lambda x: loss(ordered_ctc_neg_logp_pallas, x))(lp)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=5e-3)


@requires_tpu
def test_smoke_neural_vocoder_infer():
    """The committed convergence-run vocoder generates audio on-chip: one
    matmul-iSTFT pass, finite, correct length (hop samples per mel frame)."""
    from pathlib import Path

    from isp_tts_tpu.models import VocoderModel

    ckpt = (Path(__file__).parent.parent
            / "docs/assets/vocoder_r3/vocoder_synth_r3.f16.ckpt")
    if not ckpt.exists():
        pytest.skip("committed vocoder checkpoint not present")
    voc = VocoderModel.from_pretrained(ckpt)
    voc.eval()
    mel = jnp.asarray(
        np.random.RandomState(0).randn(2, 64, 80).astype(np.float32) * 2 - 6)
    wav = np.asarray(voc.infer(mel))
    assert wav.shape == (2, 64 * voc.features_config.hop_length)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 0


@requires_tpu
def test_smoke_flash_per_head_dropout_fwd_bwd():
    """Round 5: the per-head-grid kernels' in-kernel probability dropout on
    the real chip — output + all grads vs an oracle that drops the SAME
    hash-mask positions (the mask derives from global element indices, so
    the kernel and oracle agree bit-for-bit on what was dropped)."""
    import isp_tts_tpu.ops.flash_attention as fa
    from isp_tts_tpu.nn.embeddings import alibi_slopes
    from isp_tts_tpu.ops.attention import scaled_dot_product_attention

    rng = np.random.RandomState(11)
    B, H, N, D, M = 2, 4, 128, 64, 128
    rate = 0.3
    seed = jnp.asarray(424242, jnp.int32)
    q = jnp.asarray(rng.randn(B, H, N, D).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(B, H, M, D).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(B, H, M, D).astype(np.float32)) * 0.3
    sl = jnp.asarray(alibi_slopes(H), jnp.float32)
    slopes2 = jnp.stack([sl, sl * 0.5])
    key_lens = jnp.asarray([M, M - 21], jnp.int32)
    scale = D ** -0.5

    thresh = fa.dropout_thresh(rate)
    bh = (jnp.arange(B)[:, None, None, None] * H
          + jnp.arange(H)[None, :, None, None])
    idx = (bh * N + jnp.arange(N)[None, None, :, None]) * M \
        + jnp.arange(M)[None, None, None, :]
    keep = fa._keep_hash(idx, seed, thresh)  # (B, H, N, M)

    def run(q, k, v, s):
        return fa.flash_attention(q, k, v, s, key_lens, scale,
                                  dropout_rate=rate, dropout_seed=seed)

    def ref(q, k, v, s):
        i = jnp.arange(N)[:, None]
        j = jnp.arange(M)[None, :]
        dist = -jnp.abs(j - i).astype(jnp.float32)
        lower = j <= i
        bias = jnp.where(lower, s[0][:, None, None] * dist,
                         s[1][:, None, None] * dist)
        mask = (j < key_lens[:, None])[:, None, None, :]
        probs = scaled_dot_product_attention(
            q, k, jnp.eye(M)[None, None].repeat(B, 0).repeat(H, 1),
            scale=scale, bias=bias[None], mask=mask)
        pd = jnp.where(keep, probs / (1.0 - rate), 0.0)
        return jnp.einsum("bhnm,bhmd->bhnd", pd, v)

    np.testing.assert_allclose(np.asarray(run(q, k, v, slopes2)),
                               np.asarray(ref(q, k, v, slopes2)), atol=5e-3)
    gf = jax.grad(lambda *a: jnp.sum(run(*a) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, slopes2)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                  argnums=(0, 1, 2, 3))(q, k, v, slopes2)
    for name, a, b in zip(("dq", "dk", "dv", "dslopes"), gf, gr):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel < 2e-2, f"{name} rel err {rel}"
