"""Pallas banded-CTC kernels vs the lax.scan oracle (interpret mode on CPU).

The scan implementation is itself tested against optax.ctc_loss
(test_acoustic_model.py), so agreement here chains to the generic CTC.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isp_tts_tpu.ops.ctc_pallas as cp
from isp_tts_tpu.models.acoustic.loss import _ordered_ctc_neg_logp


@pytest.fixture(autouse=True)
def _interpret():
    # small frame blocks keep the interpreter fast while still exercising
    # multi-block scratch persistence and the padded-tail path
    cp.INTERPRET = True
    cp.FRAME_BLOCK = 16
    yield
    cp.INTERPRET = False
    cp.FRAME_BLOCK = 64


def _random_problem(B, M, T, seed=0, infeasible_idx=()):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, M, T + 1).astype(np.float32)
    logprobs = jax.nn.log_softmax(jnp.asarray(logits), axis=2)
    text_lens = rng.randint(1, T + 1, size=B).astype(np.int32)
    mel_lens = rng.randint(T + 1, M + 1, size=B).astype(np.int32)
    for i in infeasible_idx:
        text_lens[i] = T
        mel_lens[i] = T // 2  # mel shorter than text: infeasible
    return logprobs, jnp.asarray(text_lens), jnp.asarray(mel_lens)


@pytest.mark.parametrize("B,M,T", [(8, 48, 16), (4, 40, 12)])
def test_forward_matches_scan(B, M, T):
    logprobs, text_lens, mel_lens = _random_problem(B, M, T)
    ref = _ordered_ctc_neg_logp(logprobs, text_lens, mel_lens)
    got = cp.ordered_ctc_neg_logp_pallas(logprobs, text_lens, mel_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_scan():
    B, M, T = 8, 48, 16
    logprobs, text_lens, mel_lens = _random_problem(B, M, T, seed=1)
    weights = jnp.asarray(np.random.RandomState(2).rand(B).astype(np.float32))

    def loss(fn, lp):
        per = fn(lp, text_lens, mel_lens)
        return jnp.sum(per * weights)

    g_ref = jax.grad(lambda lp: loss(_ordered_ctc_neg_logp, lp))(logprobs)
    g_pal = jax.grad(
        lambda lp: loss(cp.ordered_ctc_neg_logp_pallas, lp))(logprobs)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_infeasible_samples_zero_grad_through_loss_gate():
    """The loss-level gate (mel_len < text_len -> 0) must kill the gradient
    of infeasible samples without poisoning the feasible ones with NaN."""
    B, M, T = 6, 48, 16
    logprobs, text_lens, mel_lens = _random_problem(
        B, M, T, seed=3, infeasible_idx=(2,))

    def gated(fn, lp):
        per = fn(lp, text_lens, mel_lens)
        feasible = mel_lens >= text_lens
        per = jnp.where(feasible & jnp.isfinite(per), per, 0.0)
        return jnp.mean(per)

    v_ref = gated(_ordered_ctc_neg_logp, logprobs)
    v_pal = gated(cp.ordered_ctc_neg_logp_pallas, logprobs)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)

    g_ref = jax.grad(lambda lp: gated(_ordered_ctc_neg_logp, lp))(logprobs)
    g_pal = jax.grad(
        lambda lp: gated(cp.ordered_ctc_neg_logp_pallas, lp))(logprobs)
    assert np.isfinite(np.asarray(g_pal)).all()
    np.testing.assert_allclose(np.asarray(g_pal[2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_full_and_single_frame_lengths():
    """Edge lengths: mel_len == M (no invalid tail) and text_len == 1."""
    B, M, T = 4, 32, 8
    rng = np.random.RandomState(4)
    logprobs = jax.nn.log_softmax(
        jnp.asarray(rng.randn(B, M, T + 1).astype(np.float32)), axis=2)
    text_lens = jnp.asarray([1, T, 1, T], jnp.int32)
    mel_lens = jnp.asarray([M, M, T, M - 1], jnp.int32)
    ref = _ordered_ctc_neg_logp(logprobs, text_lens, mel_lens)
    got = cp.ordered_ctc_neg_logp_pallas(logprobs, text_lens, mel_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batch_blocked_grid_with_padding():
    """B > BATCH_BLOCK takes the batch-gridded path with a padded tail
    (the whole-batch variant OOMed scoped VMEM at B >= 64); fwd AND grads
    must match the scan, and padded rows must not leak into gradients."""
    old = cp.BATCH_BLOCK
    cp.BATCH_BLOCK = 4  # force several batch blocks + bpad (10 % 4 != 0)
    try:
        B, M, T = 10, 48, 16
        logprobs, text_lens, mel_lens = _random_problem(B, M, T, seed=5)
        ref = _ordered_ctc_neg_logp(logprobs, text_lens, mel_lens)
        got = cp.ordered_ctc_neg_logp_pallas(logprobs, text_lens, mel_lens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        w = jnp.asarray(np.random.RandomState(6).randn(B).astype(np.float32))

        def loss_p(lp):
            return jnp.sum(w * cp.ordered_ctc_neg_logp_pallas(
                lp, text_lens, mel_lens))

        def loss_s(lp):
            return jnp.sum(w * _ordered_ctc_neg_logp(lp, text_lens, mel_lens))

        gp = jax.grad(loss_p)(logprobs)
        gs = jax.grad(loss_s)(logprobs)
        assert gp.shape == logprobs.shape
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5)
    finally:
        cp.BATCH_BLOCK = old
