import jax
import numpy as np
import pytest

from isp_tts_tpu.ops import mas_numpy, monotonic_alignment_search


def _random_lattice(B, M, T, seed=0):
    rng = np.random.RandomState(seed)
    # log-softmax-like values with a diagonal tendency (realistic alignments)
    logits = rng.randn(B, M, T).astype(np.float32)
    i = np.arange(M)[:, None] / M
    j = np.arange(T)[None, :] / T
    logits += -8.0 * (i - j) ** 2
    return logits


def _check_valid_path(opt, tl, ml):
    """A valid MAS path: rows < ml select exactly 1 token, monotone non-
    decreasing with steps in {0, 1}, starting at 0 and ending at tl - 1."""
    assert opt[ml:].sum() == 0
    rows = opt[:ml]
    assert (rows.sum(axis=1) == 1).all()
    path = rows.argmax(axis=1)
    steps = np.diff(path)
    assert ((steps == 0) | (steps == 1)).all()
    assert path[0] == 0 and path[-1] == tl - 1
    assert rows[:, tl:].sum() == 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mas_matches_oracle_full_lengths(seed):
    B, M, T = 3, 40, 12
    logits = _random_lattice(B, M, T, seed)
    tl = np.full(B, T, np.int32)
    ml = np.full(B, M, np.int32)
    ours = np.asarray(monotonic_alignment_search(logits, tl, ml))
    oracle = mas_numpy(logits, tl, ml)
    np.testing.assert_array_equal(ours, oracle)


def test_mas_ragged_lengths():
    B, M, T = 4, 50, 16
    logits = _random_lattice(B, M, T, seed=3)
    # NB: MAS requires mel_len >= text_len (each mel frame advances <= 1 token);
    # the data pipeline guarantees this invariant.
    tl = np.array([16, 9, 4, 12], np.int32)
    ml = np.array([50, 33, 21, 14], np.int32)
    ours = np.asarray(monotonic_alignment_search(logits, tl, ml))
    oracle = mas_numpy(logits, tl, ml)
    np.testing.assert_array_equal(ours, oracle)
    for b in range(B):
        _check_valid_path(ours[b], tl[b], ml[b])


def test_mas_durations_sum_to_mel_len():
    B, M, T = 2, 64, 20
    logits = _random_lattice(B, M, T, seed=4)
    tl = np.array([20, 11], np.int32)
    ml = np.array([64, 40], np.int32)
    opt = np.asarray(monotonic_alignment_search(logits, tl, ml))
    durations = opt.sum(axis=1)  # (B, T)
    np.testing.assert_array_equal(durations.sum(axis=1), ml)


def test_mas_jittable_and_stable_under_jit():
    B, M, T = 2, 30, 10
    logits = _random_lattice(B, M, T, seed=5)
    tl = np.full(B, T, np.int32)
    ml = np.full(B, M, np.int32)
    jitted = jax.jit(monotonic_alignment_search)
    np.testing.assert_array_equal(
        np.asarray(jitted(logits, tl, ml)),
        np.asarray(monotonic_alignment_search(logits, tl, ml)),
    )


def test_mas_pallas_interpret_matches_oracle():
    """Pallas kernel (interpret mode on CPU) vs the numpy oracle."""
    from isp_tts_tpu.ops.mas_pallas import monotonic_alignment_search_pallas

    B, M, T = 3, 40, 16
    logits = _random_lattice(B, M, T, seed=7)
    tl = np.array([16, 9, 13], np.int32)
    ml = np.array([40, 21, 33], np.int32)
    ours = np.asarray(monotonic_alignment_search_pallas(
        logits, tl, ml, interpret=True))
    oracle = mas_numpy(logits, tl, ml)
    np.testing.assert_array_equal(ours, oracle)


def test_mas_pallas_pathological_log_attn_stays_in_bounds():
    """Backtrack pointer clamp (advisor fix): log-attn so negative that the
    accumulated DP value at column 0 underflows past the NEG_INF sentinel
    must not walk the pointer below 0 / emit all-zero alignment rows."""
    from isp_tts_tpu.ops.mas_pallas import monotonic_alignment_search_pallas

    B, M, T = 2, 32, 8
    logits = np.full((B, M, T), -1e8, np.float32)
    # mild diagonal preference on top of the huge negative floor
    i = np.arange(M)[:, None] / M
    j = np.arange(T)[None, :] / T
    logits += -1e6 * (i - j) ** 2
    tl = np.array([8, 5], np.int32)
    ml = np.array([32, 20], np.int32)
    ours = np.asarray(monotonic_alignment_search_pallas(
        logits, tl, ml, interpret=True))
    for b in range(B):
        _check_valid_path(ours[b], tl[b], ml[b])
