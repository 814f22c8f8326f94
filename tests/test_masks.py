import jax.numpy as jnp
import numpy as np

from isp_tts_tpu.utils import (
    get_float_mask_from_lengths,
    get_mask_3d,
    get_mask_from_lengths,
    masked_mean,
)


def test_bool_mask():
    m = get_mask_from_lengths(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[True, True, False, False, False], [True, True, True, True, False]],
    )


def test_float_mask_fractional():
    m = get_float_mask_from_lengths(jnp.array([2.5]), 4)
    np.testing.assert_allclose(np.asarray(m), [[1.0, 1.0, 0.5, 0.0]])


def test_mask_3d():
    m = get_mask_3d(jnp.array([2]), jnp.array([3]), 3, 4)
    assert m.shape == (1, 3, 4)
    assert bool(m[0, 1, 2]) and not bool(m[0, 2, 0]) and not bool(m[0, 0, 3])


def test_masked_mean():
    x = jnp.array([[1.0, 2.0, 100.0]])
    mask = jnp.array([[True, True, False]])
    np.testing.assert_allclose(float(masked_mean(x, mask)), 1.5)
