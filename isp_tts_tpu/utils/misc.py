"""Small host-side utilities.

Parity with reference `tts/utils/functions.py` host-side helpers.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed python + numpy RNGs (JAX randomness is explicit via PRNG keys).

    Parity: reference ``set_random_seed`` (tts/utils/functions.py:21-25); the
    torch seeding has no analogue — JAX keys are threaded explicitly.
    """
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    """Total number of scalar parameters in a pytree.

    Parity: reference ``count_parameters`` (tts/utils/functions.py:15-18).
    """
    leaves = jax.tree_util.tree_leaves(params)
    return int(sum(np.prod(l.shape) if hasattr(l, "shape") else 1 for l in leaves))


def prob2bool(prob: float, rng: random.Random | None = None) -> bool:
    """Bernoulli sample on the host (data-pipeline randomness).

    Parity: reference ``prob2bool`` (tts/utils/functions.py:11-12).
    """
    r = rng.random() if rng is not None else random.random()
    return r < prob
