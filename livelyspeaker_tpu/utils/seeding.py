"""Seeding discipline (reference: scripts/mdm_utils/fixseed.py:6-10 +
module-level seeds in the loaders, ted_loader.py:12-15).

JAX randomness is explicit-key, so the only global state to pin is numpy /
python (data shuffling, eval speaker choice).  ``fixseed`` returns the master
``jax.random`` key everything else should be split from.
"""

from __future__ import annotations

import random

import numpy as np


def fixseed(seed: int = 233):
    """Pin host-side RNGs and return the master jax PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
