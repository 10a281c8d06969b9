"""Seeding (reference ``_seed_everything`` cfg_utils.py:337-351 /
``seed_everything`` XAI_Multimodality.py:243-252).

JAX is functionally pure: determinism comes from threading PRNG keys, so
this only seeds host-side numpy/python RNGs and returns the root key.
(The reference chooses ``cudnn.benchmark=True`` speed over determinism in
one copy and determinism in the other — here the same key always gives a
bitwise-identical trajectory, see tests/test_train.py determinism test.)
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int = 42) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
