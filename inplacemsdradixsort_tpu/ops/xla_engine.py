"""XLA-native sort engine — the portable fallback path.

Used on CPU, in tests, and as the correctness baseline the Pallas engine is
benchmarked against.  Key+payload sorting mirrors the reference's
(keys, rids) contract (reference: /root/reference/include/msb_64.h:37-40).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sort_keys(keys: jax.Array) -> jax.Array:
    return jnp.sort(keys)


def sort_pairs(
    keys: jax.Array, rids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Stable key+payload sort (lax.sort is stable with is_stable=True)."""
    k, r = jax.lax.sort((keys, rids), num_keys=1, is_stable=True)
    return k, r


def argsort_u32(keys: jax.Array) -> jax.Array:
    """Stable sorting permutation as uint32 row ids."""
    idx = jnp.arange(keys.shape[0], dtype=jnp.uint32)
    _, perm = sort_pairs(keys, idx)
    return perm
