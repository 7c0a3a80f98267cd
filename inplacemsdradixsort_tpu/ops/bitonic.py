"""Bitonic sorting network over a VMEM-resident (rows, 128) block.

This is the TPU replacement for the reference's small-input finishers
(``insertsort`` / ``combsort``, /root/reference/src/msb_64.c:126-149,
980-1005) and, at tile granularity, for the in-cache permutation passes
(``partition_ip``, msb_64.c:740-770): a data-independent compare-exchange
network whose partner access pattern is static lane/row rotations — exactly
what the VPU vectorizes.  Elements are ordered by the flattened C-order index
``i = row*128 + lane``; the network sorts ascending in that order.

Keys are compared as int32 (callers bias uint32 keys by XOR 0x80000000, the
same trick the reference uses for signed SIMD compares, msb_64.c:248-251).
Optional value arrays are permuted along; ties break on the value, which
makes the network stable when values are original indices.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
LANE_BITS = 7


def _partner(x: jax.Array, k: int) -> jax.Array:
    """Value at flat index ``i ^ (1 << k)`` for every position i."""
    if k < LANE_BITS:
        d = 1 << k
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(
            (lane & d) != 0,
            jnp.roll(x, d, axis=1),
            jnp.roll(x, -d, axis=1),
        )
    d = 1 << (k - LANE_BITS)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(
        (row & d) != 0,
        jnp.roll(x, d, axis=0),
        jnp.roll(x, -d, axis=0),
    )


def _flat_bit(shape, k: int) -> jax.Array:
    """Bit k of the flat index, as a bool (rows, lanes) array."""
    if k < LANE_BITS:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane & (1 << k)) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (1 << (k - LANE_BITS))) != 0


def bitonic_sort(
    key: jax.Array, val: Optional[jax.Array] = None
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Sort a (rows, 128) int32 block ascending in flat C-order.

    rows must be a power of two (or 1).  Returns (key, val) sorted.
    """
    rows, lanes = key.shape
    assert lanes == LANES, key.shape
    total = rows * lanes
    logn = int(math.log2(total))
    assert (1 << logn) == total, "block size must be a power of two"

    for j in range(1, logn + 1):
        asc = (
            jnp.zeros(key.shape, jnp.bool_)
            if j == logn
            else _flat_bit(key.shape, j)
        )  # False => ascending block
        for k in range(j - 1, -1, -1):
            pk = _partner(key, k)
            upper = _flat_bit(key.shape, k)  # am I the upper index of pair
            take_min = upper == asc
            if val is None:
                less = key < pk
            else:
                pv = _partner(val, k)
                less = (key < pk) | ((key == pk) & (val < pv))
            keep_self = less == take_min
            key = jnp.where(keep_self, key, pk)
            if val is not None:
                val = jnp.where(keep_self, val, pv)
    return key, val


def bitonic_merge(
    key: jax.Array, val: Optional[jax.Array] = None
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Merge step only: input is two sorted halves (second half reversed
    convention not required — uses the XOR network's final group)."""
    rows, lanes = key.shape
    total = rows * lanes
    logn = int(math.log2(total))
    for k in range(logn - 1, -1, -1):
        pk = _partner(key, k)
        upper = _flat_bit(key.shape, k)
        if val is None:
            less = key < pk
        else:
            pv = _partner(val, k)
            less = (key < pk) | ((key == pk) & (val < pv))
        keep_self = less == (upper == False)  # noqa: E712 — ascending merge
        key = jnp.where(keep_self, key, pk)
        if val is not None:
            val = jnp.where(keep_self, val, pv)
    return key, val


# ------------------------------------------------------------------ helpers

BIAS = np.int32(-0x80000000)


def bias_u32(x: jax.Array) -> jax.Array:
    """uint32 -> order-preserving int32 (msb_64.c:248-251 trick)."""
    return jax.lax.bitcast_convert_type(
        x ^ np.uint32(0x80000000), jnp.int32
    )


def unbias_u32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint32) ^ np.uint32(
        0x80000000
    )
