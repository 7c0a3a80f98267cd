"""Optimized bitonic sorting network over a VMEM-resident (rows, 128) block.

The v3 engine's core compute primitive — a leaner rewrite of ``bitonic.py``
tuned for the Mosaic/TPU lowering:

- lane-distance stages (d < 128) fetch the XOR partner with ONE
  ``take_along_axis`` lane shuffle (lowers to ``tpu.dynamic_gather`` with a
  static pattern) instead of two rotates + select;
- row-distance stages use two sublane rotates + a cached row-bit select;
- the flat-index iotas and per-merge-level direction masks are computed once
  per merge level, not per stage;
- keys-only mode uses native min/max (no comparison + dual select).

Plays the reference's in-cache sort roles (``partition_ip``/``insertsort``/
``combsort``, /root/reference/src/msb_64.c:740-770, 126-149, 980-1005): a
data-independent compare-exchange network is the TPU-native replacement for
data-dependent in-cache permutation, because the VPU has no scatter.

Element order is the flattened C-order index ``i = row*128 + lane``; sorts
ascending.  Keys/vals must be int32 in the sign-biased order-preserving
encoding of uint32 (``x ^ 0x80000000``, the reference's signed-SIMD-compare
trick, msb_64.c:248-251): Mosaic has no unsigned vector min/max, so the
network uses native int32 min/max on biased values.  Total element count
must be a power of two.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

LANES = 128
LANE_BITS = 7


def _lane_partner_idx(shape, k: int) -> jax.Array:
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    return lane ^ (1 << k)


def _row_bit(shape, b: int) -> jax.Array:
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (1 << b)) != 0


def _lane_bit(shape, b: int) -> jax.Array:
    lane = lax.broadcasted_iota(jnp.int32, shape, 1)
    return (lane & (1 << b)) != 0


def _flat_bit(shape, k: int) -> jax.Array:
    """Bit k of the flat C-order index as a bool array."""
    if k < LANE_BITS:
        return _lane_bit(shape, k)
    return _row_bit(shape, k - LANE_BITS)


def _partner(x: jax.Array, k: int, upper: jax.Array) -> jax.Array:
    """Value at flat index ``i ^ (1 << k)``.

    ``upper`` is the cached ``_flat_bit(shape, k)`` mask.
    """
    if k < LANE_BITS:
        idx = _lane_partner_idx(x.shape, k)
        return jnp.take_along_axis(x, idx, axis=1)
    d = 1 << (k - LANE_BITS)
    fwd = jnp.roll(x, -d, axis=0)   # partner for lower rows (bit unset)
    bwd = jnp.roll(x, d, axis=0)    # partner for upper rows
    return jnp.where(upper, bwd, fwd)


def _stage_keys(key: jax.Array, k: int, desc: jax.Array) -> jax.Array:
    """One compare-exchange stage; ``desc`` marks descending blocks."""
    upper = _flat_bit(key.shape, k)
    pk = _partner(key, k, upper)
    mn = jnp.minimum(key, pk)
    mx = jnp.maximum(key, pk)
    # slot takes the pair minimum iff (it is the upper index) == (its block
    # is descending)
    return jnp.where(upper == desc, mn, mx)


def _stage_pairs(key, val, k, desc):
    upper = _flat_bit(key.shape, k)
    pk = _partner(key, k, upper)
    pv = _partner(val, k, upper)
    less = (key < pk) | ((key == pk) & (val < pv))
    # I keep my own value iff (I hold the smaller) == (this slot takes min)
    keep = less == (upper == desc)
    return (
        jnp.where(keep, key, pk),
        jnp.where(keep, val, pv),
    )


def _stage_multi(planes, nlex, k, desc):
    """One compare-exchange stage over ``planes`` (tuple of equal-shape
    int32 arrays).  Planes [0, nlex] participate in the lexicographic
    comparison (plane 0 = the key, most significant first); the rest ride
    along as payload.

    When two partners tie on every compared plane, each slot must keep its
    OWN element: deciding by the comparison alone would make both slots
    resolve to the same source and duplicate/lose payload in the
    uncompared planes.
    """
    key = planes[0]
    upper = _flat_bit(key.shape, k)
    partners = tuple(_partner(p, k, upper) for p in planes)
    less = key < partners[0]
    eq = key == partners[0]
    for j in range(1, nlex + 1):
        less = less | (eq & (planes[j] < partners[j]))
        eq = eq & (planes[j] == partners[j])
    keep = eq | (less == (upper == desc))
    return tuple(
        jnp.where(keep, p, pp) for p, pp in zip(planes, partners)
    )


def net_sort(
    key: jax.Array, val: Optional[jax.Array] = None
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Sort a (rows, 128) block ascending in flat C-order.

    rows*128 must be a power of two.  With ``val``, sorts by
    (key, val) lexicographically (stable when val is the original index).
    """
    rows, lanes = key.shape
    assert lanes == LANES, key.shape
    total = rows * lanes
    logn = int(math.log2(total))
    assert (1 << logn) == total, "block size must be a power of two"

    for j in range(1, logn + 1):
        # descending-block mask for this merge level (last level: all asc).
        if j == logn:
            desc = jnp.zeros(key.shape, jnp.bool_)
        else:
            desc = _flat_bit(key.shape, j)
        for k in range(j - 1, -1, -1):
            if val is None:
                key = _stage_keys(key, k, desc)
            else:
                key, val = _stage_pairs(key, val, k, desc)
    return key, val


def net_sort_multi(
    planes: Tuple[jax.Array, ...], nlex: Optional[int] = None
) -> Tuple[jax.Array, ...]:
    """Sort (rows, 128) blocks ascending in flat C-order by the
    lexicographic order of ``planes[: nlex + 1]`` (plane 0 = most
    significant key word); remaining planes are carried as payload.

    ``nlex`` defaults to all planes — full lexicographic order, which is a
    stable key sort when the trailing plane is the original index, and a
    multiword (e.g. u64) sort when the planes are (hi, lo) words.
    All planes must be int32 in the sign-biased encoding.
    """
    key = planes[0]
    rows, lanes = key.shape
    assert lanes == LANES, key.shape
    total = rows * lanes
    logn = int(math.log2(total))
    assert (1 << logn) == total, "block size must be a power of two"
    if nlex is None:
        nlex = len(planes) - 1
    assert 0 <= nlex <= len(planes) - 1

    if len(planes) == 1:
        k, _ = net_sort(key)
        return (k,)
    if len(planes) == 2 and nlex == 1:
        k, v = net_sort(key, planes[1])
        return (k, v)

    for j in range(1, logn + 1):
        if j == logn:
            desc = jnp.zeros(key.shape, jnp.bool_)
        else:
            desc = _flat_bit(key.shape, j)
        for k in range(j - 1, -1, -1):
            planes = _stage_multi(planes, nlex, k, desc)
    return planes


def net_merge(
    key: jax.Array, val: Optional[jax.Array] = None
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Ascending bitonic merge of the whole block (input must be bitonic,
    e.g. an ascending half followed by a descending half)."""
    rows, lanes = key.shape
    total = rows * lanes
    logn = int(math.log2(total))
    zero = jnp.zeros(key.shape, jnp.bool_)
    for k in range(logn - 1, -1, -1):
        if val is None:
            key = _stage_keys(key, k, zero)
        else:
            key, val = _stage_pairs(key, val, k, zero)
    return key, val
