"""Sampling and splitter (delimiter) selection — the partition planner.

Re-creates the reference's sampling + splitter pipeline (reference:
/root/reference/src/msb_64.c):

- uniform sampling via ``mulhi`` index scaling        (msb_64.c:1511-1521)
- sorted-sample quantile splitters with duplicate-aware
  shifting                                            (msb_64.c:1304-1322)
- the hybrid delimiter set: sample quantiles merged with
  radix-equidistant delimiters, then sorted            (msb_64.c:1545-1564)
- per-range destination map (``numa_dest`` analog)     (msb_64.c:1596-1607)

Range semantics match the reference classifier: key k belongs to range p iff
``delimiter[p-1] < k <= delimiter[p]``, with ``delimiter[R-1]`` the inclusive
maximum sentinel (~0).  Classification is ``searchsorted(delims, k, 'left')``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def draw_sample(key: jax.Array, keys: jax.Array, sample_size: int):
    """Uniform sample of ``sample_size`` keys (with replacement).

    The reference draws ``sample_size/threads`` keys per thread using
    ``mulhi(rand64, chunk_size)`` index scaling (msb_64.c:1511-1521); here one
    vectorized draw over the whole array is equivalent.
    """
    n = keys.shape[0]
    idx = jax.random.randint(key, (sample_size,), 0, n, dtype=jnp.int32)
    return jnp.take(keys, idx)


def extract_delimiters(sorted_sample: jax.Array, parts: int) -> jax.Array:
    """``parts`` equidistant-percentile splitters from a sorted sample.

    Vectorized analog of reference ``extract_delimiters``
    (msb_64.c:1304-1322): picks values at ``percentile*(i+1) - eps`` and, when
    the splitter value sits inside a run of duplicates with more duplicates
    after the pick than before, decrements the splitter by one so that the
    duplicate mass lands in the *following* range (load-balances skew).
    """
    s = sorted_sample
    n = s.shape[0]
    percentile = n / (parts + 1)
    idx = jnp.clip(
        (percentile * (jnp.arange(1, parts + 1)) - 0.001).astype(jnp.int32),
        0,
        n - 1,
    )
    vals = jnp.take(s, idx)
    # run extents around each pick: first and one-past-last index of the
    # value's run inside the sorted sample
    start = jnp.searchsorted(s, vals, side="left").astype(jnp.int32)
    end = jnp.searchsorted(s, vals, side="right").astype(jnp.int32)
    before = idx - start          # duplicates at or before the pick
    after = end - idx             # duplicates strictly after (incl. pick)
    shift = (before < after) & (vals != 0)
    return jnp.where(shift, vals - 1, vals).astype(s.dtype)


def radix_delimiters(parts: int, key_bits: int, dtype=jnp.uint32):
    """Radix-equidistant delimiters ``((p+1) << shift) - 1``.

    The reference merges 64 such delimiters on the top 6 bits
    (msb_64.c:1559-1563) so every final range has a constant top-bit prefix.
    """
    shift = key_bits - int(np.log2(parts))
    p = np.arange(1, parts + 1, dtype=np.uint64)
    vals = (p << np.uint64(shift)) - np.uint64(1)
    if dtype == jnp.uint32:
        return jnp.asarray(vals.astype(np.uint32))
    return jnp.asarray(vals.astype(np.uint64))


def hybrid_delimiters(
    sorted_sample: jax.Array,
    num_ranges: int,
    key_bits: int,
    use_sample: bool = True,
) -> jax.Array:
    """The final ``num_ranges`` delimiter set.

    Mirrors msb_64.c:1545-1564: half the delimiters are sample quantiles
    (skew balance), half are radix-equidistant (bounded range width); merged
    and sorted, with the maximum key value as the last (inclusive) sentinel.
    """
    dtype = sorted_sample.dtype
    maxval = (
        np.uint32(0xFFFFFFFF) if dtype == jnp.uint32
        else np.uint64(0xFFFFFFFFFFFFFFFF)
    )
    if use_sample:
        # 63 quantiles + the ~0 sentinel from the sample side, 64 radix
        # delimiters from the radix side — exactly the reference's 64+64
        # layout (msb_64.c:1545-1564 with extract_delimiters's sentinel).
        half = num_ranges // 2
        samp = jnp.concatenate([
            extract_delimiters(sorted_sample, half - 1),
            jnp.array([maxval], dtype=dtype),
        ])
        rad = radix_delimiters(half, key_bits, dtype)
        merged = jnp.sort(jnp.concatenate([samp, rad]))
    else:
        merged = radix_delimiters(num_ranges, key_bits, dtype)
    return merged.at[-1].set(maxval)


def classify(keys: jax.Array, delimiters: jax.Array) -> jax.Array:
    """Range id per key: first p with key <= delimiter[p]."""
    return jnp.searchsorted(delimiters, keys, side="left").astype(jnp.int32)


def shard_delimiters(
    sorted_sample: jax.Array, num_shards: int
) -> jax.Array:
    """Per-shard boundary splitters (the ``numa_delimiter`` analog).

    The reference takes every (64/numa)-th sample splitter as the NUMA-node
    boundary (msb_64.c:1555-1557); here: num_shards-1 equal-depth splitters.
    """
    return extract_delimiters(sorted_sample, num_shards - 1)


def destination_map(
    delimiters: jax.Array, shard_bounds: jax.Array
) -> jax.Array:
    """Owning shard of each range (``numa_dest`` analog, msb_64.c:1596-1607).

    Range p (upper bound delimiters[p]) goes to the shard whose boundary
    first covers it.
    """
    return jnp.searchsorted(
        shard_bounds, delimiters, side="left"
    ).astype(jnp.int32)
