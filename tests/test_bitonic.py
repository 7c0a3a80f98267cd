"""Bitonic network correctness (pure jnp, runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inplacemsdradixsort_tpu.ops import bitonic as bt


@pytest.mark.parametrize("rows", [1, 2, 8, 32])
def test_bitonic_sort_keys(rng, rows):
    x = rng.integers(-(1 << 31), 1 << 31, (rows, 128), dtype=np.int32)
    out, _ = jax.jit(bt.bitonic_sort)(jnp.asarray(x))
    assert np.array_equal(
        np.asarray(out).ravel(), np.sort(x.ravel())
    )


def test_bitonic_sort_pairs_stable(rng):
    keys = rng.integers(0, 8, (8, 128), dtype=np.int32)  # many duplicates
    vals = np.arange(8 * 128, dtype=np.int32).reshape(8, 128)
    k, v = jax.jit(bt.bitonic_sort)(jnp.asarray(keys), jnp.asarray(vals))
    k, v = np.asarray(k).ravel(), np.asarray(v).ravel()
    order = np.argsort(keys.ravel(), kind="stable")
    assert np.array_equal(k, keys.ravel()[order])
    assert np.array_equal(v, vals.ravel()[order])


def test_bitonic_merge(rng):
    a = np.sort(rng.integers(0, 1000, 512, dtype=np.int32))
    b = np.sort(rng.integers(0, 1000, 512, dtype=np.int32))
    # XOR-network merge expects the second half descending (bitonic input)
    x = np.concatenate([a, b[::-1]]).reshape(8, 128)
    out, _ = jax.jit(bt.bitonic_merge)(jnp.asarray(x))
    assert np.array_equal(
        np.asarray(out).ravel(), np.sort(np.concatenate([a, b]))
    )


def test_bias_roundtrip(rng):
    x = jnp.asarray(rng.integers(0, 1 << 32, 256, dtype=np.uint32))
    b = bt.bias_u32(x)
    assert b.dtype == jnp.int32
    # order preserved
    xs = np.asarray(x)
    assert np.array_equal(
        np.argsort(np.asarray(b), kind="stable"),
        np.argsort(xs, kind="stable"),
    )
    assert np.array_equal(np.asarray(bt.unbias_u32(b)), xs)
