"""Public API tests: sort/check/mamalloc against oracles on all the
reference-motivated input distributions (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.models import distributions as dist
from inplacemsdradixsort_tpu.utils.checking import (
    check_permutation,
    checksum,
)

DISTS = ["uniform", "zipf075", "zipf100", "dup_heavy", "sorted", "reverse",
         "all_equal"]


@pytest.mark.parametrize("name", DISTS)
def test_sort_keys_matches_numpy(name):
    keys = dist.make(name, jax.random.key(0), 4096, dtype=jnp.uint32)
    res = rs.sort(keys)
    assert np.array_equal(np.asarray(res.keys), np.sort(np.asarray(keys)))


def test_sort_u64():
    # true 64-bit keys (the reference's native type, msb_64.h:37) need x64
    with jax.enable_x64(True):
        keys = jnp.asarray(
            np.random.default_rng(1).integers(
                0, 1 << 64, 2000, dtype=np.uint64
            )
        )
        res = rs.sort(keys)
        assert res.keys.dtype == jnp.uint64
        assert np.array_equal(np.asarray(res.keys), np.sort(np.asarray(keys)))


def test_sort_pairs_permutation_and_stability():
    keys = dist.dup_heavy(jax.random.key(2), 3000)
    sk, perm = rs.sort_with_indices(keys)
    assert check_permutation(sk, perm, keys)
    # stability: equal keys keep ascending original indices
    sk_np, p_np = np.asarray(sk), np.asarray(perm)
    for v in np.unique(sk_np):
        idx = p_np[sk_np == v]
        assert np.all(np.diff(idx.astype(np.int64)) > 0)


def test_check_key_eq_rid_trick():
    # the reference's same=1 mode: rids initialized equal to keys
    # (msb_64.c:2461)
    keys = dist.uniform(jax.random.key(3), 1000)
    res = rs.sort(keys, keys.astype(jnp.uint32))
    cs = rs.check(res.keys, res.rids, same=True,
                  input_checksum=checksum(keys))
    assert cs == checksum(res.keys)


def test_check_rejects_unsorted():
    bad = jnp.asarray(np.array([3, 1, 2], dtype=np.uint32))
    with pytest.raises(AssertionError):
        rs.check(bad)


def test_check_cross_shard_boundaries():
    a = jnp.asarray(np.array([1, 5], dtype=np.uint32))
    b = jnp.asarray(np.array([4, 9], dtype=np.uint32))
    with pytest.raises(AssertionError):
        rs.check([a, b])
    rs.check([a, jnp.asarray(np.array([5, 9], dtype=np.uint32))])


def test_mamalloc_padding():
    buf = rs.mamalloc(1000, fudge=1.125)
    assert buf.shape[0] >= 1125
    assert buf.shape[0] % 128 == 0


def test_timing_report_rows():
    keys = dist.uniform(jax.random.key(4), 512)
    res = rs.sort(keys, timing=True)
    labels = [l for l, _ in res.times]
    assert labels == [
        "sample", "part_first", "part_blocks", "combine", "compact",
        "balance", "swap_online", "swap_offline", "inject", "local_sort",
    ]




@pytest.mark.parametrize("dtype", ["int32", "float32", "int64"])
def test_key_dtype_families(dtype):
    """i32/f32/i64 keys through the order-preserving codecs (the
    reference suite's 32/64-bit type families, Makefile:8-24)."""
    rng = np.random.default_rng(17)
    if dtype == "int32":
        x = rng.integers(-2**31, 2**31, 4096).astype(np.int32)
    elif dtype == "float32":
        x = rng.standard_normal(4096).astype(np.float32)
        x[:7] = [0.0, -0.0, np.inf, -np.inf, 1e-44, -1e-44, 3.5]
    else:
        x = rng.integers(-2**63, 2**63, 4096).astype(np.int64)
    cfg = SortConfig(engine="v4", interpret=True)
    with jax.enable_x64(dtype == "int64"):
        res = rs.sort(jnp.asarray(x), config=cfg)
        got = np.asarray(jax.device_get(res.keys))
    assert got.dtype == x.dtype
    assert np.array_equal(got, np.sort(x))
