"""Deep-key pass planning (ops/deep.py): recursion into lower planes.

The reference sorts adversarial deep keys through the engine at any
depth by planning radix passes over the full remaining key width
(``schedule_passes`` msb_64.c:1334-1400 + the ``local_radixsort``
recursion :1007-1035).  These tests pin the TPU analog: no whole-array
XLA fallback (FALLBACK_STATS["overflow"] == 0) on the input classes
that exhaust plane-0 refinement (VERDICT r4 item 5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4 as e4
from inplacemsdradixsort_tpu.ops import deep

TINY = dict(interpret=True, min_engine_n=1, v3_sort_rows=64, v3_rmax=8,
            v3_cap_rows=64)


def _u64_few_hi(rng, n, nhi=8):
    his = rng.choice(
        np.array([3, 9, 17, 40, 1000, 2**31, 2**32 - 5, 77],
                 dtype=np.uint64)[:nhi], n)
    hi = his.astype(np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    return hi, lo


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_deep_sort_u64_few_distinct_hi(rng):
    """u64 with 8 distinct hi words: every plane-0 bucket is a single
    heavy value -> all buckets rotate to the lo plane."""
    n = 1 << 14
    hi, lo = _u64_few_hi(rng, n)
    e4.reset_fallback_stats()
    ok, ov = deep.deep_sort(jnp.asarray(hi), (jnp.asarray(lo),),
                            SortConfig(**TINY))
    got = (np.asarray(ok).astype(np.uint64) << 32) | np.asarray(ov[0])
    ref = np.sort((hi.astype(np.uint64) << 32) | lo)
    np.testing.assert_array_equal(got, ref)
    assert e4.FALLBACK_STATS["overflow"] == 0
    assert e4.FALLBACK_STATS["deep"] == 1


def test_deep_sort_heavy_pairs(rng):
    """Heavy key value in pairs mode (payload must ride): the heavy
    bucket rotates to the rid plane, the tail sorts normally."""
    n = 1 << 14
    keys = np.concatenate([
        np.full(n // 2, 7, np.uint32),
        rng.integers(0, 2**32, n - n // 2, dtype=np.uint32),
    ])
    rng.shuffle(keys)
    rids = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    order = np.lexsort((rids, keys))
    e4.reset_fallback_stats()
    ok, ov = deep.deep_sort(jnp.asarray(keys), (jnp.asarray(rids),),
                            SortConfig(**TINY))
    np.testing.assert_array_equal(np.asarray(ok), keys[order])
    np.testing.assert_array_equal(np.asarray(ov[0]), rids[order])
    assert e4.FALLBACK_STATS["overflow"] == 0


def test_deep_sort_three_planes(rng):
    """u64 keys + rid payload (3 planes): heavy (hi, lo) pairs keep
    rotating — two plane drops end at a keys-only rid sort."""
    n = 1 << 13
    hi = np.full(n, 42, np.uint32)          # every hi equal
    lo = np.concatenate([
        np.full(n // 2, 5, np.uint32),      # heavy lo under the hi
        rng.integers(0, 2**32, n - n // 2, dtype=np.uint32),
    ])
    rng.shuffle(lo)
    rid = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    order = np.lexsort((rid, lo, hi))
    e4.reset_fallback_stats()
    ok, ov = deep.deep_sort(
        jnp.asarray(hi), (jnp.asarray(lo), jnp.asarray(rid)),
        SortConfig(**TINY))
    np.testing.assert_array_equal(np.asarray(ok), hi[order])
    np.testing.assert_array_equal(np.asarray(ov[0]), lo[order])
    np.testing.assert_array_equal(np.asarray(ov[1]), rid[order])
    assert e4.FALLBACK_STATS["overflow"] == 0


def test_ladder_reaches_deep_not_xla(rng):
    """The full v4 retry ladder on adversarial u64 ends in the deep tier
    (overflow counter stays 0), and the result is exact.  cap_rows=8:
    each single-hi bucket (n/8 = 2048 elems) must exceed the XL rescue
    capacity (2*8*128 = 2048 is the boundary; the drain pads push it
    over) so no plane-0 refinement can ever fit it."""
    n = 1 << 14
    hi, lo = _u64_few_hi(rng, n)
    e4.reset_fallback_stats()
    cfg = dict(TINY)
    cfg["v3_cap_rows"] = 8
    ok, ov = e4.sort_v4(jnp.asarray(hi), (jnp.asarray(lo),),
                        SortConfig(**cfg))
    got = (np.asarray(ok).astype(np.uint64) << 32) | np.asarray(ov[0])
    ref = np.sort((hi.astype(np.uint64) << 32) | lo)
    np.testing.assert_array_equal(got, ref)
    assert e4.FALLBACK_STATS["overflow"] == 0
    assert e4.FALLBACK_STATS["deep"] >= 1
