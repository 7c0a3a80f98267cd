"""End-to-end Pallas MSD engine tests (interpreter mode on CPU; set
RUN_TPU_TESTS=1 to compile on a real chip)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.models import distributions as dist

INTERP = os.environ.get("RUN_TPU_TESTS", "0") != "1"

CFG = SortConfig(
    tile_elems=1024,       # tiny tiles so multiple levels trigger at small n
    range_bits=3,
    engine="pallas",
    interpret=INTERP,
)


def _sort(keys, rids=None, cfg=CFG):
    res = rs.sort(jnp.asarray(keys), rids, config=cfg)
    return res


@pytest.mark.parametrize("n", [500, 4096, 30000])
def test_engine_uniform(rng, n):
    keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    res = _sort(keys)
    assert np.array_equal(np.asarray(res.keys), np.sort(keys))


@pytest.mark.parametrize("name", ["zipf075", "dup_heavy", "sorted",
                                  "reverse", "all_equal"])
def test_engine_distributions(name):
    keys = dist.make(name, jax.random.key(0), 20000, dtype=jnp.uint32)
    res = _sort(keys)
    assert np.array_equal(
        np.asarray(res.keys), np.sort(np.asarray(keys))
    )


def test_engine_max_keys(rng):
    # keys equal to 0xFFFFFFFF collide with the sentinel value; the engine
    # must still count and emit them all
    keys = rng.integers(0, 1 << 32, 9000, dtype=np.uint32)
    keys[rng.integers(0, 9000, 500)] = 0xFFFFFFFF
    res = _sort(keys)
    assert np.array_equal(np.asarray(res.keys), np.sort(keys))


def test_engine_pairs_stable(rng):
    keys = rng.integers(0, 64, 20000, dtype=np.uint32)  # heavy duplicates
    rids = np.arange(20000, dtype=np.uint32)
    res = _sort(keys, jnp.asarray(rids))
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(res.keys), keys[order])
    assert np.array_equal(np.asarray(res.rids), order.astype(np.uint32))


def test_engine_pairs_max_keys(rng):
    keys = rng.integers(0, 1 << 32, 5000, dtype=np.uint32)
    keys[:100] = 0xFFFFFFFF
    rids = np.arange(5000, dtype=np.uint32)
    res = _sort(keys, jnp.asarray(rids))
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(res.keys), keys[order])
    assert np.array_equal(np.asarray(res.rids), order.astype(np.uint32))
