"""v3 engine property tests (CPU interpret mode, small tile geometry).

Oracle strategy per SURVEY.md §4: numpy sort on uniform / Zipfian /
duplicate-heavy / sorted / reverse / all-equal inputs, plus the
payload-integrity trick (rids == stable permutation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops.engine_v3 import sort_v3, make_plan

# tiny geometry so interpret-mode runs in seconds (sort_rows=32 compiles
# ~3x faster than 64 on XLA CPU; the persistent cache in conftest makes
# repeat runs instant)
CFG = SortConfig(interpret=True, v3_sort_rows=32, v3_rmax=8,
                 v3_cap_rows=32)
N = 70_000


def _run(x, rids=None):
    k, v = sort_v3(jnp.asarray(x),
                   jnp.asarray(rids) if rids is not None else None, CFG)
    out = np.asarray(k)
    vout = np.asarray(v) if v is not None else None
    return out, vout


@pytest.mark.parametrize("dist", [
    "uniform", "zipf", "dup8", "sorted", "reverse", "allequal", "maxheavy",
    "rowcorr",
])
def test_keys_only_distributions(dist):
    rng = np.random.default_rng(hash(dist) % 2**32)
    if dist == "uniform":
        x = rng.integers(0, 2**32, N, dtype=np.uint32)
    elif dist == "zipf":
        x = rng.zipf(1.3, N).astype(np.uint32)
    elif dist == "dup8":
        x = rng.integers(0, 8, N, dtype=np.uint32)
    elif dist == "sorted":
        x = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))
    elif dist == "reverse":
        x = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))[::-1].copy()
    elif dist == "allequal":
        x = np.full(N, 0xCAFEBABE, np.uint32)
    elif dist == "maxheavy":  # 30% of keys are the maximum value
        x = np.where(rng.random(N) < 0.3, 0xFFFFFFFF,
                     rng.integers(0, 2**32, N, dtype=np.uint32))
        x = x.astype(np.uint32)
    else:  # rowcorr: neighboring keys correlated (sequential generator);
        # whole-row sampling misestimated skew here and overflowed caps
        # on hardware — must survive element-granular planning
        x = ((np.arange(N, 0, -1, dtype=np.uint64) % 997)
             .astype(np.uint32) * np.uint32(44257))
    out, _ = _run(x)
    assert np.array_equal(out, np.sort(x)), dist


def test_pairs_stable():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 500, N, dtype=np.uint32)   # heavy duplicates
    r = np.arange(N, dtype=np.uint32)
    out, vout = _run(x, r)
    order = np.argsort(x, kind="stable")
    assert np.array_equal(out, x[order])
    assert np.array_equal(vout, order.astype(np.uint32))


def test_small_input_fallback():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    out, _ = _run(x)
    assert np.array_equal(out, np.sort(x))


def test_plan_shapes_quantized():
    """Plans for nearby n / distributions share static pipeline shapes
    (compile-cache stability)."""
    rng = np.random.default_rng(0)
    cfg = SortConfig(v3_sort_rows=64, v3_rmax=8, v3_cap_rows=64)
    sigs = set()
    for seed in range(3):
        x = np.sort(np.random.default_rng(seed).integers(
            0, 2**32, 8192, dtype=np.uint32).astype(np.uint64))
        picks = x[np.linspace(0, 8191, 64, dtype=int)].astype(np.uint32)
        left = np.searchsorted(x, picks.astype(np.uint64)).astype(np.int32)
        right = np.searchsorted(
            x, picks.astype(np.uint64), side="right"
        ).astype(np.int32)
        stats = np.stack([picks.view(np.int32), left, right])
        plan = make_plan(200_000, stats, 8192, False, cfg)
        sigs.add((plan.arena1_rows, plan.arena2_rows,
                  plan.l2_tiles.shape[0], len(plan.term_child)))
    assert len(sigs) == 1, sigs
