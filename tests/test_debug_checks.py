"""debug_checks mode: the reference's ``#ifdef BG`` in-situ assert suite
(msb_64.c:474-495, 329-349, 2185-2197) as a runtime flag.

A clean run passes with the flag on; a deliberately corrupted plan fails
loudly with InvariantError instead of producing silent garbage (or, on
hardware, trapping the device)."""

import numpy as np
import pytest

import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4
from inplacemsdradixsort_tpu.ops.engine_v4 import (InvariantError,
                                                   sort_v4)

CFG = SortConfig(interpret=True, v3_sort_rows=32, v3_rmax=8,
                 v3_cap_rows=32, debug_checks=True)
N = 70_000


def test_clean_run_passes_with_checks_on():
    rng = np.random.default_rng(21)
    x = rng.integers(0, 2**32, N, dtype=np.uint32)
    out, _ = sort_v4(jnp.asarray(x), (), CFG)
    assert np.array_equal(np.asarray(out), np.sort(x))


def test_corrupt_plan_fails_loudly(monkeypatch):
    """Scramble the plan's L1 bounds into a non-monotone table: the
    classifier invariant (negative histogram counts) must trip before
    any corrupt output escapes."""
    real_make = engine_v4.make_plan_v4

    def bad_make(*args, **kw):
        plan = real_make(*args, **kw)
        b = plan.l1_bounds.copy()
        if len(b) >= 2:
            b[0], b[-2] = b[-2], b[0]       # break monotonicity
        plan.l1_bounds[:] = b
        return plan

    monkeypatch.setattr(engine_v4, "make_plan_v4", bad_make)
    rng = np.random.default_rng(22)
    x = rng.integers(0, 2**32, N, dtype=np.uint32)
    # the corrupted object is the HOST plan: pin the host-planner path
    import dataclasses
    cfg = dataclasses.replace(CFG, device_plan=False)
    with pytest.raises(InvariantError, match="histogram"):
        sort_v4(jnp.asarray(x), (), cfg)


def test_corrupt_destination_fails_loudly(monkeypatch):
    """Shift every run's destination 2 rows late (start table untouched):
    each child's recorded region now begins with stale arena rows —
    range purity must catch it (check_range_partition analog)."""
    real_tables = engine_v4._level_tables

    def bad_tables(h, keep, gap_rows):
        pads, rows_c, start, dst = real_tables(h, keep, gap_rows)
        dst = jnp.where(dst >= 0, dst + 2, dst)
        return pads, rows_c, start, dst

    monkeypatch.setattr(engine_v4, "_level_tables", bad_tables)
    # _level_tables is traced into the jitted pipeline: drop the compiled
    # version from the earlier clean run so the patched one takes effect
    engine_v4._pipeline_v4.clear_cache()
    rng = np.random.default_rng(23)
    x = rng.integers(0, 2**32, N, dtype=np.uint32)
    try:
        with pytest.raises(InvariantError):
            sort_v4(jnp.asarray(x), (), CFG)
    finally:
        # don't leak the poisoned trace to later same-shape tests
        engine_v4._pipeline_v4.clear_cache()
