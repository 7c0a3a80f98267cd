"""Differential stage profile of the v4 pipeline on the real chip.

Times the fused pipeline stopped after L1, after L2, and in full; the
differences are the true fused-stage costs (unlike profile_v4.py, which
times isolated jits).  Also times the L1 route with the in-VMEM sort
replaced by identity (``nosort``) to split sort vs DMA/mask overhead.

Usage:  python benchmarks/profile_v4_stages.py [logn]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4 as e4
from inplacemsdradixsort_tpu.ops.kernels_v4 import LANES, hist_level, route_level

RTT_MS = 26.0


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[-2:]))


def timeit(f, iters=3):
    r = f()
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    _sync(r)
    ms = (time.perf_counter() - t0) / iters * 1e3 - RTT_MS / iters
    return max(ms, 0.0), r


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    n = 1 << logn
    cfg = SortConfig()
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    _sync(keys)
    import functools as _ft
    global print
    print = _ft.partial(print, flush=True)
    print(f"stage profile v4 2^{logn} on {jax.devices()[0]}")

    with jax.enable_x64(False):
        ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
        ssz = min(ssz, n)
        _, nbw = e4._geometry(n, 1, cfg)
        stats = np.asarray(jax.device_get(e4._sample_stats(
            keys, ssz=ssz, nbq=4 * nbw, salt=0)))
        rows = max(n // LANES, 1)
        neff = max(1, min(ssz, rows))
        S = min(n, ssz) if (rows <= 1 or neff >= rows) else neff
        plan = e4.make_plan_v4(n, stats, S, 1, cfg)
        packed, layout = e4._pack_tables_v4(plan)
        packed_d = jax.device_put(jnp.asarray(packed))

        kw = dict(
            layout=layout, n=n, nplanes=1, nlex=0,
            rmax=plan.rmax, pitch=plan.pitch, cap_rows=plan.cap_rows,
            ntiles1=plan.ntiles1, t2max=plan.t2max,
            arena1_rows=plan.arena1_rows, arena2_rows=plan.arena2_rows,
            out_rows=plan.out_rows, two_level=plan.two_level,
            interpret=False,
        )

        def run(stage):
            return e4._pipeline_v4((keys,), packed_d, stage=stage, **kw)[0]

        t1, _ = timeit(lambda: run(1))
        print(f"to end of L1 (hist+glue+route): {t1:8.1f} ms")
        t2, _ = timeit(lambda: run(2))
        print(f"to end of L2:                   {t2:8.1f} ms   "
              f"L2 = {t2 - t1:.1f} ms")
        t3, _ = timeit(lambda: run(0))
        print(f"full pipeline:                  {t3:8.1f} ms   "
              f"terminal = {t3 - t2:.1f} ms")

        # ---- L1 route alone, sort vs nosort
        rmax, pitch, ntiles1 = plan.rmax, plan.pitch, plan.ntiles1
        rows_in = ntiles1 * pitch
        pad = rows_in * LANES - n

        @jax.jit
        def prep(keys):
            k = jax.lax.bitcast_convert_type(keys, jnp.int32)
            return jnp.concatenate(
                [k, jnp.zeros((pad,), jnp.int32)]).reshape(rows_in, LANES)
        k2 = prep(keys)
        l1_meta_d = jax.device_put(jnp.asarray(plan.l1_meta))
        l1_bounds_d = jax.device_put(jnp.asarray(plan.l1_bounds))

        @jax.jit
        def h1(k2, meta, bounds):
            return hist_level(k2, meta, bounds, ntiles1, pitch, rmax,
                              bias_input=True)
        hist1 = h1(k2, l1_meta_d, l1_bounds_d)

        tb = e4._unpack(packed_d, layout)

        @jax.jit
        def tables1(hist1, packed):
            tb = e4._unpack(packed, layout)
            from inplacemsdradixsort_tpu.ops.kernels_v4 import CHUNK_ROWS
            pads1, rows_c1, start1, dst1 = e4._level_tables(
                hist1, 1 - tb["drop1"], CHUNK_ROWS)
            tt = jnp.arange(ntiles1, dtype=jnp.int32)[:, None]
            jsink = tt % jnp.maximum(tb["group_len"], 1)[None, :]
            padv1 = tb["l2_bounds"][jnp.arange(rmax)[None, :], jsink]
            return pads1, rows_c1, start1, dst1, padv1
        pads1, rows_c1, start1, dst1, padv1 = tables1(hist1, packed_d)

        for nosort in (False, True):
            @jax.jit
            def r1(k2, meta, hist1, dst1, padv1):
                return route_level((k2,), meta, hist1, dst1, padv1,
                                   plan.arena1_rows, ntiles1, pitch, rmax,
                                   nlex=0, bias_input=True, nosort=nosort)
            t_r, _ = timeit(
                lambda: r1(k2, l1_meta_d, hist1, dst1, padv1))
            tag = "nosort" if nosort else "sort  "
            print(f"L1 route ({tag}):              {t_r:8.1f} ms  "
                  f"({n/(t_r/1e3)/1e9:.3f} Gkeys/s)")


if __name__ == "__main__":
    main()
