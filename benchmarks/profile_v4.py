"""Phase-level profile of the v4 engine on the real chip.

Times each stage of the pipeline in isolation (separate jits) plus the
fused end-to-end path.  Sync is via ``device_get`` of a 2-element tail
(block_until_ready is a no-op on the tunneled backend); every number has
~RTT_MS of tunnel round-trip subtracted.

Usage:  python benchmarks/profile_v4.py [logn]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4 as e4
from inplacemsdradixsort_tpu.ops.kernels_v4 import (
    LANES, CHUNK_ROWS, hist_level, route_level, terminal_write)

RTT_MS = 26.0


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[-2:]))


def timeit(f, iters=5):
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
    print(f"profile v4 2^{logn} on {jax.devices()[0]}")

    with jax.enable_x64(False):
        # ---- end to end
        t, _ = timeit(lambda: e4.sort_v4(keys, (), cfg)[0], iters=3)
        print(f"end-to-end sort_v4:        {t:8.1f} ms  "
              f"({n/(t/1e3)/1e9:.3f} Gkeys/s)")

        # ---- sample+plan
        ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
        ssz = min(ssz, n)
        _, nbw = e4._geometry(n, 1, cfg)

        def stats_fn():
            return np.asarray(jax.device_get(e4._sample_stats(
                keys, ssz=ssz, nbq=4 * nbw, salt=0)))
        t_plan, stats = timeit(stats_fn, iters=3)
        rows = max(n // LANES, 1)
        neff = max(1, min(ssz, rows))
        S = min(n, ssz) if (rows <= 1 or neff >= rows) else neff
        plan = e4.make_plan_v4(n, stats, S, 1, cfg)
        t0 = time.perf_counter()
        e4.make_plan_v4(n, stats, S, 1, cfg)
        t_host = (time.perf_counter() - t0) * 1e3
        print(f"sample stats (dev+fetch):  {t_plan:8.1f} ms")
        print(f"make_plan_v4 (host):       {t_host:8.1f} ms")
        print(f"geometry: rmax={plan.rmax} pitch={plan.pitch} "
              f"ntiles1={plan.ntiles1} t2max={plan.t2max} "
              f"nb_total={plan.nb_total} cap_rows={plan.cap_rows} "
              f"two_level={plan.two_level} prefix_bits={plan.prefix_bits} "
              f"arena1={plan.arena1_rows} arena2={plan.arena2_rows}")

        packed, layout = e4._pack_tables_v4(plan)
        packed_d = jax.device_put(jnp.asarray(packed))
        rmax, pitch, ntiles1 = plan.rmax, plan.pitch, plan.ntiles1

        rows_in = ntiles1 * pitch
        pad = rows_in * LANES - n

        @jax.jit
        def prep(keys):
            k = jax.lax.bitcast_convert_type(keys, jnp.int32)
            return jnp.concatenate(
                [k, jnp.zeros((pad,), jnp.int32)]).reshape(rows_in, LANES)
        t_prep, k2 = timeit(lambda: prep(keys), iters=3)
        print(f"input reshape+pad copy:    {t_prep:8.1f} ms")

        tb = e4._unpack(packed_d, layout)
        l1_meta_d = jax.device_put(jnp.asarray(plan.l1_meta))
        l1_bounds_d = jax.device_put(jnp.asarray(plan.l1_bounds))

        @jax.jit
        def h1(k2, meta, bounds):
            return hist_level(k2, meta, bounds, ntiles1, pitch, rmax,
                              bias_input=True)
        t_h1, hist1 = timeit(lambda: h1(k2, l1_meta_d, l1_bounds_d),
                             iters=3)
        print(f"L1 hist_level:             {t_h1:8.1f} ms  "
              f"({n/(t_h1/1e3)/1e9:.3f} Gkeys/s)")

        @jax.jit
        def tables1(hist1, packed):
            tb = e4._unpack(packed, layout)
            pads1, rows_c1, start1, dst1 = e4._level_tables(
                hist1, 1 - tb["drop1"], CHUNK_ROWS)
            tt = jnp.arange(ntiles1, dtype=jnp.int32)[:, None]
            jsink = tt % jnp.maximum(tb["group_len"], 1)[None, :]
            padv1 = tb["l2_bounds"][jnp.arange(rmax)[None, :], jsink]
            return pads1, rows_c1, start1, dst1, padv1
        t_tb1, (pads1, rows_c1, start1, dst1, padv1) = timeit(
            lambda: tables1(hist1, packed_d), iters=3)
        print(f"L1 tables (XLA glue):      {t_tb1:8.1f} ms")

        @jax.jit
        def r1(k2, meta, hist1, dst1, padv1):
            return route_level((k2,), meta, hist1, dst1, padv1,
                               plan.arena1_rows, ntiles1, pitch, rmax,
                               nlex=0, bias_input=True)
        t_r1, (a1,) = timeit(
            lambda: r1(k2, l1_meta_d, hist1, dst1, padv1), iters=3)
        print(f"L1 route_level:            {t_r1:8.1f} ms  "
              f"({n/(t_r1/1e3)/1e9:.3f} Gkeys/s)")

        # lump the rest (L2 + terminal) as end-to-end minus measured
        print(f"[L2+terminal ~= end2end - above]")
        known = t_plan + t_host + t_prep + t_h1 + t_tb1 + t_r1
        print(f"sum of isolated L1 stages: {known:8.1f} ms")


if __name__ == "__main__":
    main()
