"""Phase-level profile of the v3 engine on the real chip.

Times each stage of the pipeline in isolation (separate jits) plus the
fused end-to-end path, to show where the 2^28 time actually goes.
Usage:  python benchmarks/profile_v3.py [logn]
"""

import functools
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
from inplacemsdradixsort_tpu.ops import engine_v3 as ev
from inplacemsdradixsort_tpu.ops.kernels_v3 import (
    LANES, partition_level, terminal_sort_write)
from inplacemsdradixsort_tpu.ops.netsort import net_sort


def timeit(f, iters=5):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    n = 1 << logn
    cfg = SortConfig()
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    jax.block_until_ready(keys)
    print(f"profile 2^{logn} on {jax.devices()[0]}")

    # ---- end to end
    with jax.enable_x64(False):
        t = timeit(lambda: ev.sort_v3(keys, None, cfg)[0], iters=3)
    print(f"end-to-end sort_v3:        {t*1e3:8.1f} ms  "
          f"({n/t/1e9:.3f} Gkeys/s)")

    # ---- sample+plan (host round trip)
    with jax.enable_x64(False):
        ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
        ssz = min(ssz, n)
        fudge = max(cfg.fudge, 1.2)
        _, nbw = ev._plan_geometry(n, False, fudge, cfg)

        def plan_fn():
            stats = np.asarray(jax.device_get(
                ev._sample_stats(keys, ssz=ssz, nbq=4 * nbw)))
            return stats
        t_plan = timeit(plan_fn, iters=3)
        stats = plan_fn()
        rows = max(n // LANES, 1)
        nrows = max(1, min(ssz // LANES, rows))
        S = min(n, ssz) if (rows <= 1 or nrows >= rows) else nrows * LANES
        plan = ev.make_plan(n, stats, S, False, cfg)
        t_host = timeit(lambda: ev.make_plan(n, stats, S, False, cfg),
                        iters=3)
    print(f"sample stats (dev+fetch):  {t_plan*1e3:8.1f} ms")
    print(f"make_plan (host):          {t_host*1e3:8.1f} ms")
    print(f"geometry: rmax={plan.rmax} pitch={plan.pitch} "
          f"ntiles1={plan.l1_tiles.shape[0]} ntiles2={plan.l2_tiles.shape[0]} "
          f"nb={plan.term_child.shape[0]} cap_rows={plan.cap_rows} "
          f"arena1={plan.arena1_rows} arena2={plan.arena2_rows}")

    packed, layout = ev._pack_tables(plan)
    packed_d = jax.device_put(jnp.asarray(packed))

    with jax.enable_x64(False):
        # ---- L1 partition alone
        ntiles1 = plan.l1_tiles.shape[0]
        rows_in = ntiles1 * plan.pitch
        pad = rows_in * LANES - n
        k2 = jnp.concatenate(
            [jax.lax.bitcast_convert_type(keys, jnp.int32),
             jnp.zeros((pad,), jnp.int32)]).reshape(rows_in, LANES)
        k2 = jax.block_until_ready(k2)
        nchild2 = plan.nparents * plan.rmax

        @jax.jit
        def l1(k2, packed):
            tb = ev._unpack(packed, layout)
            return partition_level(
                k2, None, tb["l1_tiles"], jnp.zeros((1,), jnp.int32),
                tb["l1_bounds"], tb["l1_start"], tb["l1_cap"],
                plan.arena1_rows, plan.pitch, plan.rmax,
                parent_fill=jnp.array([n], jnp.int32),
                sink_base=jnp.arange(plan.nparents, dtype=jnp.int32)
                * plan.rmax,
                sink_cnt=tb["group_len"],
                padsrc=tb["l2_bounds"], nsinks=nchild2,
                pad_stride=plan.rmax, bias_input=True)

        t_l1 = timeit(lambda: l1(k2, packed_d)[0], iters=3)
        print(f"L1 partition_level:        {t_l1*1e3:8.1f} ms  "
              f"({n/t_l1/1e9:.3f} Gkeys/s)")

        a1, _, occ1, real1, pads1, over1 = jax.block_until_ready(
            l1(k2, packed_d))

        @jax.jit
        def l2(a1, occ1, packed):
            tb = ev._unpack(packed, layout)
            return partition_level(
                a1, None, tb["l2_tiles"],
                jnp.arange(plan.nparents, dtype=jnp.int32) * plan.rmax,
                tb["l2_bounds"], tb["l2_start"], tb["l2_cap"],
                plan.arena2_rows, plan.pitch, plan.rmax,
                parent_fill=occ1 * LANES,
                sink_base=jnp.arange(nchild2, dtype=jnp.int32),
                sink_cnt=jnp.ones((nchild2,), jnp.int32),
                padsrc=tb["l2_bounds"].reshape(nchild2, 1),
                nsinks=nchild2, pad_stride=1, bias_input=False)

        t_l2 = timeit(lambda: l2(a1, occ1, packed_d)[0], iters=3)
        print(f"L2 partition_level:        {t_l2*1e3:8.1f} ms  "
              f"({n/t_l2/1e9:.3f} Gkeys/s)")

        a2, _, occ2, real2, pads2, over2 = jax.block_until_ready(
            l2(a1, occ1, packed_d))

        @jax.jit
        def term(a2, occ2, real2, pads1, packed):
            tb = ev._unpack(packed, layout)
            real2c = real2 - pads1
            term_child = tb["term_child"]
            term_valid = tb["term_valid"] != 0
            reals_t = jnp.where(
                term_child >= 0,
                jnp.take(real2c, jnp.maximum(term_child, 0)),
                jnp.take(real1, jnp.maximum(-1 - term_child, 0)))
            reals_t = jnp.where(term_valid, reals_t, 0).astype(jnp.int32)
            ends = jnp.minimum(jnp.cumsum(reals_t), n).astype(jnp.int32)
            out_off = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), ends[:-1]])
            reals_t = (ends - out_off).astype(jnp.int32)
            occ_t = jnp.where(
                term_child >= 0, jnp.take(occ2, jnp.maximum(term_child, 0)),
                0).astype(jnp.int32)
            btbl = jnp.stack(
                [tb["term_src"], occ_t, reals_t, tb["term_mode"]], axis=1)
            return terminal_sort_write(
                a2, None, btbl, tb["term_fill"], out_off,
                plan.out_rows, plan.cap_rows)[0]

        t_t = timeit(lambda: term(a2, occ2, real2, pads1, packed_d),
                     iters=3)
        print(f"terminal_sort_write:       {t_t*1e3:8.1f} ms  "
              f"({n/t_t/1e9:.3f} Gkeys/s)")

        # ---- raw net_sort sweep for reference
        rows = 1024
        blk = jax.random.bits(
            jax.random.key(1), (rows, LANES), dtype=jnp.uint32)
        blk = jax.block_until_ready(
            jax.lax.bitcast_convert_type(blk, jnp.int32))
        nsj = jax.jit(lambda b: net_sort(b)[0])
        t_net = timeit(lambda: nsj(blk), iters=20)
        nswp = n // (rows * LANES)
        print(f"net_sort {rows}x128 (xla):  {t_net*1e3:8.2f} ms  "
              f"-> full-sweep equiv {t_net*nswp*1e3:.1f} ms")

        print(f"sum of isolated stages:    "
              f"{(t_plan+t_host+t_l1+t_l2+t_t)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
