"""Honest microbenchmarks of VMEM compute primitives (difference timing).

Two pitfalls of naive timing on this backend:
- ``block_until_ready`` is a no-op through the tunnel (net_micro.py's
  numbers are async-dispatch artifacts);
- each dispatch carries ~ms of tunnel overhead, polluting small kernels.

Here every primitive runs twice with rep counts R1 < R2 inside ONE kernel
(fori_loop) and the reported cost is (t(R2)-t(R1))/(R2-R1): dispatch and
sync overhead cancel exactly.
"""

import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inplacemsdradixsort_tpu.ops.netsort import net_sort, net_merge, LANES


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[-2:]))


def _wall(f, iters=2):
    r = f()
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / iters


def _build(body, rows, reps, dtype, nplanes):
    def kernel(*refs):
        xs = tuple(r[...] for r in refs[:nplanes])
        outs = refs[nplanes:]

        def it(i, bs):
            rs = body(bs)
            # fold the iteration index in so the loop can't be collapsed
            return tuple(r ^ i for r in rs) if dtype == jnp.int32 else rs
        res = lax.fori_loop(0, reps, it, xs, unroll=False)
        for o, r in zip(outs, res):
            o[...] = r

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), dtype)] * nplanes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda *a: call(*a))


def bench(body, rows, label, dtype=jnp.int32, nplanes=1, r1=16, r2=80):
    xs = tuple(
        jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.key(i), (rows, LANES),
                            dtype=jnp.uint32), jnp.int32).astype(dtype)
        for i in range(nplanes)
    )
    _sync(xs)
    f1 = _build(body, rows, r1, dtype, nplanes)
    f2 = _build(body, rows, r2, dtype, nplanes)
    t1 = _wall(lambda: f1(*xs))
    t2 = _wall(lambda: f2(*xs))
    per = max((t2 - t1) / (r2 - r1), 1e-9) * 1e6  # us
    n = rows * LANES
    print(f"{label:<46} {per:9.2f} us/iter  {n/(per*1e-6)/1e9:8.2f} Gelem/s",
          flush=True)
    return per


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = rows * LANES
    print(f"block {rows}x128 = {n} elems on {jax.devices()[0]} (diff timing)",
          flush=True)

    which = sys.argv[2] if len(sys.argv) > 2 else "all"

    if which in ("all", "sort"):
        bench(lambda bs: (net_sort(bs[0])[0],), rows,
              "full net_sort (keys)", r1=16, r2=80)
        bench(lambda bs: (net_merge(bs[0])[0],), rows,
              "full net_merge (keys)", r1=64, r2=320)
        bench(lambda bs: net_sort(bs[0], bs[1]), rows,
              "full net_sort (pairs)", nplanes=2, r1=8, r2=40)

    if which in ("all", "stage"):
        def lane_stage_gather(bs):
            b = bs[0]
            lane = lax.broadcasted_iota(jnp.int32, b.shape, 1)
            idx = lane ^ 8
            pk = jnp.take_along_axis(b, idx, axis=1)
            mn = jnp.minimum(b, pk)
            mx = jnp.maximum(b, pk)
            return (jnp.where((lane & 8) != 0, mn, mx),)
        bench(lane_stage_gather, rows, "lane stage (gather) k=3",
              r1=256, r2=1280)

        def row_stage(d):
            def f(bs):
                b = bs[0]
                row = lax.broadcasted_iota(jnp.int32, b.shape, 0)
                upper = (row & d) != 0
                fwd = jnp.roll(b, -d, axis=0)
                bwd = jnp.roll(b, d, axis=0)
                pk = jnp.where(upper, bwd, fwd)
                mn = jnp.minimum(b, pk)
                mx = jnp.maximum(b, pk)
                return (jnp.where(upper, mn, mx),)
            return f
        bench(row_stage(1), rows, "row stage d=1", r1=256, r2=1280)
        bench(row_stage(64), rows, "row stage d=64", r1=256, r2=1280)
        if rows > 1024:
            bench(row_stage(1024), rows, "row stage d=1024", r1=256, r2=1280)

        def alu(bs):
            b = bs[0]
            return (jnp.where(b > 0, jnp.minimum(b, b + 1),
                              jnp.maximum(b, b - 1)),)
        bench(alu, rows, "alu probe (cmp+min+max+where)", r1=512, r2=2560)

        def addonly(bs):
            return (bs[0] + 1,)
        bench(addonly, rows, "add-only probe", r1=1024, r2=5120)

    if which in ("all", "gather"):
        def dyn_gather_lane(bs):
            b = bs[0]
            idx = (b & 127)
            return (jnp.take_along_axis(b, idx, axis=1) | 1,)
        bench(dyn_gather_lane, rows, "dyn take_along_axis axis=1 (lanes)",
              r1=256, r2=1280)

        def dyn_gather_row(bs):
            b = bs[0]
            idx = (b & (rows - 1))
            return (jnp.take_along_axis(b, idx, axis=0) | 1,)
        try:
            bench(dyn_gather_row, rows, "dyn take_along_axis axis=0 (rows)",
                  r1=32, r2=160)
        except Exception as e:
            print(f"dyn take_along_axis axis=0: FAILS ({str(e)[:90]})",
                  flush=True)

        def flipper(bs):
            b = bs[0]
            return (jnp.flip(b, axis=0),)
        bench(flipper, rows, "jnp.flip axis=0", r1=256, r2=1280)

        def flipl(bs):
            b = bs[0]
            return (jnp.flip(b, axis=1),)
        bench(flipl, rows, "jnp.flip axis=1", r1=256, r2=1280)

    if which in ("all", "misc"):
        def alu8(bs):
            b = bs[0]
            return (jnp.where(b > 0, jnp.minimum(b, b + 1),
                              jnp.maximum(b, b - 1)),)
        bench(alu8, rows, "alu probe int8", dtype=jnp.int8, r1=512, r2=2560)

        def csum(bs):
            return (jnp.cumsum(bs[0], axis=0),)
        bench(csum, rows, "cumsum axis=0", r1=64, r2=320)

        R0 = 512
        def mm8(bs):
            b = bs[0]
            p = (b[:R0, :] > 0).astype(jnp.int8)
            q = b[:R0, :].astype(jnp.int8)
            o = jax.lax.dot_general(
                p, q, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (b.at[:R0, :].set(o.astype(jnp.int32)),)
        try:
            t = bench(mm8, rows, f"int8 matmul ({R0}x128)@..", r1=64, r2=320)
            macs = R0 * 128 * 128
            print(f"   -> {macs/(t*1e-6)/1e12:.2f} T MAC/s", flush=True)
        except Exception as e:
            print(f"int8 matmul: FAILS ({str(e)[:90]})", flush=True)

        def transp(bs):
            b = bs[0]
            t = b[:128, :].T
            return (b.at[:128, :].set(t),)
        bench(transp, rows, "transpose 128x128 corner", r1=64, r2=320)


if __name__ == "__main__":
    main()
