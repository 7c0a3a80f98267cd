"""Microbenchmark: in-kernel net_sort throughput + stage-variant costs.

Runs a Pallas kernel that loops the full network (or a single stage kind)
REPS times over a VMEM-resident block, so the measurement is pure VPU work
(one dispatch, no HBM traffic in the loop).
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inplacemsdradixsort_tpu.ops.netsort import net_sort, LANES


def timeit(f, iters=10):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def bench_kernel(body, rows, reps, label):
    """body(block) -> block; we iterate it reps times inside the kernel."""
    def kernel(x_ref, o_ref):
        def it(i, b):
            return body(b)
        o_ref[...] = lax.fori_loop(0, reps, it, x_ref[...], unroll=False)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    )
    x = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.key(0), (rows, LANES), dtype=jnp.uint32),
        jnp.int32)
    x = jax.block_until_ready(x)
    f = jax.jit(call)
    t = timeit(lambda: f(x), iters=10)
    n = rows * LANES
    per = t / reps
    print(f"{label:<42} {per*1e6:9.2f} us/iter  "
          f"{n/per/1e9:8.2f} Gelem/s/iter")
    return per


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = rows * LANES
    print(f"block {rows}x128 = {n} elems on {jax.devices()[0]}")

    # full sort network
    bench_kernel(lambda b: net_sort(b)[0], rows, 3, "full net_sort (keys)")

    # single stage kinds
    def lane_stage(k):
        def body(b):
            lane = lax.broadcasted_iota(jnp.int32, b.shape, 1)
            idx = lane ^ (1 << k)
            pk = jnp.take_along_axis(b, idx, axis=1)
            mn = jnp.minimum(b, pk)
            mx = jnp.maximum(b, pk)
            upper = (lane & (1 << k)) != 0
            return jnp.where(upper, mn, mx)
        return body

    def lane_stage_roll(k):
        d = 1 << k
        def body(b):
            lane = lax.broadcasted_iota(jnp.int32, b.shape, 1)
            fwd = pltpu.roll(b, LANES - d, 1)
            bwd = pltpu.roll(b, d, 1)
            upper = (lane & d) != 0
            pk = jnp.where(upper, bwd, fwd)
            mn = jnp.minimum(b, pk)
            mx = jnp.maximum(b, pk)
            return jnp.where(upper, mn, mx)
        return body

    def row_stage(kr):
        d = 1 << kr
        def body(b):
            row = lax.broadcasted_iota(jnp.int32, b.shape, 0)
            upper = (row & d) != 0
            fwd = jnp.roll(b, -d, axis=0)
            bwd = jnp.roll(b, d, axis=0)
            pk = jnp.where(upper, bwd, fwd)
            mn = jnp.minimum(b, pk)
            mx = jnp.maximum(b, pk)
            return jnp.where(upper, mn, mx)
        return body

    def row_stage_ptpu(kr):
        d = 1 << kr
        def body(b):
            row = lax.broadcasted_iota(jnp.int32, b.shape, 0)
            upper = (row & d) != 0
            fwd = pltpu.roll(b, b.shape[0] - d, 0)
            bwd = pltpu.roll(b, d, 0)
            pk = jnp.where(upper, bwd, fwd)
            mn = jnp.minimum(b, pk)
            mx = jnp.maximum(b, pk)
            return jnp.where(upper, mn, mx)
        return body

    for k in (0, 3, 6):
        bench_kernel(lane_stage(k), rows, 64, f"lane stage gather k={k}")
        bench_kernel(lane_stage_roll(k), rows, 64, f"lane stage roll   k={k}")
    for kr in (0, 3, 6, 9):
        if (1 << kr) < rows:
            bench_kernel(row_stage(kr), rows, 64, f"row stage jnp.roll d={1<<kr}")
            bench_kernel(row_stage_ptpu(kr), rows, 64,
                         f"row stage pltpu.roll d={1<<kr}")

    # raw ALU ceiling probe: min+max+where chain without movement
    def alu(b):
        c = pltpu.roll(b, 1, 1)
        return jnp.where(b > 0, jnp.minimum(b, c), jnp.maximum(b, c))
    bench_kernel(alu, rows, 64, "alu probe (roll+min+max+where)")


if __name__ == "__main__":
    main()
