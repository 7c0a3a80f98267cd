"""Bisect the route-kernel sort slowdown.

Variants, all sorting ~1049 tiles of (2048,128) i32:
  A. grid + BlockSpec-managed IO, sort value, write block out
  B. grid + manual double-buffered DMA into (2,ROWS,128) scratch with a
     dynamic slot, sort, write back to scratch, single dummy store
  C. B + pl.when(nelems>0) wrapper + mask/bias writes (route's compute
     shape, minus the per-range store loop)
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

from inplacemsdradixsort_tpu.ops.netsort import net_sort, LANES

ROWS = 2048
NT = 128  # tiles


def _sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[-2:]))


def timeit(f, iters=3):
    r = f()
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    _sync(r)
    ms = (time.perf_counter() - t0) / iters * 1e3 - 26.0 / iters
    return max(ms, 0.0)


def variant_a(x):
    def kernel(x_ref, o_ref):
        o_ref[...] = net_sort(x_ref[...])[0]
    call = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT * ROWS, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    return jax.jit(call)(x)


def _manual(mask_and_when: bool):
    def kernel(src, out, buf, lsem, ssem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = lax.rem(t, 2)

        def load(tile, s):
            return pltpu.make_async_copy(
                src.at[pl.ds(tile * ROWS, ROWS), :], buf.at[s], lsem.at[s])

        @pl.when(t == 0)
        def _():
            load(0, 0).start()
        load(t, slot).wait()

        @pl.when(t + 1 < nt)
        def _():
            load(t + 1, 1 - slot).start()

        if mask_and_when:
            nelems = ROWS * LANES - 17

            @pl.when(nelems > 0)
            def _():
                r = lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
                l = lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
                live = (r * LANES + l) < nelems
                k = buf[slot] ^ np.int32(-0x80000000)
                buf[slot] = jnp.where(live, k, np.int32(0x7FFFFFFF))
                buf[slot] = net_sort(buf[slot])[0]
        else:
            buf[slot] = net_sort(buf[slot])[0]

        pltpu.make_async_copy(
            buf.at[slot], out.at[pl.ds(t * ROWS, ROWS), :], ssem.at[slot]
        ).start()
        pltpu.make_async_copy(
            buf.at[slot], out.at[pl.ds(t * ROWS, ROWS), :], ssem.at[slot]
        ).wait()

    call = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NT * ROWS, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    return jax.jit(call)


def main():
    n = NT * ROWS * LANES
    x = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.key(0), (NT * ROWS, LANES),
                        dtype=jnp.uint32), jnp.int32)
    _sync(x)
    print(f"{NT} tiles of ({ROWS},128) on {jax.devices()[0]}")

    t = timeit(lambda: variant_a(x))
    print(f"A blockspec-io sort:     {t:7.1f} ms  {n/(t/1e3)/1e9:6.2f} Gelem/s")
    fb = _manual(False)
    t = timeit(lambda: fb(x))
    print(f"B manual-dma sort:       {t:7.1f} ms  {n/(t/1e3)/1e9:6.2f} Gelem/s")
    fc = _manual(True)
    t = timeit(lambda: fc(x))
    print(f"C manual+mask+when sort: {t:7.1f} ms  {n/(t/1e3)/1e9:6.2f} Gelem/s")


if __name__ == "__main__":
    main()
