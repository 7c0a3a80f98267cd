"""Micro-probe: per-element dynamic gather support/speed in Mosaic.

The rank-and-route level kernel (the planned ~3x replacement for the
bitonic level sort) needs per-element gathers with runtime indices:
  A. take_along_axis along lanes (axis=1)   — known supported
  B. take_along_axis along sublanes (axis=0) — the open question
  C. composed 2-D gather (axis 0 then axis 1)

Times each on a (ROWS, 128) int32 VMEM tile, grid=N_ITER to amortize.
"""

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

ROWS = 2048
LANES = 128
GRID = 64


def _mk(body):
    def kernel(x_ref, i_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] = o_ref[:] + body(x_ref[:], i_ref[:])

    def run(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, idx)
    return jax.jit(run)


def bench(name, fn, x, idx):
    try:
        r = fn(x, idx)
        np.asarray(jax.device_get(r.ravel()[-2:]))
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(x, idx)
            np.asarray(jax.device_get(r.ravel()[-2:]))
        dt = (time.perf_counter() - t0) / 3
        per = dt / GRID
        gks = ROWS * LANES / per / 1e9
        print(f"{name:<28} {per*1e6:8.1f} us/tile  {gks:8.2f} Gelem/s")
        return r
    except Exception as e:
        print(f"{name:<28} FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        return None


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 30, (ROWS, LANES), np.int32))
    idx_l = jnp.asarray(rng.integers(0, LANES, (ROWS, LANES), np.int32))
    idx_r = jnp.asarray(rng.integers(0, ROWS, (ROWS, LANES), np.int32))

    print(f"gather micro on {jax.devices()[0]}  tile=({ROWS},{LANES})")

    bench("A lane gather (axis=1)",
          _mk(lambda x, i: jnp.take_along_axis(x, i, axis=1)), x, idx_l)
    bench("B sublane gather (axis=0)",
          _mk(lambda x, i: jnp.take_along_axis(x, i, axis=0)), x, idx_r)

    def comp(x, i):
        y = jnp.take_along_axis(x, i, axis=0)
        return jnp.take_along_axis(y, (i + 7) % LANES, axis=1)
    bench("C composed (axis0 + axis1)", _mk(comp), x, idx_r)

    # D: reference VPU cost scale — one compare-exchange stage x 16
    def stages(x, i):
        y = x
        for k in range(16):
            p = jnp.take_along_axis(
                y, jnp.bitwise_xor(
                    lax.broadcasted_iota(jnp.int32, y.shape, 1), 1 << (k % 7)),
                axis=1)
            y = jnp.minimum(y, p) + jnp.maximum(y, p) - p
        return y
    bench("D 16 lane net stages", _mk(stages), x, idx_l)


if __name__ == "__main__":
    main()
