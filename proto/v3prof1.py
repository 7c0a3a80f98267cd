import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from inplacemsdradixsort_tpu.ops.netsort import net_sort

LANES = 128
SENT = np.int32(0x7FFFFFFF)

def sync(r):
    for z in jax.tree.leaves(r):
        np.asarray(jax.device_get(z.ravel()[-8:]))

def chain_bench(f, *args, iters=8):
    y = f(*args); sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    sync(y)
    return (time.perf_counter() - t0) / iters

PITCH, RMAX = 960, 64
SORT_ROWS = 1024
NTILES = 512
ROWS = NTILES * PITCH

def mk(do_hist, do_pads, do_sort, do_scatter, hist_mode=0):
    def kernel(tbl, bounds, src, dst, occ_out, kbuf, hist, sems):
        t = pl.program_id(0)
        src_row = tbl[t, 0]
        nelems = PITCH * LANES
        cp = pltpu.make_async_copy(
            src.at[pl.ds(src_row, PITCH), :], kbuf.at[pl.ds(0, PITCH), :], sems.at[0])
        cp.start(); cp.wait()
        k = kbuf[pl.ds(0, PITCH), :]
        if do_hist:
            if hist_mode == 0:   # fori + scalar sum
                def cnt_body(d, prev):
                    bd = bounds[0, d]
                    leq = jnp.sum(jnp.where(k <= bd, 1, 0), dtype=jnp.int32)
                    hist[d] = leq - prev
                    return leq
                lax.fori_loop(0, RMAX, cnt_body, jnp.int32(0), unroll=False)
            elif hist_mode == 1:  # unrolled + scalar sum
                prev = jnp.int32(0)
                for d in range(RMAX):
                    bd = bounds[0, d]
                    leq = jnp.sum(jnp.where(k <= bd, 1, 0), dtype=jnp.int32)
                    hist[d] = leq - prev
                    prev = leq
            elif hist_mode == 2:  # unrolled, row-reduce then lane-reduce
                prev = jnp.int32(0)
                for d in range(RMAX):
                    bd = bounds[0, d]
                    col = jnp.sum(jnp.where(k <= bd, 1, 0),
                                  axis=0, dtype=jnp.int32)
                    leq = jnp.sum(col, dtype=jnp.int32)
                    hist[d] = leq - prev
                    prev = leq
        if do_pads:
            lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            def pad_body(d, _):
                npad = (-hist[d]) % LANES
                row = jnp.where(lane1 < npad, bounds[0, d], SENT)
                kbuf[pl.ds(PITCH + d, 1), :] = row
                return 0
            lax.fori_loop(0, RMAX, pad_body, 0, unroll=False)
        if do_sort:
            sk, _ = net_sort(kbuf[pl.ds(0, SORT_ROWS), :])
            kbuf[pl.ds(0, SORT_ROWS), :] = sk
        if do_scatter:
            CH = 64
            def run_body(d, carry):
                row0, nissued = carry
                h = hist[d]
                rrows = (h + LANES - 1) // LANES
                nch = (rrows + CH - 1) // CH
                cur = src_row  # write back to same place (perf only)
                def ch_body(i, _):
                    pltpu.make_async_copy(
                        kbuf.at[pl.ds(row0 + i * CH, CH), :],
                        dst.at[pl.ds(cur + i * CH, CH), :], sems.at[0]).start()
                    return 0
                lax.fori_loop(0, nch, ch_body, 0, unroll=False)
                return (row0 + rrows, nissued + nch)
            _, nissued = lax.fori_loop(0, RMAX, run_body,
                                       (jnp.int32(0), jnp.int32(0)), unroll=False)
            def drain(i, _):
                pltpu.make_async_copy(
                    kbuf.at[pl.ds(0, 64), :],
                    dst.at[pl.ds(0, 64), :], sems.at[0]).wait()
                return 0
            lax.fori_loop(0, nissued, drain, 0, unroll=False)
        else:
            kbuf2 = kbuf[pl.ds(0, PITCH), :]
            cpo = pltpu.make_async_copy(
                kbuf.at[pl.ds(0, PITCH), :], dst.at[pl.ds(src_row, PITCH), :], sems.at[0])
            cpo.start(); cpo.wait()
        occ_out[0] = 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NTILES,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((SORT_ROWS + 64, LANES), jnp.int32),
            pltpu.SMEM((RMAX,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS + 128, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((4,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

x = jax.random.randint(jax.random.key(0), (ROWS, LANES), -2**31, 2**31 - 1, dtype=jnp.int32)
sync(x)
tbl = np.zeros((NTILES, 4), np.int32)
tbl[:, 0] = np.arange(NTILES) * PITCH
tblj = jnp.asarray(tbl)
bounds = jnp.sort(jax.random.randint(jax.random.key(1), (1, RMAX), -2**31, 2**31-1, dtype=jnp.int32), axis=1)

n = ROWS * LANES
for name, kw in [
    ('load+store only', dict(do_hist=0, do_pads=0, do_sort=0, do_scatter=0)),
    ('+sort', dict(do_hist=0, do_pads=0, do_sort=1, do_scatter=0)),
    ('+hist fori', dict(do_hist=1, do_pads=0, do_sort=1, do_scatter=0, hist_mode=0)),
    ('+hist unroll', dict(do_hist=1, do_pads=0, do_sort=1, do_scatter=0, hist_mode=1)),
    ('+hist rowred', dict(do_hist=1, do_pads=0, do_sort=1, do_scatter=0, hist_mode=2)),
    ('+pads', dict(do_hist=1, do_pads=1, do_sort=1, do_scatter=0, hist_mode=2)),
    ('full w/scatter', dict(do_hist=1, do_pads=1, do_sort=1, do_scatter=1, hist_mode=2)),
]:
    try:
        f = mk(**kw)
        t = chain_bench(f, tblj, bounds, x)
        print(f'{name}: {t*1e3:.1f} ms ({n/t/1e9:.2f} Gk/s)')
    except Exception as e:
        print(f'{name}: FAIL {str(e)[:100]}')
