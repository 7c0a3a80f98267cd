import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(f, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = f(*args)
        np.asarray(jax.device_get(r.ravel()[-8:]))  # force real sync via host fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
        np.asarray(jax.device_get(r.ravel()[-8:]))
    return (time.perf_counter() - t0) / iters

# --- 1. real baselines ---
for logn in (24, 27):
    x = jax.random.bits(jax.random.key(0), (1 << logn,), dtype=jnp.uint32)
    t = bench(jax.jit(jnp.sort), x)
    print(f"jnp.sort 2^{logn}: {t*1e3:.1f} ms  {(1<<logn)/t/1e9:.3f} Gkeys/s")

x = jax.random.bits(jax.random.key(1), (1 << 28,), dtype=jnp.uint32)
t = bench(jax.jit(lambda a: a + np.uint32(1)), x)
print(f"copy+1 2^28: {t*1e3:.2f} ms  {(1<<28)*4*2/1e9/t:.1f} GB/s (r+w)")

# --- 2. dyn-offset DMA, 2-D chunks ---
try:
    CHR = 8  # chunk rows of 128 lanes
    def dk(off_ref, x_ref, o_ref):
        def body(scratch, sem):
            scratch[:] = x_ref[:] * 2
            cp = pltpu.make_async_copy(scratch, o_ref.at[pl.ds(off_ref[0], CHR), :], sem)
            cp.start(); cp.wait()
        pl.run_scoped(body, pltpu.VMEM((CHR, 128), jnp.int32), pltpu.SemaphoreType.DMA)
    xs = jnp.arange(CHR * 128, dtype=jnp.int32).reshape(CHR, 128)
    off = jnp.array([13], dtype=jnp.int32)
    fd = pl.pallas_call(dk,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    r = jax.jit(fd)(off, xs)
    seg = np.asarray(r)[13:13+CHR]
    print("dyn-offset 2-D DMA VMEM->HBM: correct =", np.array_equal(seg, np.arange(CHR*128).reshape(CHR,128)*2))
except Exception as e:
    print("dyn-offset 2-D DMA FAILED:", str(e)[:500])

# --- 3. dynamic VMEM slice read/write (sublane dim, 2-D) ---
try:
    def vk(off_ref, x_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        chunk = x_ref[pl.ds(off_ref[0], 8), :]          # dyn read
        o_ref[pl.ds(off_ref[1], 8), :] = chunk          # dyn write
    xs2 = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    offs = jnp.array([5, 21], dtype=jnp.int32)
    fv = pl.pallas_call(vk,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(fv)(offs, xs2)
    ok = np.array_equal(np.asarray(r)[21:29], np.asarray(xs2)[5:13])
    print("dyn VMEM sublane slice r/w: correct =", ok)
except Exception as e:
    print("dyn VMEM sublane slice FAILED:", str(e)[:500])
