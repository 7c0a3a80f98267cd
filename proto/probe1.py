import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())

def bench(f, *args, iters=5, warmup=2):
    for _ in range(warmup):
        r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / iters

# --- 1. jnp.sort baselines (u32) ---
for logn in (24, 27):
    x = jax.random.bits(jax.random.key(0), (1 << logn,), dtype=jnp.uint32)
    t = bench(jax.jit(jnp.sort), x)
    print(f"jnp.sort 2^{logn}: {t*1e3:.1f} ms  {(1<<logn)/t/1e9:.3f} Gkeys/s")

# --- 2. streaming bandwidth: y = x + 1 at 2^28 (1GB r + 1GB w) ---
x = jax.random.bits(jax.random.key(1), (1 << 28,), dtype=jnp.uint32)
t = bench(jax.jit(lambda a: a + np.uint32(1)), x)
gb = (1 << 28) * 4 * 2 / 1e9
print(f"copy+1 2^28: {t*1e3:.2f} ms  {gb/t:.1f} GB/s (r+w)")

# --- 3. Pallas per-lane dynamic gather along sublanes ---
S, L = 256, 128
def gk(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
try:
    xg = jax.random.bits(jax.random.key(2), (S, L), dtype=jnp.uint32).astype(jnp.int32)
    idx = jax.random.randint(jax.random.key(3), (S, L), 0, S, dtype=jnp.int32)
    f = pl.pallas_call(gk,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(f)(xg, idx)
    ok = np.array_equal(np.asarray(r), np.take_along_axis(np.asarray(xg), np.asarray(idx), axis=0))
    print("pallas take_along_axis(axis=0) (256,128): COMPILES, correct =", ok)
except Exception as e:
    print("pallas take_along_axis(axis=0) FAILED:", str(e)[:300])

# --- 3b. same along lanes (axis=1) ---
try:
    def gk1(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    idx1 = jax.random.randint(jax.random.key(4), (S, L), 0, L, dtype=jnp.int32)
    f1 = pl.pallas_call(gk1,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r1 = jax.jit(f1)(xg, idx1)
    ok1 = np.array_equal(np.asarray(r1), np.take_along_axis(np.asarray(xg), np.asarray(idx1), axis=1))
    print("pallas take_along_axis(axis=1) (256,128): COMPILES, correct =", ok1)
except Exception as e:
    print("pallas take_along_axis(axis=1) FAILED:", str(e)[:300])

# --- 4. dynamic-offset DMA VMEM->HBM, static size ---
try:
    CH = 512  # elements, 1-D
    def dk(off_ref, x_ref, o_ref):
        def body(scratch, sem):
            scratch[:] = x_ref[:] * 2
            cp = pltpu.make_async_copy(scratch, o_ref.at[pl.ds(off_ref[0], CH)], sem)
            cp.start(); cp.wait()
        pl.run_scoped(body, pltpu.VMEM((CH,), jnp.int32), pltpu.SemaphoreType.DMA)
    N = 8192
    xs = jnp.arange(CH, dtype=jnp.int32)
    off = jnp.array([1000], dtype=jnp.int32)
    fd = pl.pallas_call(dk,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    r = jax.jit(fd)(off, xs)
    seg = np.asarray(r)[1000:1000+CH]
    print("dyn-offset DMA VMEM->HBM: COMPILES, correct =", np.array_equal(seg, np.arange(CH)*2))
except Exception as e:
    print("dyn-offset DMA FAILED:", str(e)[:300])
