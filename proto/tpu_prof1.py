import time, numpy as np, jax, jax.numpy as jnp
from inplacemsdradixsort_tpu.ops import pallas_kernels as pk

def bench(f, *args, iters=3):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.tree.map(lambda x: x.block_until_ready(), r)
    # force real sync through host fetch of tiny slice
    np.asarray(jax.device_get(jax.tree.leaves(r)[0].ravel()[-8:]))
    return (time.perf_counter() - t0) / iters

n = 1 << 26
rows = n // 128
TR = 256
kb = jax.random.bits(jax.random.key(0), (rows, 128), dtype=jnp.uint32).astype(jnp.int32)
ntiles = rows // TR

tc = bench(lambda: kb + 1)
print(f"copy alone: {tc*1e3:.0f} ms")
for r in (1, 64, 256):
    bounds = jnp.zeros((ntiles, r), jnp.int32)
    data = jnp.full((ntiles,), TR * 128, jnp.int32)
    t = bench(lambda b=bounds, d=data: pk.tile_sort(kb + 1, None, b, d, TR)[0])
    print(f"tile_sort r={r}: {t*1e3:.0f} ms  ({n/t/1e9:.2f} Gkeys/s)")
