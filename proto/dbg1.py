import os
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from inplacemsdradixsort_tpu.ops import pallas_kernels as pk
from inplacemsdradixsort_tpu.ops.bitonic import bias_u32, unbias_u32

rng = np.random.default_rng(0)
TR = 8
# one arena with 2 tiles, sentinel pad
n = 2000
keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
rows = 16  # 2 tiles of 8 rows
kb = bias_u32(jnp.asarray(np.concatenate([keys, np.full(rows*128-n, 0xFFFFFFFF, np.uint32)])))
kb = kb.reshape(rows, 128)

# bounds: 8 ranges on top 3 bits
R = 8
b = ((np.arange(1, 9, dtype=np.uint64) << 29) - 1).astype(np.uint32)
bounds = np.tile(b, (2, 1))
bb = jnp.asarray((bounds ^ np.uint32(0x80000000)).view(np.int32))

ok, _, cnt = pk.tile_sort(kb, None, bb, TR, interpret=True)
ok_np = np.asarray(unbias_u32(ok)).ravel()
# check: each tile sorted
t0, t1 = ok_np[:1024], ok_np[1024:2048]
print("tile0 sorted:", np.all(np.diff(t0.astype(np.int64)) >= 0))
print("tile1 sorted:", np.all(np.diff(t1.astype(np.int64)) >= 0))
# cnt vs numpy
cnt_np = np.asarray(cnt)
for t, tile in enumerate([keys[:1024], keys[1024:2000]]):
    expect = [(tile.astype(np.uint64) <= b[d]).sum() for d in range(8)]
    got = cnt_np[t]
    print(f"tile{t} cnt ok:", list(got) == expect, list(got), expect)
