import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from inplacemsdradixsort_tpu.ops import pallas_kernels as pk
from inplacemsdradixsort_tpu.ops.bitonic import bias_u32, unbias_u32

rng = np.random.default_rng(0)
TR = 8
n = 2000
keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
rows = 16
kb = bias_u32(jnp.asarray(np.concatenate([keys, np.full(rows*128-n, 0xFFFFFFFF, np.uint32)]))).reshape(rows, 128)
R = 8
b = ((np.arange(1, 9, dtype=np.uint64) << 29) - 1).astype(np.uint32)
bounds = np.tile(b, (2, 1))
bb = jnp.asarray((bounds ^ np.uint32(0x80000000)).view(np.int32))
ok, _, cnt = pk.tile_sort(kb, None, bb, TR, interpret=True)

cnt_np = np.asarray(cnt).astype(np.int64)
tile_valid = np.array([1024, 976])
c = cnt_np.copy(); c[:, R-1] = tile_valid
hist = np.diff(np.concatenate([np.zeros((2,1), np.int64), c], axis=1), axis=1)
starts_in_tile = np.concatenate([np.zeros((2,1), np.int64), c[:, :-1]], axis=1)
srows = (hist + 127) // 128
within = np.cumsum(srows, axis=0) - srows
caps = srows.sum(0) + 8  # pad_rows + chr_rows slack for DMA overshoot
child_start = np.concatenate([[0], np.cumsum(caps)[:-1]])
slot_rows = child_start[None, :] + within
out_rows = int(caps.sum()) + 8

ok2, _ = pk.distribute(ok, None,
    jnp.asarray(slot_rows, jnp.int32), jnp.asarray(starts_in_tile, jnp.int32),
    jnp.asarray(hist, jnp.int32), out_rows, TR, 8, interpret=True)
out = np.asarray(unbias_u32(ok2)).ravel()

okk = np.asarray(unbias_u32(ok)).ravel()
allok = True
for d in range(R):
    exp = []
    for t in range(2):
        s, ln = starts_in_tile[t, d], hist[t, d]
        exp.append(okk[t*1024 + s : t*1024 + s + ln])
    exp = np.concatenate(exp)
    # gather the child's valid elements from its slots
    got = []
    for t in range(2):
        row = slot_rows[t, d]
        got.append(out[row*128 : row*128 + hist[t, d]])
    got = np.concatenate(got)
    okd = np.array_equal(np.sort(exp), np.sort(got)) and np.array_equal(exp, got)
    if not okd:
        allok = False
        print(f"child {d}: MISMATCH exp {exp[:5]} got {got[:5]} lens {len(exp)} {len(got)}")
    # check sentinel padding of slots
    for t in range(2):
        row = slot_rows[t, d]; ln = hist[t, d]
        padlen = (128 - ln % 128) % 128
        seg = out[row*128 + ln : row*128 + ln + padlen]
        if not np.all(seg == 0xFFFFFFFF):
            allok = False
            print(f"child {d} tile {t}: pad not sentinel: {seg[:5]}")
print("distribute OK:", allok)
