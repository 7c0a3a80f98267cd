import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from inplacemsdradixsort_tpu.ops import pallas_kernels as pk
from inplacemsdradixsort_tpu.ops.bitonic import bias_u32, unbias_u32

rng = np.random.default_rng(1)
# arena with 3 bucket regions of 8 rows class + slack
ROWS = 40
arena = np.full(ROWS * 128, 0xFFFFFFFF, np.uint32)
buckets = [(0, 700), (8, 1024), (16, 333)]  # (start_row, valid)
vals = {}
for sr, v in buckets:
    data = rng.integers(0, 1 << 32 - 1, v, dtype=np.uint32)
    arena[sr*128 : sr*128 + v] = data
    vals[sr] = data
kb = bias_u32(jnp.asarray(arena)).reshape(ROWS, 128)

starts = jnp.asarray(np.array([0, 8, 16, 24], np.int32))  # 4th = dummy slack
ok, _ = pk.ragged_sort(kb, None, starts, 8, interpret=True)
out = np.asarray(unbias_u32(ok)).ravel()
good = True
for sr, v in buckets:
    got = out[sr*128 : sr*128 + v]
    exp = np.sort(vals[sr])
    if not np.array_equal(got, exp):
        good = False
        print(f"bucket@{sr}: MISMATCH {got[:4]} vs {exp[:4]}")
    tail = out[sr*128 + v : (sr+8)*128]
    if not np.all(tail == 0xFFFFFFFF):
        good = False; print(f"bucket@{sr}: tail not sentinel")
print("ragged_sort OK:", good)

# compact: splice the three valid prefixes
n = sum(v for _, v in buckets)
out_rows = -(-n // 128) + 8 + 1
ck, _ = pk.compact(ok, None,
    jnp.asarray(np.array([0, 8, 16], np.int32)),
    jnp.asarray(np.array([700, 1024, 333], np.int32)),
    out_rows, 8, interpret=True)
cc = np.asarray(unbias_u32(ck)).ravel()[:n]
exp = np.concatenate([np.sort(vals[0]), np.sort(vals[8]), np.sort(vals[16])])
print("compact OK:", np.array_equal(cc, exp))
if not np.array_equal(cc, exp):
    bad = np.nonzero(cc != exp)[0]
    print("first bad idx:", bad[:5], cc[bad[:3]], exp[bad[:3]])
