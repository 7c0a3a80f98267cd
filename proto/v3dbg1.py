import numpy as np, jax, jax.numpy as jnp
from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v3 as e3
from inplacemsdradixsort_tpu.ops.kernels_v3 import partition_level, LANES

cfg = SortConfig(interpret=True)
rng = np.random.default_rng(0)
n = 200_000
x = rng.integers(0, 2**32, n, dtype=np.uint32)
sample = np.sort(rng.choice(x, 8192))
plan = e3.make_plan(n, sample, False, cfg)
print("nb groups:", plan.nparents, "rmax", plan.rmax, "pitch", plan.pitch)
print("ntiles1", plan.l1_tiles.shape, "arena1", plan.arena1_rows)
print("l1 caps", plan.l1_dst_cap[:8], "...")

rows_in = -(-n // LANES)
k2 = jnp.concatenate([
    jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.int32),
    jnp.zeros((rows_in * LANES - n,), jnp.int32),
]).reshape(rows_in, LANES)

a1, _, occ1, real1, over1 = partition_level(
    k2, None,
    jnp.asarray(plan.l1_tiles),
    jnp.zeros((1,), jnp.int32),
    jnp.asarray(plan.l1_bounds),
    jnp.asarray(plan.l1_dst_start),
    jnp.asarray(plan.l1_dst_cap),
    plan.arena1_rows, plan.pitch, plan.rmax,
    parent_fill=jnp.array([n], jnp.int32),
    bias_input=True, interpret=True,
)
occ1 = np.asarray(occ1); real1 = np.asarray(real1)
a1 = np.asarray(a1)
print("over1:", np.asarray(over1))
print("real1 sum:", real1.sum(), "expect", n)

# verify: each L1 child's occupied region contains exactly the right multiset
bounds_u = (plan.l1_bounds.view(np.uint32) ^ np.uint32(0x80000000)).reshape(-1)
prev = -1
ok = True
for c in range(plan.nparents):
    s, cap, occ, real = plan.l1_dst_start[c], plan.l1_dst_cap[c], occ1[c], real1[c]
    seg = a1[s:s + occ].reshape(-1)
    segu = (seg.view(np.uint32) ^ np.uint32(0x80000000)).astype(np.int64)
    expect_mask = (x.astype(np.int64) > prev) & (x.astype(np.int64) <= int(bounds_u[c]))
    expect = np.sort(x[expect_mask].astype(np.int64))
    # real elements of the region = multiset expect; phantoms = bound value
    in_range = segu[(segu > prev) & (segu <= int(bounds_u[c]))]
    if real != len(expect):
        print(f"child {c}: real {real} != expect {len(expect)}"); ok = False
    # phantom count = occ*128 - real, all should equal bound
    phant = occ * 128 - real
    cnt_bound_seg = np.sum(segu == int(bounds_u[c]))
    cnt_bound_exp = np.sum(expect == int(bounds_u[c]))
    if cnt_bound_seg - cnt_bound_exp != phant:
        print(f"child {c}: phantom mismatch {cnt_bound_seg}-{cnt_bound_exp} != {phant}"); ok = False
    # non-bound values must match exactly as multisets
    a_nb = np.sort(segu[segu != int(bounds_u[c])])
    e_nb = np.sort(expect[expect != int(bounds_u[c])])
    if not np.array_equal(a_nb, e_nb):
        print(f"child {c}: multiset mismatch {len(a_nb)} vs {len(e_nb)}"); ok = False
    prev = int(bounds_u[c])
print("L1 verify:", "OK" if ok else "FAIL")
