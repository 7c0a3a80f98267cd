import numpy as np, jax, jax.numpy as jnp
from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v3 as e3
from inplacemsdradixsort_tpu.ops.kernels_v3 import partition_level, terminal_sort_write, LANES

cfg = SortConfig(interpret=True)
rng = np.random.default_rng(0)
n = 300_000
x = rng.integers(0, 2**32, n, dtype=np.uint32)

# replicate engine steps
ssz = 8192
sample = np.sort(rng.choice(x, ssz))
plan = e3.make_plan(n, sample, False, cfg)
print("nb buckets:", len(plan.term_child), "rmax", plan.rmax)

ntiles1 = plan.l1_tiles.shape[0]
rows_in = ntiles1 * plan.pitch
padn = rows_in * LANES - n
k2 = jnp.concatenate([
    jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.int32),
    jnp.zeros((padn,), jnp.int32),
]).reshape(rows_in, LANES)

a1, _, occ1, real1, over1 = partition_level(
    k2, None, jnp.asarray(plan.l1_tiles), jnp.zeros((1,), jnp.int32),
    jnp.asarray(plan.l1_bounds), jnp.asarray(plan.l1_dst_start),
    jnp.asarray(plan.l1_dst_cap), plan.arena1_rows, plan.pitch, plan.rmax,
    parent_fill=jnp.array([n], jnp.int32), bias_input=True, interpret=True)

a2, _, occ2, real2, over2 = partition_level(
    a1, None, jnp.asarray(plan.l2_tiles),
    jnp.arange(plan.nparents, dtype=jnp.int32) * plan.rmax,
    jnp.asarray(plan.l2_bounds), jnp.asarray(plan.l2_dst_start),
    jnp.asarray(plan.l2_dst_cap), plan.arena2_rows, plan.pitch, plan.rmax,
    parent_fill=occ1 * LANES, bias_input=False, interpret=True)

occ2 = np.asarray(occ2); real2 = np.asarray(real2); real1 = np.asarray(real1)
a2np = np.asarray(a2)
print("over:", np.asarray(over1), np.asarray(over2))

# expected per final bucket
bounds_u = []
prev = -1
l2b = (plan.l2_bounds.view(np.uint32) ^ np.uint32(0x80000000)).astype(np.int64)
xi = x.astype(np.int64)

# correction like engine
rmax, npar = plan.rmax, plan.nparents
r2 = real2.reshape(npar, rmax).copy()
lc = plan.last_child_of_parent % rmax
for gi in range(npar):
    sub = r2[gi].sum()
    at_last = r2[gi, lc[gi]]
    r2[gi, lc[gi]] = max(real1[gi] - (sub - at_last), 0)
real2c = r2.reshape(-1)

prev = -1
ok = True
for c in range(plan.nparents * plan.rmax):
    gi, sj = divmod(c, plan.rmax)
    b = int(l2b[gi, sj])
    if b <= prev:
        continue
    s, occ = plan.l2_dst_start[c], occ2[c]
    seg = (a2np[s:s+occ].reshape(-1).view(np.uint32) ^ np.uint32(0x80000000)).astype(np.int64)
    expect = np.sort(xi[(xi > prev) & (xi <= b)])
    realc = real2c[c]
    if realc != len(expect):
        print(f"child {c} (gi {gi} sj {sj}): real {realc} != {len(expect)}"); ok = False
    nb_seg = np.sort(seg[seg != b])
    nb_exp = expect[expect != b]
    if not np.array_equal(nb_seg, nb_exp):
        print(f"child {c}: multiset mismatch {len(nb_seg)} vs {len(nb_exp)}"); ok = False
    nphant = occ*128 - real2c[c] if real2c[c] <= occ*128 else -1
    cb_seg = np.sum(seg == b); cb_exp = np.sum(expect == b)
    if cb_seg - cb_exp != occ*128 - len(expect):
        print(f"child {c}: bound-count {cb_seg} vs exp {cb_exp} occ*128 {occ*128}")
    prev = b
print("L2 arena verify:", "OK" if ok else "FAIL")
