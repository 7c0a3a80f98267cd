import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v3 as e3
from inplacemsdradixsort_tpu.ops.kernels_v3 import partition_level, LANES

CFG = SortConfig(interpret=True, v3_sort_rows=64, v3_rmax=8, v3_cap_rows=64)
N = 90_000
rng = np.random.default_rng(hash("uniform") % 2**32)
x = rng.integers(0, 2**32, N, dtype=np.uint32)

ssz = int(min(max(CFG.sample_rate * N, 4096), CFG.sample_cap))
_, nb_want = e3._plan_geometry(N, False, 1.2, CFG)
stats = np.asarray(jax.device_get(e3._sample_stats(jnp.asarray(x), ssz=ssz, nbq=4*nb_want)))
rows = max(N // LANES, 1)
nrows = max(1, min(ssz // LANES, rows))
S = min(N, ssz) if (rows <= 1 or nrows >= rows) else nrows * LANES
plan = e3.make_plan(N, stats, S, False, CFG)
print("nb:", len(plan.term_child), "valid:", plan.term_valid.sum(),
      "rmax", plan.rmax, "pitch", plan.pitch, "cap", plan.cap_rows)
print("l1 caps:", plan.l1_dst_cap)
print("l2 caps:", plan.l2_dst_cap.reshape(plan.nparents, plan.rmax))

ntiles1 = plan.l1_tiles.shape[0]
rows_in = ntiles1 * plan.pitch
k2 = jnp.concatenate([
    jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.int32),
    jnp.zeros((rows_in * LANES - N,), jnp.int32)]).reshape(rows_in, LANES)
a1, _, occ1, real1, over1 = partition_level(
    k2, None, jnp.asarray(plan.l1_tiles), jnp.zeros((1,), jnp.int32),
    jnp.asarray(plan.l1_bounds), jnp.asarray(plan.l1_dst_start),
    jnp.asarray(plan.l1_dst_cap), plan.arena1_rows, plan.pitch, plan.rmax,
    parent_fill=jnp.array([N], jnp.int32), bias_input=True, interpret=True)
print("over1:", np.asarray(over1), "real1:", np.asarray(real1), "sum", np.asarray(real1).sum())
a2, _, occ2, real2, over2 = partition_level(
    a1, None, jnp.asarray(plan.l2_tiles),
    jnp.arange(plan.nparents, dtype=jnp.int32) * plan.rmax,
    jnp.asarray(plan.l2_bounds), jnp.asarray(plan.l2_dst_start),
    jnp.asarray(plan.l2_dst_cap), plan.arena2_rows, plan.pitch, plan.rmax,
    parent_fill=occ1 * LANES, bias_input=False, interpret=True)
real2 = np.asarray(real2); occ2 = np.asarray(occ2)
print("over2:", np.asarray(over2), "real2 sum:", real2.sum())

# expected per child
l2b = (plan.l2_bounds.view(np.uint32) ^ np.uint32(0x80000000)).astype(np.int64)
xi = x.astype(np.int64)
real1c = np.asarray(real1)
lc = plan.last_child_of_parent % plan.rmax
r2 = real2.reshape(plan.nparents, plan.rmax).copy()
for gi in range(plan.nparents):
    at_last = r2[gi, lc[gi]]
    r2[gi, lc[gi]] = max(real1c[gi] - (r2[gi].sum() - at_last), 0)
prev = -1
for c in range(plan.nparents * plan.rmax):
    gi, sj = divmod(c, plan.rmax)
    b = int(l2b[gi, sj])
    if b <= prev:
        continue
    expect = int(np.sum((xi > prev) & (xi <= b)))
    got = r2.reshape(-1)[c]
    if expect != got:
        print(f"child {c} (gi{gi} sj{sj}): corrected real {got} != {expect} (raw {real2[c]}, occ {occ2[c]})")
    prev = b
print("done")

# ---- run terminal
from inplacemsdradixsort_tpu.ops.kernels_v3 import terminal_sort_write
real2c = r2.reshape(-1)
tc = plan.term_child
reals_t = np.where(tc >= 0, real2c[np.maximum(tc, 0)], real1c[np.maximum(-1 - tc, 0)])
reals_t = np.where(plan.term_valid, reals_t, 0).astype(np.int32)
out_off = np.concatenate([[0], np.cumsum(reals_t)[:-1]]).astype(np.int32)
occ_t = np.where(tc >= 0, occ2[np.maximum(tc, 0)], 0).astype(np.int32)
btbl = np.stack([plan.term_src_row, occ_t, reals_t, plan.term_mode], axis=1).astype(np.int32)
fillb = ((plan.term_fill.astype(np.uint32) ^ np.uint32(0x80000000)).view(np.int32))
out, _ = terminal_sort_write(
    a2, None, jnp.asarray(btbl), jnp.asarray(fillb), jnp.asarray(out_off),
    plan.out_rows, plan.cap_rows, unbias_output=True, interpret=True)
got = np.asarray(out).reshape(-1)[:N].view(np.uint32)
exp = np.sort(x)
bad = np.nonzero(got != exp)[0]
print("terminal ok:", len(bad) == 0)
if len(bad):
    print("first bad:", bad[0], "of", N, "nbad", len(bad))
    print("got:", got[bad[0]-3:bad[0]+4])
    print("exp:", exp[bad[0]-3:bad[0]+4])
    # which bucket does bad[0] fall in?
    bi = np.searchsorted(out_off, bad[0], 'right') - 1
    print("bucket", bi, "off", out_off[bi], "real", reals_t[bi], "occ", occ_t[bi], "src", plan.term_src_row[bi])

# ---- bucket 1 deep dive
bi = 1
s_, occ_, real_, off_ = plan.term_src_row[bi], occ_t[bi], reals_t[bi], out_off[bi]
a2np = np.asarray(a2)
region = (a2np[s_:s_+occ_].reshape(-1).view(np.uint32) ^ np.uint32(0x80000000))
outseg = got[off_:off_+real_]
l2b_flat = l2b.reshape(-1)
b1 = int(l2b_flat[plan.term_child[bi]])
prev1 = int(l2b_flat[plan.term_child[bi]-1])
exp_b = np.sort(xi[(xi > prev1) & (xi <= b1)])
reg_sorted = np.sort(region.astype(np.int64))
print("region slots:", len(region), "real:", real_, "expect:", len(exp_b))
print("region first real slots == expect:", np.array_equal(reg_sorted[:len(exp_b)], exp_b) if len(reg_sorted)>=len(exp_b) else "short")
print("out first == expect:", np.array_equal(np.sort(outseg.astype(np.int64)), exp_b))
d1 = np.sort(outseg.astype(np.int64))
miss = np.setdiff1d(exp_b, d1)
extra = np.setdiff1d(d1, exp_b)
print("missing:", miss[:5], "extra:", extra[:5])
