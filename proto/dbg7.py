import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import inplacemsdradixsort_tpu.ops.pallas_engine as pe
from inplacemsdradixsort_tpu.ops.bitonic import unbias_u32
from inplacemsdradixsort_tpu.config import SortConfig

rng = np.random.default_rng(0)
n = 4096
keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
cfg = SortConfig(tile_elems=1024, range_bits=3, engine="pallas", interpret=True)

orig_ragged = pe.pk.ragged_sort
orig_compact = pe.pk.compact
def rg(kb, vb, starts, crows, interpret=False):
    pre = np.asarray(unbias_u32(kb)).ravel()
    ok, ov = orig_ragged(kb, vb, starts, crows, interpret=interpret)
    post = np.asarray(unbias_u32(ok)).ravel()
    st = np.asarray(starts)
    # bucket 0 region pre/post
    r0_pre = pre[0:crows*128]; r0_post = post[0:crows*128]
    nreal_pre = (r0_pre != 0xFFFFFFFF).sum(); nreal_post = (r0_post != 0xFFFFFFFF).sum()
    print(f"ragged: bucket0 pre real={nreal_pre} post real={nreal_post} post sorted={np.all(np.diff(r0_post.astype(np.int64))>=0)}")
    print(f"  post prefix dense: {np.all(r0_post[:nreal_post] != 0xFFFFFFFF)}")
    return ok, ov
def cp(kb, vb, ss, sl, out_rows, chr_rows, interpret=False):
    pre = np.asarray(unbias_u32(kb)).ravel()
    ssn, sln = np.asarray(ss), np.asarray(sl)
    # verify each segment is a dense sorted prefix
    allv = []
    for s, l in zip(ssn, sln):
        seg = pre[s*128 : s*128 + l]
        dense = (seg != 0xFFFFFFFF).sum() == (seg <= 0xFFFFFFFF).sum()  # trivially true
        print(f"  seg@{s} len={l} sorted={np.all(np.diff(seg.astype(np.int64))>=0)} nsent={(seg == 0xFFFFFFFF).sum()}")
        allv.append(seg)
    exp = np.concatenate(allv)
    ok, ov = orig_compact(kb, vb, ss, sl, out_rows, chr_rows, interpret=interpret)
    got = np.asarray(unbias_u32(ok)).ravel()[:len(exp)]
    print("compact matches concat:", np.array_equal(got, exp), got[:4], exp[:4])
    return ok, ov
pe.pk.ragged_sort = rg
pe.pk.compact = cp
out_k, _ = pe.msd_sort(jnp.asarray(keys), None, cfg)
print("final OK:", np.array_equal(np.asarray(out_k), np.sort(keys)))
