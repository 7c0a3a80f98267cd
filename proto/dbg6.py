import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import inplacemsdradixsort_tpu.ops.pallas_engine as pe
from inplacemsdradixsort_tpu.ops.bitonic import unbias_u32
from inplacemsdradixsort_tpu.config import SortConfig

rng = np.random.default_rng(0)
n = 4096
keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
cfg = SortConfig(tile_elems=1024, range_bits=3, engine="pallas", interpret=True)

# monkeypatch to trace
orig_tile_sort = pe.pk.tile_sort
orig_distribute = pe.pk.distribute
orig_ragged = pe.pk.ragged_sort
orig_compact = pe.pk.compact
lvl = [0]
def ts(kb, vb, bounds, tr, interpret=False):
    ok, ov, cnt = orig_tile_sort(kb, vb, bounds, tr, interpret=interpret)
    print(f"L{lvl[0]} tile_sort rows={kb.shape[0]} cnt0={np.asarray(cnt)[0][:4]}")
    return ok, ov, cnt
def db(kb, vb, sr, rs, rl, out_rows, tr, chr_rows, interpret=False):
    srn, rln = np.asarray(sr), np.asarray(rl)
    print(f"L{lvl[0]} distribute out_rows={out_rows} total_len={rln.sum()} nz_tiles={np.count_nonzero(rln.sum(1))}")
    ok, ov = orig_distribute(kb, vb, sr, rs, rl, out_rows, tr, chr_rows, interpret=interpret)
    lvl[0] += 1
    return ok, ov
def rg(kb, vb, starts, crows, interpret=False):
    print(f"ragged class={crows} nb={starts.shape[0]} starts={np.asarray(starts)[:6]}")
    return orig_ragged(kb, vb, starts, crows, interpret=interpret)
def cp(kb, vb, ss, sl, out_rows, chr_rows, interpret=False):
    print(f"compact nseg={ss.shape[0]} lens_sum={np.asarray(sl).sum()} starts={np.asarray(ss)[:8]} lens={np.asarray(sl)[:8]}")
    return orig_compact(kb, vb, ss, sl, out_rows, chr_rows, interpret=interpret)
pe.pk.tile_sort = ts
pe.pk.distribute = db
pe.pk.ragged_sort = rg
pe.pk.compact = cp

out_k, _ = pe.msd_sort(jnp.asarray(keys), None, cfg)
out = np.asarray(out_k)
exp = np.sort(keys)
print("final OK:", np.array_equal(out, exp))
bad = np.nonzero(out != exp)[0]
if len(bad):
    print("nbad:", len(bad), "first:", bad[:5], out[bad[:3]], exp[bad[:3]])
