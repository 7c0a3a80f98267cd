import time, numpy as np, jax, jax.numpy as jnp
import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig

cfg = SortConfig(engine="pallas")  # tile_elems=2^15, range_bits=6... check defaults
print("cfg:", cfg.tile_elems, cfg.range_bits)

rng = np.random.default_rng(0)
n = 1 << 24
keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
kj = jnp.asarray(keys)

t0 = time.perf_counter()
res = rs.sort(kj, config=cfg)
out = np.asarray(res.keys)
t1 = time.perf_counter()
print(f"first run (incl compile): {t1-t0:.1f}s")
print("correct:", np.array_equal(out, np.sort(keys)))

for it in range(3):
    t0 = time.perf_counter()
    res = rs.sort(kj, config=cfg)
    _ = np.asarray(res.keys[:8])
    t1 = time.perf_counter()
    print(f"run {it}: {(t1-t0)*1e3:.0f} ms  {n/(t1-t0)/1e9:.3f} Gkeys/s")

# compare jnp.sort
t0 = time.perf_counter()
x = jnp.sort(kj); _ = np.asarray(x[:8])
t1 = time.perf_counter()
t0 = time.perf_counter()
x = jnp.sort(kj); _ = np.asarray(x[:8])
t1b = time.perf_counter()
print(f"jnp.sort: {(t1b-t0)*1e3:.0f} ms")
