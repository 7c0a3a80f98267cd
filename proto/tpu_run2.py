import time, numpy as np, jax, jax.numpy as jnp
import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig

for logn, rb in ((24, 8), (26, 8)):
    n = 1 << logn
    cfg = SortConfig(engine="pallas", range_bits=rb)
    keys = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 32, n, dtype=np.uint32))
    rs.sort(keys, config=cfg)  # warm compile
    for it in range(2):
        t0 = time.perf_counter()
        res = rs.sort(keys, config=cfg, timing=(it == 1))
        _ = np.asarray(res.keys[:8])
        dt = time.perf_counter() - t0
        print(f"2^{logn} run{it} timing={it==1}: {dt*1e3:.0f} ms {n/dt/1e9:.3f} Gkeys/s")
    for lbl, t in res.times:
        if t > 0:
            print(f"   {lbl:<14}{t*1e3:8.1f} ms")
