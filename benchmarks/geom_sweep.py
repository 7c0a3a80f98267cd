"""Sweep v3 engine geometry (sort_rows x cap_rows) on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v3 as ev


def timeit(f, iters=3):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    n = 1 << logn
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    jax.block_until_ready(keys)
    ref = None
    for sort_rows in (512, 1024, 2048):
        for cap_rows in (1024, 2048):
            for rmax in (None, 48, 96):
                cfg = SortConfig(v3_sort_rows=sort_rows,
                                 v3_cap_rows=cap_rows, v3_rmax=rmax)
                try:
                    with jax.enable_x64(False):
                        k, _ = ev.sort_v3(keys, None, cfg)
                        out = np.asarray(jax.device_get(k[-4:]))
                        t = timeit(
                            lambda: ev.sort_v3(keys, None, cfg)[0], iters=3)
                except Exception as e:
                    print(f"sr={sort_rows} cap={cap_rows} rmax={rmax}: "
                          f"FAIL {type(e).__name__}: {str(e)[:100]}")
                    continue
                print(f"sr={sort_rows} cap={cap_rows} rmax={rmax}: "
                      f"{t*1e3:7.1f} ms  {n/t/1e9:.3f} Gkeys/s")


if __name__ == "__main__":
    main()
