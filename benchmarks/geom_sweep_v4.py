"""Sweep v4 engine geometry on the real chip.

The engine is VPU-network-bound (~1.7 ops/elem-stage measured, see
benchmarks/gather_micro.py + ARCHITECTURE.md perf accounting), so the
levers are stage counts and terminal fill factor:

- sort_rows: level tile = sort_rows x 128 -> log2(E)*(log2(E)+1)/2
  network stages per level sweep (2048 rows = 171 st, 1024 = 153,
  512 = 136) vs phantom-pad overhead rmax*64/(pitch*128).
- cap_rows: terminal capacity class (+XL 2x rescue above it).
- term_classes: sub-cap classes (cap/2, cap/4) so underfull buckets
  sort with proportionally cheaper networks.
- nb_mult: scales the bucket-count target, i.e. shifts the occupancy
  distribution relative to the class cap grid (fill factor).

Usage: python benchmarks/geom_sweep_v4.py [logn] [quick|full]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4 as ev


def timeit(f, iters=3):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"
    n = 1 << logn
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    jax.block_until_ready(keys)
    print(f"geom sweep v4: 2^{logn} uniform u32 on {jax.devices()[0]}",
          flush=True)

    # (sort_rows, cap_rows(None=auto), term_classes, nb_mult)
    combos = [
        (2048, None, 1, 1.0),      # current default
        (1024, None, 1, 1.0),
        (1024, None, 3, 1.0),
        (2048, None, 3, 1.0),
        (1024, 1024, 3, 1.0),
        (1024, 1024, 3, 1.7),      # push occupancy under cap/2
        (1024, 2048, 3, 1.0),
        (512, 1024, 3, 1.0),
        (2048, 1024, 3, 1.7),
    ]
    if mode == "quick":
        combos = combos[:4]

    ok = None
    for sr, cap, tc, nbm in combos:
        cfg = SortConfig(v3_sort_rows=sr, v3_cap_rows=cap,
                         term_classes=tc)
        tag = f"sr={sr} cap={cap or 'auto'} tc={tc} nbm={nbm}"
        try:
            with jax.enable_x64(False):
                k, _ = ev.sort_v4(keys, (), cfg, _nb_mult=nbm)
                out = np.asarray(jax.device_get(k[-4:]))
                if ok is None:
                    ok = out
                elif not np.array_equal(ok, out):
                    print(f"{tag}: WRONG TAIL {out} vs {ok}", flush=True)
                    continue
                t = timeit(
                    lambda: ev.sort_v4(keys, (), cfg, _nb_mult=nbm)[0],
                    iters=3)
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        print(f"{tag}: {t*1e3:7.1f} ms  {n/t/1e9:.3f} Gkeys/s", flush=True)


if __name__ == "__main__":
    main()
