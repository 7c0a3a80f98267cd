"""Bisect the terminal regression: end-to-end v4 timings for terminal
class counts (and, via CLI, any logn).

Usage: python benchmarks/term_bisect.py [logn] [nclasses ...]
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
from inplacemsdradixsort_tpu.ops.engine_v4 import sort_v4


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[-2:]))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    variants = [int(v) for v in sys.argv[2:]] or [1, 3]
    n = 1 << logn
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    _sync(keys)
    print(f"term bisect 2^{logn} on {jax.devices()[0]}", flush=True)

    sort_rows = int(os.environ.get("SORT_ROWS", "2048"))
    for nc in variants:
        cfg = SortConfig(term_classes=nc, v3_sort_rows=sort_rows)

        def run():
            out, _ = sort_v4(keys, cfg=cfg)
            _sync(out)
            return out

        out = run()
        ok = bool(np.all(np.diff(np.asarray(jax.device_get(out))
                                 .astype(np.int64)) >= 0))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            run()
        t = (time.perf_counter() - t0) / iters
        print(f"nclasses={nc}: {t*1e3:7.1f} ms  {n/t/1e9:6.3f} Gkeys/s  "
              f"sorted={ok}", flush=True)


if __name__ == "__main__":
    main()
