"""Repro + localize the zipf(1.1) 2^26 miscompare seen in verify_probes.

Usage: python benchmarks/zipf_repro.py [logn] [mode]
  mode: repro (default) | old (r3 geometry) | dbg (debug_checks)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4 as ev


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    mode = sys.argv[2] if len(sys.argv) > 2 else "repro"
    n = 1 << logn
    rng = np.random.default_rng(0)
    x = (rng.zipf(1.1, n) % (1 << 32)).astype(np.uint32)
    print(f"zipf1.1 2^{logn}: distinct={len(np.unique(x[:100000]))}"
          f" head counts {np.bincount(x[:100000].clip(0, 8))}",
          flush=True)

    if mode == "old":
        cfg = SortConfig(v3_sort_rows=2048, term_classes=1)
    elif mode == "dbg":
        cfg = SortConfig(debug_checks=True)
    else:
        cfg = SortConfig()

    k, _ = ev.sort_v4(jnp.asarray(x), (), cfg)
    out = np.asarray(jax.device_get(k))
    ref = np.sort(x)
    bad = np.nonzero(out != ref)[0]
    print(f"mismatches: {len(bad)}", flush=True)
    if len(bad):
        b0, b1 = bad[0], bad[-1]
        print(f"first at {b0}: ours={out[b0]} ref={ref[b0]}")
        print(f"last  at {b1}: ours={out[b1]} ref={ref[b1]}")
        print("ours around first:", out[max(0, b0 - 3): b0 + 5])
        print("ref  around first:", ref[max(0, b0 - 3): b0 + 5])
        # are we a permutation (element conservation)?
        print("multiset equal:",
              np.array_equal(np.sort(out), ref))
        runs = np.split(bad, np.nonzero(np.diff(bad) > 1)[0] + 1)
        print(f"mismatch runs: {len(runs)}; first 5 spans: "
              f"{[(int(r[0]), int(r[-1])) for r in runs[:5]]}")


if __name__ == "__main__":
    main()
