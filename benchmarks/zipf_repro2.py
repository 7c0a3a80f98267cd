"""Replicate verify_probes' exact rng stream up to the zipf1.1 probe,
then diagnose the miscompare on that exact input."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v4 as ev


def probe_input():
    rng = np.random.default_rng(0)
    for n in (0, 1, 77, (1 << 16) + 13, (1 << 20) + 12345):
        rng.integers(0, 2**32, n, dtype=np.uint32)
    n = (1 << 22) + 999
    (rng.zipf(1.3, n) % (1 << 32)).astype(np.uint32)
    np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
    np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))[::-1].copy()
    rng.integers(0, 5, n, dtype=np.uint32)
    np.where(rng.random(n) < 0.3, np.uint32(0xFFFFFFFF),
             rng.integers(0, 2**32, n).astype(np.uint32)).astype(np.uint32)
    n26 = 1 << 26
    return (rng.zipf(1.1, n26) % (1 << 32)).astype(np.uint32)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "repro"
    x = probe_input()
    print(f"probe-exact zipf1.1 input: n={len(x)}", flush=True)
    np.save("/tmp/zipf11_probe.npy", x)

    if mode == "old":
        cfg = SortConfig(v3_sort_rows=2048, term_classes=1)
    elif mode == "tc1":
        cfg = SortConfig(term_classes=1)
    elif mode == "dbg":
        cfg = SortConfig(debug_checks=True)
    else:
        cfg = SortConfig()

    k, _ = ev.sort_v4(jnp.asarray(x), (), cfg)
    out = np.asarray(jax.device_get(k))
    ref = np.sort(x)
    bad = np.nonzero(out != ref)[0]
    print(f"mode={mode} mismatches: {len(bad)}", flush=True)
    if len(bad):
        b0 = bad[0]
        print(f"first at {b0}: ours={out[b0]} ref={ref[b0]}")
        print("ours around first:", out[max(0, b0 - 3): b0 + 5])
        print("ref  around first:", ref[max(0, b0 - 3): b0 + 5])
        print("multiset equal:", np.array_equal(np.sort(out), ref))
        runs = np.split(bad, np.nonzero(np.diff(bad) > 1)[0] + 1)
        print(f"mismatch runs: {len(runs)}; first 5 spans: "
              f"{[(int(r[0]), int(r[-1])) for r in runs[:5]]}")
        vals, cnts = np.unique(ref[bad], return_counts=True)
        print(f"ref values at mismatches (first 10): "
              f"{list(zip(vals[:10].tolist(), cnts[:10].tolist()))}")


if __name__ == "__main__":
    main()
