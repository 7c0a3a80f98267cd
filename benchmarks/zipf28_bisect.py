"""Bisect the 2^28 zipf075 TPU worker crash.

Usage: python benchmarks/zipf28_bisect.py <variant>
  default | tc1 | sr2048 | old | cap1024 | logn27 | dev0
One variant per process: the crash kills the TPU worker, so each probe
needs a fresh client (and a recovered device).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.models import distributions as dist
from inplacemsdradixsort_tpu.ops import engine_v4 as ev


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "default"
    logn = 27 if variant == "logn27" else 28
    n = 1 << logn
    cfgs = {
        "default": SortConfig(),
        "tc1": SortConfig(term_classes=1),
        "sr2048": SortConfig(v3_sort_rows=2048),
        "old": SortConfig(v3_sort_rows=2048, term_classes=1),
        "cap1024": SortConfig(v3_cap_rows=1024),
        "logn27": SortConfig(),
        "dev0": SortConfig(device_plan=False),
    }
    cfg = cfgs.get(variant, SortConfig())
    keys = dist.make("zipf075", jax.random.key(0), n, dtype=jnp.uint32)
    np.asarray(jax.device_get(keys[-2:]))
    print(f"variant={variant} logn={logn} sorting...", flush=True)

    if variant in ("gen", "plan", "hist"):
        # sub-stage isolation: data generation only / device planner
        # only / planner + L1 histogram kernel only
        g = ev._dev_geometry(n, 1, cfg)
        if variant == "gen":
            print("gen sum:", int(jax.device_get(
                jnp.sum(keys, dtype=jnp.uint32))), flush=True)
            return
        with jax.enable_x64(False):
            kb = jax.lax.bitcast_convert_type(keys, jnp.int32)
            if variant == "plan":
                tb = ev._plan_tables_dev(kb, g, 0)
                got = {k: np.asarray(jax.device_get(v))
                       for k, v in tb.items()}
                print("plan ok:", {k: v.shape for k, v in got.items()},
                      flush=True)
                return
            from inplacemsdradixsort_tpu.ops.kernels_v4 import hist_level
            tb = ev._plan_tables_dev(kb, g, 0)
            rows_in = g.ntiles1 * g.pitch
            pad = rows_in * 128 - n
            k2d = jnp.concatenate(
                [kb, jnp.zeros((pad,), jnp.int32)]).reshape(rows_in, 128)
            h = hist_level(k2d, jnp.asarray(ev._l1_meta_np(g)),
                           tb["l1_bounds"], g.ntiles1, g.pitch, g.rmax,
                           bias_input=True)
            print("hist ok: sum", int(jax.device_get(jnp.sum(h))),
                  flush=True)
            return

    if variant in ("stage1", "stage2"):
        # run the fused pipeline truncated after L1 / L2 to isolate the
        # faulting kernel (the terminal is excluded in both)
        stage = 1 if variant == "stage1" else 2
        g = ev._dev_geometry(n, 1, cfg)
        print(f"geom: rmax={g.rmax} cap={g.cap_rows} "
              f"two_level={g.two_level}", flush=True)
        with jax.enable_x64(False):
            final, over, _ = ev._pipeline_v4_dev(
                (jax.lax.bitcast_convert_type(keys, jnp.int32),),
                g=g, nlex=0, interpret=False, stage=stage)
            np.asarray(jax.device_get(final[0].ravel()[-4:]))
        print(f"variant={variant}: completed without fault", flush=True)
        return

    nbm = 4.0 if variant == "r2" else 1.0
    k, _ = ev.sort_v4(keys, (), cfg, _nb_mult=nbm)
    out = np.asarray(jax.device_get(k))
    ref = np.sort(np.asarray(jax.device_get(keys)))
    print(f"variant={variant}: mismatches="
          f"{int((out != ref).sum())} stats={ev.FALLBACK_STATS}",
          flush=True)


if __name__ == "__main__":
    main()
