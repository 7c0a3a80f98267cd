"""Full benchmark matrix over the BASELINE.md configs.

Runs every (size, distribution, mode) cell that fits the current device,
prints a table to stderr and writes benchmarks/results.json.

Configs (BASELINE.json):
  1. 2^27 uniform u32 (reference-binary anchor runs on CPU via
     benchmarks/baseline_reference.sh)
  2. 2^N uniform u32, single chip
  3. 2^N Zipfian theta=0.75/1.0 u32
  4. (u32 key, rowid) pairs — permutation with payload
  5. multi-host sharded — see parallel.dsort + __graft_entry__.dryrun
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.models import distributions as dist

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[-8:]))


def timeit(f, iters=3):
    f()
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    return (time.perf_counter() - t0) / iters


def main():
    logns = [int(x) for x in
             os.environ.get("BENCH_SIZES", "24,26").split(",")]
    platform = jax.devices()[0].platform
    engine = os.environ.get(
        "BENCH_ENGINE", "v4" if platform == "tpu" else "xla"
    )
    cfg = SortConfig(engine=engine)
    results = []
    jsort = jax.jit(jnp.sort)

    for logn in logns:
        n = 1 << logn
        for name in ("uniform", "zipf075", "zipf100"):
            keys = dist.make(name, jax.random.key(0), n, dtype=jnp.uint32)
            _sync(keys)
            out = rs.sort(keys, config=cfg).keys
            ok = bool(jnp.all(out[1:] >= out[:-1]))

            def one():
                res = rs.sort(keys, config=cfg)
                if not res.synced:
                    _sync(res.keys)
            t = timeit(one)
            tb = timeit(lambda: _sync(jsort(keys)))
            row = dict(config=f"2^{logn} {name} u32", keys_per_s=n / t,
                       xla_keys_per_s=n / tb, speedup=tb / t, correct=ok)
            results.append(row)
            LOG(f"{row['config']:<24} {n/t/1e9:7.3f} Gk/s  "
                f"xla {n/tb/1e9:7.3f}  x{tb/t:5.2f}  ok={ok}")
        # pairs mode (config 4)
        keys = dist.uniform(jax.random.key(1), n)
        rids = jnp.arange(n, dtype=jnp.uint32)
        _sync(keys)
        def one_pairs():
            res = rs.sort(keys, rids, config=cfg)
            if not res.synced:
                _sync(res.keys)
        t = timeit(one_pairs)
        tb = timeit(lambda: _sync(
            jax.jit(lambda k, r: jax.lax.sort((k, r), num_keys=1))(
                keys, rids)[0]
        ))
        row = dict(config=f"2^{logn} uniform pairs", rows_per_s=n / t,
                   xla_rows_per_s=n / tb, speedup=tb / t)
        results.append(row)
        LOG(f"{row['config']:<24} {n/t/1e9:7.3f} Gr/s  "
            f"xla {n/tb/1e9:7.3f}  x{tb/t:5.2f}")

        # u64 keys — the reference's native type (msb_64.h:37); sorted
        # as (hi, lo) u32 planes through the same engine
        with jax.enable_x64(True):
            k64 = jax.jit(
                lambda s: jax.random.bits(s, (n,), dtype=jnp.uint64)
            )(jax.random.key(2))
            _sync(k64)
            out = rs.sort(k64, config=cfg).keys
            ok = bool(jnp.all(out[1:] >= out[:-1]))

            def one_u64():
                res = rs.sort(k64, config=cfg)
                if not res.synced:
                    _sync(res.keys)
            t = timeit(one_u64)
            tb = timeit(lambda: _sync(jsort(k64)))
        row = dict(config=f"2^{logn} uniform u64", keys_per_s=n / t,
                   xla_keys_per_s=n / tb, speedup=tb / t, correct=ok)
        results.append(row)
        LOG(f"{row['config']:<24} {n/t/1e9:7.3f} Gk/s  "
            f"xla {n/tb/1e9:7.3f}  x{tb/t:5.2f}  ok={ok}")

        # LSB engine A/B row (the reference suite's lsb_32 variant,
        # Makefile:8-24): same uniform u32 input through the LSB
        # ping-pong engine vs the MSD engine's row above
        if engine != "xla":
            keys = dist.uniform(jax.random.key(0), n)
            _sync(keys)
            cfg_lsb = SortConfig(engine="lsb")
            out = rs.sort(keys, config=cfg_lsb).keys
            ok = bool(jnp.all(out[1:] >= out[:-1]))

            def one_lsb():
                res = rs.sort(keys, config=cfg_lsb)
                if not res.synced:
                    _sync(res.keys)
            t = timeit(one_lsb)
            row = dict(config=f"2^{logn} uniform u32 (lsb A/B)",
                       keys_per_s=n / t, correct=ok)
            results.append(row)
            LOG(f"{row['config']:<24} {n/t/1e9:7.3f} Gk/s  ok={ok}")

    outpath = os.path.join(os.path.dirname(__file__), "results.json")
    with open(outpath, "w") as f:
        json.dump(results, f, indent=1)
    LOG(f"wrote {outpath}")


if __name__ == "__main__":
    main()
