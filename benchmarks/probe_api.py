"""On-hardware public-API probe set (the verify-skill checklist).

Runs the full adversarial probe matrix through ``rs.sort`` on the real
chip and prints one PASS/FAIL line per probe.  Exit code 0 iff all pass.
Usage: python -u benchmarks/probe_api.py [--quick]
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig

FAILED = []


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"PASS {name}", flush=True)
            except Exception:
                FAILED.append(name)
                print(f"FAIL {name}", flush=True)
                traceback.print_exc()
        return run
    return deco


def _expect_sorted(keys_np, res_keys):
    got = np.asarray(jax.device_get(res_keys))
    want = np.sort(keys_np)
    assert got.dtype == want.dtype, (got.dtype, want.dtype)
    assert np.array_equal(got, want), "sort mismatch"


def main():
    quick = "--quick" in sys.argv
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    probes = []

    for n in ([0, 1, 77, 65537] if quick else [0, 1, 77, 65537, 1_000_003]):
        @probe(f"tiny/odd n={n}")
        def _p(n=n):
            x = rng.integers(0, 2**32, n, dtype=np.uint32)
            _expect_sorted(x, rs.sort(jnp.asarray(x)).keys)
        probes.append(_p)

    n = 1 << 20
    dists = {
        "zipf1.3": lambda: rng.zipf(1.3, n).astype(np.uint32),
        "allequal": lambda: np.full(n, 0xDEADBEEF, np.uint32),
        "sorted": lambda: np.sort(rng.integers(0, 2**32, n, dtype=np.uint32)),
        "reverse": lambda: np.sort(
            rng.integers(0, 2**32, n, dtype=np.uint32))[::-1].copy(),
        "fewdistinct": lambda: rng.integers(0, 7, n, dtype=np.uint32),
        "30pct-max": lambda: np.where(
            rng.random(n) < 0.3, np.uint32(0xFFFFFFFF),
            rng.integers(0, 2**32, n, dtype=np.uint32)).astype(np.uint32),
    }
    for dname, gen in dists.items():
        @probe(f"dist {dname} @2^20")
        def _p(gen=gen):
            x = gen()
            _expect_sorted(x, rs.sort(jnp.asarray(x)).keys)
        probes.append(_p)

    @probe("stability sort_with_indices @2^20 dup-heavy")
    def _p_stab():
        x = rng.integers(0, 512, n, dtype=np.uint32)
        k, idx = rs.sort_with_indices(jnp.asarray(x))
        order = np.argsort(x, kind="stable")
        assert np.array_equal(np.asarray(jax.device_get(k)), x[order])
        assert np.array_equal(
            np.asarray(jax.device_get(idx)).astype(np.int64), order)
    probes.append(_p_stab)

    @probe("pairs u64 rids >= 2^32 @2^20")
    def _p_u64rid():
        x = rng.integers(0, 1000, n, dtype=np.uint32)
        rid = rng.integers(0, 2**64, n, dtype=np.uint64)
        with jax.enable_x64(True):
            res = rs.sort(jnp.asarray(x), jnp.asarray(rid))
            gk = np.asarray(jax.device_get(res.keys))
            gr = np.asarray(jax.device_get(res.rids)).astype(np.uint64)
        order = np.lexsort((rid, x))
        assert np.array_equal(gk, x[order])
        assert np.array_equal(gr, rid[order])
    probes.append(_p_u64rid)

    @probe("u64 keys uniform @2^20")
    def _p_u64():
        x = rng.integers(0, 2**64, n, dtype=np.uint64)
        with jax.enable_x64(True):
            res = rs.sort(jnp.asarray(x))
            got = np.asarray(jax.device_get(res.keys)).astype(np.uint64)
        assert np.array_equal(got, np.sort(x))
    probes.append(_p_u64)

    @probe("u64 keys heavy-dup @2^20")
    def _p_u64d():
        x = rng.integers(0, 9, n, dtype=np.uint64) * np.uint64(2**40)
        with jax.enable_x64(True):
            res = rs.sort(jnp.asarray(x))
            got = np.asarray(jax.device_get(res.keys)).astype(np.uint64)
        assert np.array_equal(got, np.sort(x))
    probes.append(_p_u64d)

    @probe("i32 keys @2^20")
    def _p_i32():
        x = rng.integers(-2**31, 2**31, n).astype(np.int32)
        res = rs.sort(jnp.asarray(x))
        got = np.asarray(jax.device_get(res.keys))
        assert got.dtype == np.int32 and np.array_equal(got, np.sort(x))
    probes.append(_p_i32)

    @probe("f32 keys @2^20")
    def _p_f32():
        x = rng.standard_normal(n).astype(np.float32)
        x[:6] = [0.0, -0.0, np.inf, -np.inf, 1e-44, -1e-44]
        res = rs.sort(jnp.asarray(x))
        got = np.asarray(jax.device_get(res.keys))
        assert got.dtype == np.float32 and np.array_equal(got, np.sort(x))
    probes.append(_p_f32)

    @probe("engine=pallas @2^20")
    def _p_pal():
        x = rng.integers(0, 2**32, n, dtype=np.uint32)
        res = rs.sort(jnp.asarray(x), config=SortConfig(engine="pallas"))
        _expect_sorted(x, res.keys)
    probes.append(_p_pal)

    @probe("engine=v3 @2^20")
    def _p_v3():
        x = rng.integers(0, 2**32, n, dtype=np.uint32)
        res = rs.sort(jnp.asarray(x), config=SortConfig(engine="v3"))
        _expect_sorted(x, res.keys)
    probes.append(_p_v3)

    for p in probes:
        p()

    print(f"{len(probes) - len(FAILED)}/{len(probes)} probes passed",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
