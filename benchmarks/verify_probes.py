"""On-hardware verify probe set (the /verify skill's checklist).

Runs the public API on the real chip across the probe matrix that has
caught real bugs: odd/tiny n, u64 (incl. heavy duplicates), stability,
adversarial distributions, the fallback engine, plus dsort's host path.
Prints PASS/FAIL per probe and a summary line.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

import inplacemsdradixsort_tpu as rs
from inplacemsdradixsort_tpu.config import SortConfig

FAILS = []


def probe(name, ok):
    print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
    if not ok:
        FAILS.append(name)


def sort_np(x, cfg=None):
    res = rs.sort(jnp.asarray(x), config=cfg or SortConfig())
    return np.asarray(jax.device_get(res.keys))


def main():
    rng = np.random.default_rng(0)
    print(f"verify probes on {jax.devices()[0]}", flush=True)

    # ---- odd / tiny n
    for n in (0, 1, 77, (1 << 16) + 13, (1 << 20) + 12345):
        x = rng.integers(0, 2**32, n, dtype=np.uint32)
        probe(f"odd n={n}", np.array_equal(sort_np(x), np.sort(x)))

    # ---- adversarial distributions at engine scale
    n = (1 << 22) + 999
    dists = {
        "zipf": (rng.zipf(1.3, n) % (1 << 32)).astype(np.uint32),
        "allequal": np.full(n, 0xDEADBEEF, np.uint32),
        "sorted": np.sort(rng.integers(0, 2**32, n, dtype=np.uint32)),
        "reverse": np.sort(
            rng.integers(0, 2**32, n, dtype=np.uint32))[::-1].copy(),
        "fewdistinct": rng.integers(0, 5, n, dtype=np.uint32),
        "maxheavy": np.where(
            rng.random(n) < 0.3, np.uint32(0xFFFFFFFF),
            rng.integers(0, 2**32, n).astype(np.uint32)).astype(np.uint32),
    }
    for name, x in dists.items():
        probe(f"dist {name}", np.array_equal(sort_np(x), np.sort(x)))

    # ---- adaptive-scheduler contract: no adversarial class at
    # production scale reaches the whole-array XLA fallback
    # (schedule_passes analog, msb_64.c:1334-1400; VERDICT r3 item 5)
    from inplacemsdradixsort_tpu.ops import engine_v4
    n26 = 1 << 26
    adv = {
        "zipf1.1": (rng.zipf(1.1, n26) % (1 << 32)).astype(np.uint32),
        "dup8": rng.integers(0, 8, n26).astype(np.uint32),
        "allequal26": np.full(n26, 0xCAFEBABE, np.uint32),
        "maxheavy26": np.where(
            rng.random(n26) < 0.5, np.uint32(0xFFFFFFFF),
            rng.integers(0, 2**32, n26).astype(np.uint32)
        ).astype(np.uint32),
    }
    for name, x in adv.items():
        engine_v4.reset_fallback_stats()
        ok = np.array_equal(sort_np(x), np.sort(x))
        st = dict(engine_v4.FALLBACK_STATS)
        nofb = st["overflow"] == 0 and st["plan"] == 0 and \
            st["small_n"] == 0
        probe(f"no-fallback {name} {st}", ok and nofb)
    del adv

    # ---- stability (sort_with_indices vs stable argsort)
    x = rng.integers(0, 1000, 1 << 20).astype(np.uint32)
    k, r = rs.sort_with_indices(jnp.asarray(x))
    k, r = np.asarray(jax.device_get(k)), np.asarray(jax.device_get(r))
    order = np.argsort(x, kind="stable")
    probe("stability", np.array_equal(k, x[order])
          and np.array_equal(r, order.astype(np.uint32)))

    # ---- u64 keys, incl. heavy duplicates
    with jax.enable_x64(True):
        xu = rng.integers(0, 1 << 63, 1 << 20, dtype=np.uint64)
        res = rs.sort(jnp.asarray(xu))
        probe("u64 uniform", np.array_equal(
            np.asarray(jax.device_get(res.keys)), np.sort(xu)))
        xh = np.where(rng.random(1 << 20) < 0.5,
                      np.uint64(0x0123456789ABCDEF),
                      rng.integers(0, 1 << 63, 1 << 20, dtype=np.uint64))
        res = rs.sort(jnp.asarray(xh))
        probe("u64 heavy-dup", np.array_equal(
            np.asarray(jax.device_get(res.keys)), np.sort(xh)))

    # ---- rid payload >= 2^32 round-trips exactly
    xk = rng.integers(0, 100, 1 << 18).astype(np.uint32)
    rid = (np.arange(1 << 18, dtype=np.uint64) + (np.uint64(1) << 40))
    with jax.enable_x64(True):
        res = rs.sort(jnp.asarray(xk), jnp.asarray(rid))
        order = np.argsort(xk, kind="stable")
        probe("u64 rids", np.array_equal(
            np.asarray(jax.device_get(res.rids)), rid[order]))

    # ---- fallback engine
    x = rng.integers(0, 2**32, 1 << 20, dtype=np.uint32)
    probe("engine=pallas", np.array_equal(
        sort_np(x, SortConfig(engine="pallas")), np.sort(x)))
    probe("engine=v3", np.array_equal(
        sort_np(x, SortConfig(engine="v3")), np.sort(x)))

    print(("ALL PASS" if not FAILS else f"FAILURES: {FAILS}"), flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
