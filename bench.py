"""Headline benchmark: keys/sec on uniform 32-bit keys, single chip.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "keys/s", "vs_baseline": N}

vs_baseline = our throughput / jnp.sort (XLA comparator sort) throughput on
the same chip and input — the measurable stand-in for the reference's
(unpublished) numbers per BASELINE.md.  Details go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
except Exception:
    pass

import inplacemsdradixsort_tpu as rs  # noqa: E402
from inplacemsdradixsort_tpu.config import SortConfig  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


def _sync(x):
    np.asarray(jax.device_get(x.ravel()[-8:]))


def time_fn(f, iters=3):
    f()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    return (time.perf_counter() - t0) / iters


def main():
    logn = int(os.environ.get("BENCH_LOGN", "28"))
    n = 1 << logn
    LOG(f"bench: 2^{logn} uniform uint32 keys on {jax.devices()[0]}")
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    _sync(keys)

    platform = jax.devices()[0].platform
    engine = os.environ.get(
        "BENCH_ENGINE", "v4" if platform == "tpu" else "xla"
    )
    cfg = SortConfig(engine=engine)

    def ours():
        res = rs.sort(keys, config=cfg)
        _sync(res.keys)
        return res

    # correctness gate before timing
    out = np.asarray(jax.device_get(ours().keys))
    ok = bool(np.all(out[1:] >= out[:-1])) and out.shape[0] == n
    chk = int(out.astype(np.uint64).sum()) == int(
        np.asarray(jax.device_get(keys)).astype(np.uint64).sum()
    )
    LOG(f"correct: sorted={ok} checksum={chk}")
    if not (ok and chk):
        print(json.dumps({
            "metric": f"keys/sec, 2^{logn} uniform u32, 1 chip",
            "value": 0.0, "unit": "keys/s", "vs_baseline": 0.0,
        }))
        return

    t_ours = time_fn(lambda: ours())
    jsort = jax.jit(jnp.sort)

    def baseline():
        _sync(jsort(keys))

    t_base = time_fn(baseline)

    ours_rate = n / t_ours
    base_rate = n / t_base
    LOG(f"ours: {t_ours*1e3:.0f} ms ({ours_rate/1e9:.3f} Gkeys/s)  "
        f"jnp.sort: {t_base*1e3:.0f} ms ({base_rate/1e9:.3f} Gkeys/s)")
    print(json.dumps({
        "metric": f"keys/sec, 2^{logn} uniform u32, 1 chip",
        "value": round(ours_rate, 1),
        "unit": "keys/s",
        "vs_baseline": round(ours_rate / base_rate, 4),
    }))


if __name__ == "__main__":
    main()
