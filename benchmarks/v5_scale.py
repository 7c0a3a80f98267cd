"""v5 in-place engine at scale: resident 2^29-2^31 keys-only and pairs.

The v5 engine's reason to exist (VERDICT r3 item 1 done-criterion):
resident single-chip sorts at ~(1 + batch_frac) x N peak HBM where the
out-of-place v4 pipeline (~2.5-3 x N) cannot fit.  logn <= 29 feeds one
array through sort_v5 (peak input + W); logn >= 30 assembles W chunk by
chunk via sort_v5_from_chunks (peak W + one chunk) — the resident
> half-HBM path.

Validation without host copies of N: device-side sortedness reduction,
mod-2^64 checksum vs the generator, and for pairs the reference's
rids == keys trick (check(same=1), msb_64.c:2461): the payload plane is
the key itself, so after the sort out_rid must equal out_key
elementwise.

Appends one JSON row per cell to benchmarks/v5_scale.json.

Usage: python benchmarks/v5_scale.py [logn] [keys|pairs]
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

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v5 as ev5

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)
LOGC = 27          # chunk elems for the from_chunks path


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 29
    mode = sys.argv[2] if len(sys.argv) > 2 else "keys"
    # logn=31: the resident ceiling is just under 2^31 (engine positions
    # are int32; offsets must stay < 2^31) — 16 equal 128-multiple
    # chunks of n = 2^31 - 2^20
    n = (1 << 31) - (1 << 20) if logn >= 31 else 1 << logn
    pairs = mode == "pairs"
    cfg = SortConfig(engine="v5")
    nbytes = n * 4 * (2 if pairs else 1)
    LOG(f"v5 scale: 2^{logn} {mode} on {jax.devices()[0]} "
        f"({nbytes / 2**30:.1f} GiB data)")

    CS = n // 16 if logn >= 31 else 1 << LOGC
    assert CS % 128 == 0 and (logn < 30 or n % CS == 0), (n, CS)

    @jax.jit
    def genc(i):
        k = jax.random.bits(jax.random.fold_in(jax.random.key(0), i),
                            (CS,), dtype=jnp.uint32)
        # u32 wraparound sum = checksum mod 2^32 (x64 is off here)
        return k, jnp.sum(k, dtype=jnp.uint32)

    # raw mode (2-plane 2^30+ / 1-plane 2^31+): results come back as the
    # full row-padded W buffers in 2D (w_rows, 128) int32 raw-bit form
    # (the zero-copy identity — any dtype/shape change costs a second W,
    # engine_v5.sort_v5_from_chunks docstring); validate the row-major
    # prefix of n elements slab by slab — no N-sized temporaries
    from inplacemsdradixsort_tpu.utils.checking import raw_check_2d
    use_raw = logn >= 30 and (pairs or logn >= 31)

    chk = jax.jit(lambda k: jnp.sum(k[:n], dtype=jnp.uint32))
    sorted_dev = jax.jit(lambda k: jnp.all(k[1:n] >= k[: n - 1]))
    eq_dev = jax.jit(lambda a, b: jnp.all(a[:n] == b[:n]))

    def run():
        t0 = time.perf_counter()
        if logn >= 30:
            nchunks = n // CS

            def chunk_fn(i):
                k, _ = genc(i)
                return (k, k) if pairs else (k,)
            ok, vo = ev5.sort_v5_from_chunks(chunk_fn, nchunks, n, cfg,
                                             raw=use_raw)
        else:
            k, _ = genc(0) if logn == LOGC else (jax.jit(
                lambda s: jax.random.bits(s, (n,), dtype=jnp.uint32)
            )(jax.random.key(0)), None)
            v = (k,) if pairs else ()
            np.asarray(jax.device_get(k[-2:]))
            t0 = time.perf_counter()
            ok, vo = ev5.sort_v5(k, v, cfg)
        np.asarray(jax.device_get(ok[-2:]))
        return time.perf_counter() - t0, ok, vo

    # input checksum from the generator stream
    if logn >= 30:
        in_sum = 0
        for i in range(n // CS):
            in_sum = (in_sum + int(jax.device_get(genc(i)[1]))) % 2**32
    else:
        k = jax.jit(lambda s: jax.random.bits(s, (n,), dtype=jnp.uint32)
                    )(jax.random.key(0))
        in_sum = int(jax.device_get(chk(k)))
        del k

    t, ok, vo = run()
    if use_raw:
        s, srt, pay = raw_check_2d(ok, n, vo[0] if pairs else None)
        is_sorted = bool(jax.device_get(srt))
        out_sum = int(jax.device_get(s)) % 2**32
        pay_ok = bool(jax.device_get(pay)) if pairs else True
    else:
        is_sorted = bool(jax.device_get(sorted_dev(ok)))
        out_sum = int(jax.device_get(chk(ok))) % 2**32
        pay_ok = (bool(jax.device_get(eq_dev(ok, vo[0])))
                  if pairs else True)
    LOG(f"sorted={is_sorted} checksum={in_sum == out_sum} "
        f"payload={pay_ok} first-run {t*1e3:.0f} ms")

    times = [t]
    for _ in range(2):
        ok = vo = None          # free before re-running: outputs are
        t2, ok, vo = run()      # ~N x nplanes HBM at these sizes
        times.append(t2)
    best = min(times)
    rate = n / best
    row = {
        "metric": f"v5 resident 2^{logn} {mode}",
        "value": round(rate, 1),
        "unit": "rows/s" if pairs else "keys/s",
        "sorted": is_sorted,
        "checksum_ok": in_sum == out_sum,
        "payload_ok": pay_ok,
        "ms": round(best * 1e3, 1),
    }
    print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(__file__), "v5_scale.json")
    hist = []
    if os.path.exists(path):
        hist = json.load(open(path))
    hist = [r for r in hist if r["metric"] != row["metric"]] + [row]
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    assert is_sorted and in_sum == out_sum and pay_ok, row


if __name__ == "__main__":
    main()
