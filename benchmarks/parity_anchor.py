"""BASELINE config 1: bitwise parity vs the rebuilt reference binary.

Runs (or reuses) the reference ``msb_64`` with the reconstructed driver
on its own MT19937-64 input stream (seed 42), then sorts the identical
stream with the TPU engine's u64 path and compares:

  - input checksum (sum of keys mod 2^64) — stream identity
  - output checksum — element conservation
  - bitwise equality of the full sorted key sequence

Writes ``benchmarks/parity_anchor.json``.  Usage:

  python benchmarks/parity_anchor.py [logn]        # default 25

The reference hard-codes 64 threads and needs per-thread chunks of >=
128 blocks (msb_64.c:1569, 2266), so logn >= 25.  On this 1-vCPU box
the reference run takes tens of minutes (oversubscribed) — only its
checksums/output matter here, not its speed.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 25
OUT = os.environ.get("OUT", "/tmp/refbench")
DUMP = os.path.join(OUT, f"ref_sorted_{LOGN}.u64")
LOG = os.path.join(OUT, f"ref_run_{LOGN}.log")


def run_reference():
    if os.path.exists(DUMP):
        print(f"reusing {DUMP}")
        return
    env = dict(os.environ, REF_DUMP=DUMP, OUT=OUT)
    script = os.path.join(REPO, "benchmarks", "baseline_reference.sh")
    with open(LOG, "w") as f:
        subprocess.run(["bash", script, str(LOGN)], env=env, stdout=f,
                       stderr=subprocess.STDOUT, check=True)
    print(open(LOG).read())


def main():
    run_reference()
    n = 1 << LOGN

    from inplacemsdradixsort_tpu.utils import rng as _rng
    keys = _rng.uniform_u64(42, n)
    checksum_in = int(np.sum(keys.astype(np.uint64),
                             dtype=np.uint64))

    ref_sorted = np.fromfile(DUMP, dtype=np.uint64)
    assert len(ref_sorted) == n, (len(ref_sorted), n)

    import jax
    import jax.numpy as jnp
    import inplacemsdradixsort_tpu as rs

    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    from inplacemsdradixsort_tpu.ops import engine_v4
    out_hi, rest = engine_v4.sort_v4(jnp.asarray(hi), (jnp.asarray(lo),))
    ours = ((np.asarray(out_hi).astype(np.uint64) << np.uint64(32))
            | np.asarray(rest[0]).astype(np.uint64))

    checksum_out = int(np.sum(ours, dtype=np.uint64))
    bitwise = bool(np.array_equal(ours, ref_sorted))
    res = {
        "config": "BASELINE-1 parity anchor",
        "logn": LOGN,
        "n": n,
        "backend": str(jax.devices()[0]),
        "checksum_in": checksum_in,
        "checksum_out": checksum_out,
        "checksums_equal": checksum_in == checksum_out,
        "bitwise_equal_vs_reference": bitwise,
    }
    path = os.path.join(REPO, "benchmarks", "parity_anchor.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    assert res["checksums_equal"] and bitwise, res


if __name__ == "__main__":
    main()
