"""CPU-side replication of the L1 plan + route address math for the
zipf075@2^28 crash input: computes the device planner's tables with
jax-on-CPU, the exact per-(tile,range) histogram with numpy, and then
checks every invariant the route kernel's DMA math depends on."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # the axon plugin ignores
assert jax.devices()[0].platform == "cpu"   # the env var alone
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.models import distributions as dist
from inplacemsdradixsort_tpu.ops import engine_v4 as ev
from inplacemsdradixsort_tpu.ops.kernels_v4 import CHUNK_ROWS, LANES


def main():
    n = 1 << 28
    cfg = SortConfig()
    keys = np.asarray(
        dist.make("zipf075", jax.random.key(0), n, dtype=jnp.uint32)
    )
    g = ev._dev_geometry(n, 1, cfg)
    print(f"geom: rmax={g.rmax} pitch={g.pitch} ntiles1={g.ntiles1} "
          f"arena1={g.arena1_rows} two_level={g.two_level} "
          f"cap={g.cap_rows}", flush=True)

    tb = {k: np.asarray(v) for k, v in
          ev._plan_tables_dev(jnp.asarray(keys), g, 0).items()}
    l1b = tb["l1_bounds"].astype(np.int64)
    l2b = tb["l2_bounds"].astype(np.int64)
    drop1 = tb["drop1"]
    print("l1 bounds monotone:", bool(np.all(np.diff(l1b) >= 0)))
    for gi in range(g.rmax):
        row = l2b[gi]
        if not np.all(np.diff(row) >= 0):
            print(f"l2 row {gi} NON-MONOTONE: {row[:12]}...")
    # exact per-tile hist via searchsorted on biased keys
    biased = (keys.astype(np.int64) - 0x80000000).astype(np.int64)
    rows_in = g.ntiles1 * g.pitch
    pad = rows_in * LANES - n
    flat = np.concatenate(
        [biased, np.full(pad, np.int64(0x7FFFFFFF))])
    hist = np.zeros((g.ntiles1, g.rmax), np.int64)
    for t in range(g.ntiles1):
        seg = np.sort(flat[t * g.pitch * LANES: (t + 1) * g.pitch * LANES])
        nelems = min(n - t * g.pitch * LANES, g.pitch * LANES)
        seg = seg[:nelems] if nelems < len(seg) else seg
        pos = np.searchsorted(seg, l1b, side="right")
        pos = np.minimum(pos, nelems)
        hist[t] = np.diff(np.concatenate([[0], pos]))
    print("hist min:", hist.min(), "sum==n:", hist.sum() == n)

    # replicate _level_tables
    keep = 1 - drop1
    pads = (-hist) % LANES
    rrows = (hist + pads) // LANES
    stored = rrows * keep[None, :]
    rows_c = stored.sum(0)
    alloc = rows_c + CHUNK_ROWS
    start = np.concatenate([[0], np.cumsum(alloc)[:-1]])
    excl = np.cumsum(stored, 0) - stored
    dst = np.where(keep[None, :] != 0, start[None, :] + excl, -1)

    # kernel store-address envelope
    worst_end = 0
    for t in range(g.ntiles1):
        row0 = 0
        for d in range(g.rmax):
            cnt = hist[t, d]
            rr = (cnt + LANES - 1) // LANES
            if dst[t, d] >= 0 and rr > 0:
                nch = (rr + CHUNK_ROWS - 1) // CHUNK_ROWS
                end = dst[t, d] + nch * CHUNK_ROWS
                worst_end = max(worst_end, end)
            row0 += rr
        if row0 > g.pitch + g.rmax:
            print(f"tile {t}: row0 {row0} exceeds sort buffer "
                  f"{g.pitch + g.rmax}")
    print(f"worst store end row: {worst_end} vs arena1 {g.arena1_rows} "
          f"-> {'OK' if worst_end <= g.arena1_rows else 'OOB!!'}")
    tot = rows_c.sum() + g.rmax * CHUNK_ROWS
    print(f"packed rows: {tot} (rows_in {rows_in})")


if __name__ == "__main__":
    main()
