"""Per-phase profile of the v5 in-place engine on the real chip.

Re-drives engine_v5._sort_v5_core step by step (same tables, same
kernels) with a device sync around every dispatch, so each phase's true
cost is visible — the v5 analog of profile_v4_stages.py (VERDICT r4
weak 2: v5 was 37% slower than v4 with no committed phase profile).

Phases: wput (W assembly), stats fetch, hist1 sweep + fetch, seqroute
(in-place L1 partition), block permute, per-batch hist2 prechecks,
per-batch route+terminal, extract.

Usage:  python benchmarks/profile_v5_stages.py [logn] [keys|pairs]
"""

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
from inplacemsdradixsort_tpu.ops.engine_v3 import _bias_np
from inplacemsdradixsort_tpu.ops import engine_v4

LOG = lambda *a: print(*a, flush=True)


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[-2:]))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    mode = sys.argv[2] if len(sys.argv) > 2 else "keys"
    n = 1 << logn
    pairs = mode == "pairs"
    nplanes = 2 if pairs else 1
    cfg = SortConfig(engine="v5")
    LOG(f"v5 stage profile 2^{logn} {mode} on {jax.devices()[0]}")

    with jax.enable_x64(False):
        g = ev5._v5_geometry(n, nplanes, cfg)
        LOG(f"geometry: rmax={g.rmax} pitch1={g.pitch1} "
            f"cap_rows={g.cap_rows} w_rows={g.w_rows} "
            f"nblocks={g.nblocks} ntiles1={g.ntiles1}")

        from inplacemsdradixsort_tpu.ops.kernels_v5 import (
            block_permute, seqroute_level)

        @jax.jit
        def _seq(w, meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl):
            return seqroute_level(
                w, meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl,
                g.ntiles1 + 1, g.pitch1, g.rmax, nlex=nplanes - 1,
                bias_input=True)

        @jax.jit
        def _perm(w, sched):
            return block_permute(w, sched)

        def once():
            k = jax.jit(lambda s: jax.random.bits(s, (n,), jnp.uint32))(
                jax.random.key(0))
            planes = (k, k) if pairs else (k,)
            _sync(k)
            return _once(planes)

        def _once(planes):
            t0 = time.perf_counter()
            w = ev5._step_wzero(g=g, nplanes=nplanes)
            w = ev5._step_wput(w, planes, jnp.int32(0))
            _sync(w)
            t_wput = time.perf_counter() - t0
            del planes

            t0 = time.perf_counter()
            stats = np.asarray(jax.device_get(
                ev5._step_stats(w, g=g, salt=0)))
            t_stats = time.perf_counter() - t0
            rows = max(n // 128, 1)
            neff = max(1, min(g.ssz, rows))
            S = min(n, g.ssz) if (rows <= 1 or neff >= rows) else neff
            plan = ev5._v5_plan(stats, S, nplanes, cfg, g.nb_want, g.rmax)

            l1b = jnp.asarray(_bias_np(plan.l1_bounds_u.astype(np.uint32)))
            meta1 = np.zeros(((g.ntiles1 + 1) * 3,), np.int32)
            for t in range(g.ntiles1):
                meta1[t * 3 + 1] = t * g.pitch1
                meta1[t * 3 + 2] = min(n - t * g.pitch1 * 128, g.pitch1 * 128)
            t0 = time.perf_counter()
            hist1 = ev5._step_hist1(w, jnp.asarray(meta1), l1b, g=g,
                                    interpret=False)
            h = np.asarray(jax.device_get(hist1)).astype(np.int64)
            t_hist1 = time.perf_counter() - t0

            t0 = time.perf_counter()
            (meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl, cnt, nblk, Fbase,
             src) = ev5._seqroute_tables(h, g, plan)
            sched = ev5.permute_schedule(src)
            batches, bg = ev5._plan_batches(g, plan, nblk, cfg.v5_batch_frac)
            t_tables = time.perf_counter() - t0
            LOG(f"host tables: {t_tables*1e3:7.1f} ms  "
                f"(sched {sched.shape}, {len(batches)} batches, "
                f"s_rows={bg.s_rows})")

            # split seqroute and permute into separate dispatches
            t0 = time.perf_counter()
            w = _seq(w, jnp.asarray(meta5), jnp.asarray(cnt_tbl),
                     jnp.asarray(base_tbl), jnp.asarray(slot_tbl),
                     jnp.asarray(padv_tbl))
            _sync(w)
            t_seq = time.perf_counter() - t0
            t0 = time.perf_counter()
            w = _perm(w, jnp.asarray(sched))
            _sync(w)
            t_perm = time.perf_counter() - t0

            t_h2 = t_b = 0.0
            out_base = 0
            tbls, h2s = [], []
            for batch in batches:
                tbl = {kk: jnp.asarray(v) for kk, v in ev5._batch_tables(
                    g, plan, bg, batch, nblk, Fbase, cnt,
                    out_base).items()}
                t0 = time.perf_counter()
                h2, ov = ev5._step_hist2(w, tbl, g=g, bg=bg,
                                         interpret=False)
                _sync(h2)
                t_h2 += time.perf_counter() - t0
                tbls.append(tbl)
                h2s.append(h2)
                out_base += int(sum(int(cnt[gi]) for gi in batch))
            for h2, tbl in zip(h2s, tbls):
                t0 = time.perf_counter()
                w = ev5._step_batch(w, h2, tbl, g=g, bg=bg,
                                    nlex=nplanes - 1, interpret=False,
                                    nclasses=cfg.term_classes)
                _sync(w)
                t_b += time.perf_counter() - t0

            t0 = time.perf_counter()
            final = w          # raw extraction is the identity (see engine)
            _sync(final)
            t_ex = time.perf_counter() - t0

            return [
                ("wput (W assembly)", t_wput), ("stats fetch", t_stats),
                ("hist1 sweep+fetch", t_hist1), ("host tables", t_tables),
                ("seqroute (L1 in-place)", t_seq),
                ("block permute", t_perm),
                (f"hist2 prechecks x{len(batches)}", t_h2),
                (f"batch route+terminal x{len(batches)}", t_b),
                ("extract (raw)", t_ex),
            ]

        LOG("cold (compile-laden) pass:")
        for name, tt in once():
            LOG(f"  {name:<32} {tt*1e3:8.1f} ms")
        rows_t = once()                      # warm: true step costs
        total = sum(t for _, t in rows_t)
        LOG("warm pass:")
        for name, tt in rows_t:
            LOG(f"  {name:<32} {tt*1e3:8.1f} ms  {100*tt/total:5.1f}%")
        LOG(f"  {'TOTAL (sum of synced steps)':<32} {total*1e3:8.1f} ms  "
            f"({n/total/1e9:.3f} Gkeys/s incl. sync overhead)")


if __name__ == "__main__":
    main()
