"""Deep-key pass planning: recursion into lower key planes.

The reference plans radix passes over the FULL remaining key width
(``schedule_passes``, /root/reference/src/msb_64.c:1334-1400) and its
recursive driver re-partitions any oversized bucket by lower bits
(``local_radixsort``, :1007-1035).  The v4/v5 engines bound every final
bucket by 32-bit plane-0 bounds, so adversarial multi-plane inputs —
u64 keys with few distinct hi words, or a heavy key value in pairs mode
(payload must ride, so the keys-only value-fill isolation cannot apply)
— produce terminal buckets that NO plane-0 refinement can shrink: the
retry ladder used to end in a whole-array XLA fallback.

``deep_sort`` is that missing recursion tier, built from the existing
level kernels (everything stays exact and linear — no comparator sort
over the whole array):

1. sample plane 0, duplicate-aware equal-depth bounds with heavy values
   isolated into single-value buckets (``extract_delimiters`` + the
   v-1 shift, msb_64.c:1304-1322) — ONE partition level, <= RMAX wide;
2. ``hist_level`` exact counts (one small fetch) -> ``route_level`` into
   a packed arena -> ``splice_runs`` back to a dense element-exact
   layout: every bucket now occupies a host-known contiguous span (the
   ``inject`` role, msb_64.c:1278-1302);
3. per bucket: a single-value bucket drops its constant plane and
   re-enters the engine keyed by the NEXT plane (the pass over the next
   lower bits: a u64 hi-word bucket sorts by lo, a heavy pairs bucket
   sorts by rid); mixed buckets re-enter the engine whole (strictly
   smaller n).  Slices are padded to coarse size classes with +inf
   tuples (they sort to the tail and are cut) to bound recompilation.

Progress is guaranteed: a non-heavy bucket carries ~1/32 of the mass,
and a heavy bucket loses a plane; ``deep_depth`` caps pathological
sample noise with a bucket-local XLA fallback (never whole-array).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import PhaseTimer
from .engine_v3 import (_bias_np, _ceil_div, _shape_class,
                        _quantile_bounds)
from .kernels_v4 import (CHUNK_ROWS, LANES, LCH, hist_level, route_level,
                         splice_runs)

RMAX = 96                 # one wide level; nb is clamped to this
                          # (shrunk to sort_rows//2 for tiny test
                          # geometries so pitch stays positive)
NBQ = 256                 # quantile candidates (4x the ~32 bucket target)
MAX_DEEP_DEPTH = 3


NRUNS_MAX = 12288         # splice scalar-prefetch budget: nruns*8 i32
                          # rows must stay well under the 1 MiB SMEM
                          # (the 2^27 zipf parity cell aborted the TPU
                          # compiler with a 3.4 MB prefetched operand)


def _deep_geometry(n: int, sort_rows: int):
    """Pick (sort_rows, rmax) for the one-wide deep level so the
    (bucket, tile) splice table fits the SMEM prefetch budget: grow the
    tile (fewer tiles) first, then shed level width (wider buckets just
    re-enter the engine on a strictly smaller slice)."""
    rows = max(_ceil_div(n, LANES), 1)
    while True:
        rmax = min(RMAX, sort_rows // 2)
        ntiles = _ceil_div(rows, sort_rows - rmax)
        if ntiles * rmax <= NRUNS_MAX or sort_rows >= 8192:
            break
        sort_rows *= 2
    rmax = min(rmax, max(NRUNS_MAX // ntiles, 8))
    return sort_rows, rmax


def _deep_bounds(stats: np.ndarray, S: int, rmax: int):
    """<= rmax inclusive-upper bounds with heavy plane-0 values isolated
    as single-value buckets.  Thins non-essential bounds if the set
    pushes past rmax (heavy + isolation bounds always survive)."""
    heavy_frac = max(1.0 / 32, 12.0 / max(S, 1))
    bounds, _, is_heavy = _quantile_bounds(
        stats[0].view(np.uint32), stats[1], stats[2], S, heavy_frac,
        cap_frac=1.0 / 32,
    )
    if len(bounds) > rmax:
        lo = np.concatenate([[-1], bounds[:-1].astype(np.int64)])
        iso = np.concatenate([is_heavy[1:], [False]])  # bound before heavy
        keep = is_heavy | iso | (bounds.astype(np.int64) == lo + 1)
        keep[-1] = True
        free = np.flatnonzero(~keep)
        room = rmax - int(keep.sum())
        if room > 0 and len(free):
            step = _ceil_div(len(free), room)
            keep[free[step - 1::step][:room]] = True
        bounds = bounds[keep]
    assert len(bounds) <= rmax, len(bounds)
    lo = np.concatenate([[-1], bounds[:-1].astype(np.int64)])
    single = bounds.astype(np.int64) == lo + 1
    return bounds, single


@functools.partial(
    jax.jit,
    static_argnames=("n", "pitch", "ntiles", "rmax", "arena_rows",
                     "dense_rows", "interpret"),
)
def _deep_hist(key_plane, meta, bounds_b, *, n, pitch, ntiles, rmax,
               arena_rows, dense_rows, interpret):
    return hist_level(_to2d(key_plane, ntiles * pitch, n), meta,
                      bounds_b, ntiles, pitch, rmax, bias_input=True,
                      interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("n", "nplanes", "pitch", "ntiles", "rmax",
                     "arena_rows", "dense_rows", "interpret"),
)
def _deep_regroup(planes, meta, bounds_b, hist, dst, btbl, *, n, nplanes,
                  pitch, ntiles, rmax, arena_rows, dense_rows, interpret):
    """route -> splice: dense element-exact layout grouped by bucket."""
    planes2d = tuple(_to2d(p, ntiles * pitch, n) for p in planes)
    padv = jnp.broadcast_to(bounds_b[None, :], (ntiles, rmax))
    arena = route_level(
        planes2d, meta, hist, dst, padv, arena_rows, ntiles, pitch,
        rmax, nlex=nplanes - 1, bias_input=True, interpret=interpret,
    )
    dense = splice_runs(arena, btbl, dense_rows, max_occ=pitch,
                        unbias_output=True, interpret=interpret)
    return tuple(
        jax.lax.bitcast_convert_type(p.reshape(-1)[:n], jnp.uint32)
        for p in dense
    )


def _to2d(p, rows_in, n):
    x = (jax.lax.bitcast_convert_type(p, jnp.int32)
         if p.dtype != jnp.int32 else p)
    pad = rows_in * LANES - n
    return jnp.concatenate(
        [x, jnp.zeros((pad,), jnp.int32)]).reshape(rows_in, LANES)


def _pad_to_class(planes, cnt: int):
    """Pad every plane to a coarse size class with +inf tuples (raw
    0xFFFFFFFF on every plane), bounding engine recompilation across
    bucket sizes.  Pads tie-or-exceed every real tuple, so they sort to
    the tail and the caller cuts [:cnt]."""
    m = _shape_class(max(cnt, LANES))
    padn = m - cnt
    if padn == 0:
        return planes
    tail = jnp.full((padn,), np.uint32(0xFFFFFFFF), jnp.uint32)
    return tuple(jnp.concatenate([p, tail]) for p in planes)


def deep_sort(
    keys: jax.Array,
    vals: Tuple[jax.Array, ...],
    cfg: Optional[SortConfig] = None,
    timer: Optional[PhaseTimer] = None,
    deep_depth: int = 0,
):
    """Sort (key, *vals) lexicographically when plane-0 refinement is
    exhausted (see module docstring).  Same contract as sort_v4."""
    from . import engine_v4

    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    n = int(keys.shape[0])
    nplanes = 1 + len(vals)
    if nplanes == 1 or n <= LANES or deep_depth >= MAX_DEEP_DEPTH:
        return engine_v4._xla_fallback(keys, vals)
    engine_v4.FALLBACK_STATS["deep"] += 1
    planes = (keys,) + tuple(vals)
    interp = cfg.interpret

    sort_rows, rmax = _deep_geometry(n, cfg.v3_sort_rows)
    if cfg.interpret:
        # interpreter mode pays python per unrolled kernel lane: a
        # 96-wide level is minutes of tracing on the CPU suite; a
        # 16-wide level recurses one step deeper instead
        rmax = min(rmax, 16)
    with timer.phase("sample"):
        ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap, n))
        stats = np.asarray(jax.device_get(engine_v4._sample_stats(
            keys, ssz=ssz, nbq=NBQ, salt=16 + deep_depth)))
        rows = max(n // LANES, 1)
        neff = max(1, min(ssz, rows))
        S = min(n, ssz) if (rows <= 1 or neff >= rows) else neff
        bounds, single = _deep_bounds(stats, S, rmax)
        nb = len(bounds)
        bounds_np = np.full((rmax,), np.int32(0x7FFFFFFF), np.int32)
        bounds_np[:nb] = _bias_np(bounds)
        bounds_b = jnp.asarray(bounds_np)

    # one exact partition level + dense regrouping
    with timer.phase("part_blocks"):
        pitch = sort_rows - rmax
        assert pitch > 0, (sort_rows, rmax)
        ntiles = _ceil_div(_ceil_div(n, LANES), pitch)
        arena_rows = _shape_class(
            _ceil_div(n, LANES) + ntiles * rmax + rmax * CHUNK_ROWS
            + max(pitch, CHUNK_ROWS) + CHUNK_ROWS)
        dense_rows = _ceil_div(n, LANES) + LCH + 1
        meta_np = np.zeros(((ntiles + 1) * 3,), np.int32)
        for t in range(ntiles):
            meta_np[t * 3 + 1] = t * pitch
            meta_np[t * 3 + 2] = min(n - t * pitch * LANES,
                                     pitch * LANES)
        meta = jnp.asarray(meta_np)
        geom = dict(n=n, pitch=pitch, ntiles=ntiles, rmax=rmax,
                    arena_rows=arena_rows, dense_rows=dense_rows,
                    interpret=interp)
        h = np.asarray(jax.device_get(_deep_hist(
            planes[0], meta, bounds_b, **geom))).astype(np.int64)
        assert int(h.sum()) == n, (int(h.sum()), n)

        # host tables: packed arena destinations + (bucket, tile) splice
        rrows = (h + ((-h) % LANES)) // LANES
        rows_c = rrows.sum(0)
        alloc = rows_c + CHUNK_ROWS
        start = np.concatenate([[0], np.cumsum(alloc)[:-1]])
        excl = np.cumsum(rrows, 0) - rrows
        dst = (start[None, :] + excl).astype(np.int32)
        src_row = dst.T.reshape(-1)
        occ = rrows.T.reshape(-1).astype(np.int32)
        real = h.T.reshape(-1).astype(np.int32)
        out_off = (np.cumsum(real) - real).astype(np.int32)
        z = np.zeros_like(real)
        btbl = np.stack([src_row, occ, real, z, z, out_off, z, z],
                        axis=1)
        dense = _deep_regroup(
            planes, meta, bounds_b, jnp.asarray(h.astype(np.int32)),
            jnp.asarray(dst), jnp.asarray(btbl), nplanes=nplanes, **geom)

    # per-bucket recursion at host-known offsets
    with timer.phase("local_sort"):
        cnt = h.sum(0)
        off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        out_parts = [[] for _ in range(nplanes)]
        for b in range(nb):
            c = int(cnt[b])
            if c == 0:
                continue
            o = int(off[b])
            sl = tuple(p[o: o + c] for p in dense)
            if c <= LANES:
                parts = tuple(jax.lax.sort(sl, num_keys=nplanes))
            elif single[b]:
                # single plane-0 value: recurse keyed by the next plane
                sub = _pad_to_class(sl[1:], c)
                sk, sv = _engine_entry(sub[0], sub[1:], cfg, timer,
                                       deep_depth)
                parts = (jnp.full((c,), np.uint32(bounds[b]),
                                  jnp.uint32),
                         sk[:c]) + tuple(v[:c] for v in sv)
            else:
                sub = _pad_to_class(sl, c)
                sk, sv = _engine_entry(sub[0], sub[1:], cfg, timer,
                                       deep_depth)
                parts = (sk[:c],) + tuple(v[:c] for v in sv)
            for p in range(nplanes):
                out_parts[p].append(parts[p])
        outs = tuple(
            jnp.concatenate(out_parts[p]) if len(out_parts[p]) > 1
            else out_parts[p][0]
            for p in range(nplanes)
        )
        timer.sync(outs[0])
        if n:
            jax.device_get(outs[0][-1:])
    return outs[0], tuple(outs[1:])


def _engine_entry(keys, vals, cfg, timer, deep_depth):
    """Bucket re-entry: the ordinary engine ladder, whose own exhausted
    retries recurse back into deep_sort one level deeper."""
    from . import engine_v4
    return engine_v4.sort_v4(keys, vals, cfg, timer,
                             _deep_depth=deep_depth + 1)
