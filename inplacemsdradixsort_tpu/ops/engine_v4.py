"""v4 engine: exact-histogram-planned, device-resident MSD range sort.

Pipeline (the reference ``sort_thread`` P1-P12,
/root/reference/src/msb_64.c:1477-2259, re-shaped around exact counting):

1. SAMPLE (device) + PLAN (host): equal-depth duplicate-aware bounds
   (``extract_delimiters``, msb_64.c:1304-1322) and the two-level range
   grouping.  The plan carries *bounds only* — no capacity estimates, no
   ``fudge``: unlike v3 (and the reference, which aborts on insufficient
   fudge, README.md:27-29), level arenas cannot overflow.
2. Per level: ``hist_level`` sweep (exact per-(tile, range) counts, the
   ``histogram`` analog, msb_64.c:701-738) + XLA prefix sums that turn
   counts into exact per-(tile, range) destination rows and phantom-pad
   values (the deterministic replacement for atomic block claiming,
   msb_64.c:2027,2056) + ``route_level`` (sort tiles in VMEM, DMA
   row-aligned runs to their precomputed destinations).
3. TERMINAL (``terminal_write``): per final bucket, in-VMEM sort + trim +
   exact-position splice (local sort P12 + inject P11).

The only overflow left is a terminal bucket exceeding the static VMEM
capacity class — detected in-jit from the exact counts, fetched with the
result; the engine retries with finer buckets and a fresh sample seed,
then falls back to XLA.

Value planes: ``vals`` is a tuple of 0..2 uint32 planes carried alongside
the keys (rids, or (hi, lo) words of u64 rids/keys).  Ordering is
lexicographic by (key, *vals) — a stable key sort when vals[0] is the
original index, a full u64 sort when the planes are (hi, lo) words.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import PhaseTimer
from .engine_v3 import (_quantile_bounds, _bias_np, _ceil_div,
                        _shape_class, _pack_tables, _unpack)
from .kernels_v4 import (LANES, CHUNK_ROWS, hist_level, route_level,
                         terminal_write)

U32_MAX = np.uint32(0xFFFFFFFF)

# ---- engine-path observability (the probe contract for the adaptive
# scheduler: no adversarial input class at production sizes may reach
# the whole-array XLA fallback; tests/probes assert on these counters)
FALLBACK_STATS = {"small_n": 0, "plan": 0, "overflow": 0, "retry": 0,
                  "deep": 0}


def reset_fallback_stats() -> None:
    for k in FALLBACK_STATS:
        FALLBACK_STATS[k] = 0


# ============================================================== sample

def _stats_of_sorted(s: jax.Array, nbq: int):
    """Equal-depth quantile picks with left/right ranks from a sorted
    uint32 sample ``s`` (a few KB fetched, not the sample)."""
    S = s.shape[0]
    pos = np.clip(
        (np.arange(1, nbq + 1, dtype=np.int64) * S) // nbq - 1, 0, S - 1
    ).astype(np.int32)
    picks = jnp.take(s, jnp.asarray(pos))
    picks = picks.at[-1].set(jnp.uint32(0xFFFFFFFF))
    left = jnp.searchsorted(s, picks, side="left").astype(jnp.int32)
    right = jnp.searchsorted(s, picks, side="right").astype(jnp.int32)
    picks_i = jax.lax.bitcast_convert_type(
        picks.astype(jnp.uint32), jnp.int32
    )
    return jnp.stack([picks_i, left, right])


@functools.partial(jax.jit, static_argnames=("ssz", "nbq", "salt"))
def _sample_stats(keys: jax.Array, *, ssz: int, nbq: int, salt: int):
    """Element-granular random sample -> sorted -> equal-depth quantile
    picks with left/right ranks (a few KB fetched, not the sample).

    ``salt`` folds the retry depth into the PRNG key so a retry draws a
    *fresh* sample (the reference reseeds per thread/run,
    msb_64.c:1511-1521; v3's size-only seed meant retries re-drew the
    identical sample)."""
    n = keys.shape[0]
    rows = max(n // LANES, 1)
    neff = max(1, min(ssz, rows))
    if rows <= 1 or neff >= rows:
        s = jnp.sort(keys[: min(n, ssz)])
    else:
        key = jax.random.key((n & 0xFFFFFF) ^ (salt * 2654435761 & 0x7FFFFFFF))
        idx = jax.random.randint(key, (neff,), 0, rows, dtype=jnp.int32)
        picked = jnp.take(
            keys[: rows * LANES].reshape(rows, LANES), idx, axis=0
        )
        lane = (idx * 89 + jnp.arange(neff, dtype=jnp.int32) * 37) % LANES
        s = jnp.sort(
            jnp.take_along_axis(picked, lane[:, None], axis=1).reshape(-1)
        )
    return _stats_of_sorted(s, nbq)


# ============================================================== plan

@dataclasses.dataclass
class _PlanV4:
    """Host-side static structure: geometry + bound tables (no caps)."""
    n: int
    nplanes: int
    prefix_bits: int          # constant top bits per final bucket (hybrid
                              # radix delimiters; 0 = sample-only bounds)
    rmax: int
    pitch: int
    sort_rows: int
    cap_rows: int
    two_level: bool
    ntiles1: int
    t2max: int
    arena1_rows: int
    arena2_rows: int
    out_rows: int
    nb_total: int
    # packed tables (all int32)
    l1_meta: np.ndarray       # ((ntiles1+1)*3,)
    l1_bounds: np.ndarray     # (rmax,) biased
    l2_bounds: np.ndarray     # (rmax, rmax) biased
    group_len: np.ndarray     # (rmax,)
    drop1: np.ndarray         # (rmax,) 1 = heavy value dropped at L1
    drop2: np.ndarray         # (rmax*rmax,) 1 = dropped at L2
    term_child: np.ndarray    # (nb_total,) child idx or -1-gi for L1 drop
    term_mode: np.ndarray     # (nb_total,) 0 sort / 1 value-fill
    term_fill: np.ndarray     # (nb_total,) biased fill value
    term_valid: np.ndarray    # (nb_total,) 0/1


def _geometry(n: int, nplanes: int, cfg: SortConfig):
    if cfg.v3_cap_rows:
        cap_rows = cfg.v3_cap_rows
    else:
        cap_rows = 1024 if nplanes == 1 else 512
        if n >= (1 << 28):
            cap_rows *= 2
    target = int(cap_rows * LANES * 0.80)
    nb_want = max(1, _ceil_div(n, target))
    return cap_rows, nb_want


def _bounds_hybrid(stats: np.ndarray, S: int, nb_want: int,
                   cfg: SortConfig):
    """Duplicate-aware equal-depth bounds merged with radix-equidistant
    delimiters — the hybrid delimiter set (msb_64.c:1545-1564).  Every
    final bucket then lies inside one radix cell — the constant-top-bits
    invariant (asserted msb_64.c:2190-2192) — bounding bucket key-width
    against sample misses and letting local passes ignore the fixed
    prefix (the 58-bit trick, :2242).  Shared by the v4 and v5 planners.

    Returns (bounds uint32 ascending incl. 0xFFFFFFFF, is_heavy bool,
    prefix_bits).

    The heavy threshold is CAPACITY-TIED: a bucket targets ~n/nb_want
    elements (~0.8x the terminal cap), so any value above 0.3/nb_want of
    the mass (~1/4 of the cap) is isolated + value-filled.  A fixed
    floor here (r3 used max(..., 0.002)) breaks at scale: a value with
    true count between the XL capacity (2*cap*128) and floor*n is
    neither isolated nor fits any bucket -> guaranteed overflow ->
    retries can never fix it (the floor persists) -> whole-array
    fallback, or worse (zipf075 @ 2^27/2^28, BENCH r4 bisect).  The
    only floor kept is sample-noise (>= 12 hits)."""
    heavy_frac = max(0.3 / nb_want, 12.0 / max(S, 1))
    bounds, est, is_heavy = _quantile_bounds(
        stats[0].view(np.uint32), stats[1], stats[2], S, heavy_frac,
        cap_frac=1.0 / nb_want,
    )
    prefix_bits = 0
    if cfg.use_sample_splitters and nb_want >= 16:
        prefix_bits = min(8, max(2, int(math.log2(nb_want // 4))))
        nrad = 1 << prefix_bits
        shift = 32 - prefix_bits
        rad = ((np.arange(1, nrad + 1, dtype=np.uint64) << shift)
               - np.uint64(1))
        heavy_set = set(bounds[is_heavy].astype(np.uint64).tolist())
        merged = np.unique(
            np.concatenate([bounds.astype(np.uint64), rad])
        )
        lo = np.concatenate([[-1], merged[:-1].astype(np.int64)])
        is_heavy = np.array(
            [int(v) in heavy_set and int(v) == int(l) + 1
             for v, l in zip(merged, lo)], bool,
        )
        bounds = merged.astype(np.uint32)
    return bounds, is_heavy, prefix_bits


def make_plan_v4(n: int, stats: np.ndarray, S: int, nplanes: int,
                 cfg: SortConfig, nb_mult: float = 1.0,
                 force_two_level: bool = False,
                 nb_total_min: int = 1) -> _PlanV4:
    """Build the host-side plan.  ``force_two_level``/``nb_total_min``
    pin the static geometry so per-shard plans built from different
    stats stay shape-compatible under one SPMD program (dsort)."""
    cap_rows, nb_want = _geometry(n, nplanes, cfg)
    nb_want = max(1, int(nb_want * nb_mult))
    keys_only = nplanes == 1
    bounds, is_heavy, prefix_bits = _bounds_hybrid(stats, S, nb_want, cfg)
    nb = len(bounds)
    rmax = cfg.v3_rmax or (
        32 if nb <= 1024 else (
            48 if nb <= 2304 else (64 if nb <= 4096 else 96))
    )
    if nb > rmax * rmax:
        raise ValueError(f"too many buckets {nb} for topology")

    two_level = nb > rmax or force_two_level
    per = _ceil_div(nb, rmax) if two_level else 1
    groups = [
        list(range(i, min(i + per, nb))) for i in range(0, nb, per)
    ]
    return _plan_from_groups(
        n, nplanes, cfg, cap_rows, keys_only, bounds, is_heavy, groups,
        rmax, prefix_bits, two_level, nb_total_min)


def _plan_from_groups(n, nplanes, cfg, cap_rows, keys_only, bounds,
                      is_heavy, groups, rmax, prefix_bits, two_level,
                      nb_total_min) -> _PlanV4:
    sort_rows = cfg.v3_sort_rows
    pitch = sort_rows - rmax
    assert pitch > 0, (sort_rows, rmax)
    ng = len(groups)
    rows_in = _ceil_div(n, LANES)
    ntiles1 = _ceil_div(rows_in, pitch)

    # ---- L1 meta / bounds
    l1_meta = np.zeros(((ntiles1 + 1) * 3,), np.int32)
    for t in range(ntiles1):
        l1_meta[t * 3 + 0] = 0
        l1_meta[t * 3 + 1] = t * pitch
        l1_meta[t * 3 + 2] = min(n - t * pitch * LANES, pitch * LANES)
    l1_bounds_u = np.full(rmax, int(U32_MAX), np.uint64)
    for gi, g in enumerate(groups):
        l1_bounds_u[gi] = bounds[g[-1]]

    # ---- L2 bounds per group; drop flags; terminal tables
    l2_bounds_u = np.full((rmax, rmax), int(U32_MAX), np.uint64)
    drop1 = np.zeros(rmax, np.int32)
    drop2 = np.zeros(rmax * rmax, np.int32)
    term_child, term_mode, term_fill = [], [], []
    for gi, g in enumerate(groups):
        if keys_only and len(g) == 1 and bool(is_heavy[g[0]]):
            # heavy single-value group: never stored, value-filled at the
            # terminal from its exact L1 count (msb_64.c:1313-1320 analog)
            drop1[gi] = 1
            l2_bounds_u[gi, :] = bounds[g[0]]
            term_child.append(-1 - gi)
            term_mode.append(1)
            term_fill.append(int(bounds[g[0]]))
            continue
        for sj, j in enumerate(g):
            # terminal child index: L2-flattened when two levels run,
            # the L1 child itself in one-level mode
            c = gi * rmax + sj if two_level else gi
            l2_bounds_u[gi, sj] = bounds[j]
            if keys_only and is_heavy[j] and len(g) > 1 and two_level:
                drop2[c] = 1
                term_child.append(c)
                term_mode.append(1)
                term_fill.append(int(bounds[j]))
            else:
                term_child.append(c)
                term_mode.append(0)
                term_fill.append(0)
        for sj in range(len(g), rmax):
            l2_bounds_u[gi, sj] = l2_bounds_u[gi, len(g) - 1]
    for gi in range(ng, rmax):
        l2_bounds_u[gi, :] = int(U32_MAX)

    nb_total = max(_shape_class(max(len(term_child), 1)), nb_total_min)
    term_valid = [1] * len(term_child)
    while len(term_child) < nb_total:
        term_child.append(0)
        term_mode.append(0)
        term_fill.append(0)
        term_valid.append(0)

    # ---- static arena bounds (exact packing + pads + chunk gaps)
    nchild2 = rmax * rmax
    rows1_max = rows_in + ntiles1 * rmax          # data + phantom pads
    arena1_rows = _shape_class(
        rows1_max + rmax * CHUNK_ROWS
        + max(pitch, 2 * cap_rows) + CHUNK_ROWS
    )
    t2max = _ceil_div(rows1_max, pitch) + (rmax if two_level else 0)
    t2max = max(t2max, 1)
    rows2_max = rows1_max + t2max * rmax
    arena2_rows = _shape_class(
        rows2_max + nchild2 * CHUNK_ROWS + 2 * cap_rows + CHUNK_ROWS
    ) if two_level else 8
    out_rows = rows_in + 2 * CHUNK_ROWS + 2

    fill_biased = _bias_np(
        np.array(term_fill, np.int64).astype(np.uint32)
    )
    return _PlanV4(
        n=n, nplanes=nplanes, prefix_bits=prefix_bits, rmax=rmax,
        pitch=pitch,
        sort_rows=sort_rows, cap_rows=cap_rows, two_level=two_level,
        ntiles1=ntiles1, t2max=t2max, arena1_rows=arena1_rows,
        arena2_rows=arena2_rows, out_rows=out_rows, nb_total=nb_total,
        l1_meta=l1_meta,
        l1_bounds=_bias_np(l1_bounds_u.astype(np.uint32)),
        l2_bounds=_bias_np(
            l2_bounds_u.reshape(-1).astype(np.uint32)
        ).reshape(rmax, rmax),
        group_len=np.array(
            [max(len(g), 1) for g in groups] + [1] * (rmax - ng),
            np.int32,
        ),
        drop1=drop1,
        drop2=drop2,
        term_child=np.array(term_child, np.int32),
        term_mode=np.array(term_mode, np.int32),
        term_fill=fill_biased,
        term_valid=np.array(term_valid, np.int32),
    )


def _plan_tables(plan: _PlanV4):
    return dict(
        l1_meta=plan.l1_meta, l1_bounds=plan.l1_bounds,
        l2_bounds=plan.l2_bounds, group_len=plan.group_len,
        drop1=plan.drop1, drop2=plan.drop2,
        term_child=plan.term_child, term_mode=plan.term_mode,
        term_fill=plan.term_fill, term_valid=plan.term_valid,
    )


# ===================================================== device planner

BIAS_I = np.int32(-0x80000000)
SENT_I = np.int32(0x7FFFFFFF)


@dataclasses.dataclass(frozen=True)
class _GeomV4:
    """Static geometry for the device-planned pipeline — shapes only;
    every data-dependent quantity lives in on-device tables."""
    n: int
    nplanes: int
    rmax: int
    pitch: int
    sort_rows: int
    cap_rows: int
    ntiles1: int
    t2max: int
    arena1_rows: int
    arena2_rows: int
    out_rows: int
    ssz: int
    S: int
    nbq: int
    nrad: int
    prefix_bits: int
    heavy_cnt: int
    cap_S: int
    nb_want: int
    two_level: bool = True


def _dev_geometry(n: int, nplanes: int, cfg: SortConfig,
                  nb_mult: float = 1.0) -> _GeomV4:
    """Static topology from the TARGET bucket count.  The actual bucket
    count is data-dependent and computed on device, bounded by the
    planner's clamp (rmax one-level, rmax^2 two-level).

    Level-count selection is the ``schedule_passes`` analog
    (msb_64.c:1334-1400): when the estimated bucket count fits one
    rmax-wide level with headroom, plan ONE partition sweep + terminal
    instead of two — a full read+sort+write pass saved at small/mid n
    (and for per-shard local sorts).  A retry (nb_mult x2) that outgrows
    the one-level clamp re-plans two-level."""
    cap_rows, nb_want = _geometry(n, nplanes, cfg)
    nb_want = max(16, int(nb_want * nb_mult))
    ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
    ssz = min(ssz, n)
    rows = max(n // LANES, 1)
    neff = max(1, min(ssz, rows))
    S = min(n, ssz) if (rows <= 1 or neff >= rows) else neff
    nbq = 4 * nb_want
    prefix_bits = nrad = 0
    if cfg.use_sample_splitters and nb_want >= 16:
        prefix_bits = min(8, max(2, int(math.log2(max(nb_want // 4, 4)))))
        nrad = 1 << prefix_bits
    est_nb = int(nb_want * 1.3) + nrad + 2
    if cfg.v3_rmax:
        rmax = cfg.v3_rmax
        two_level = est_nb > max(1, (3 * rmax) // 4)
    elif est_nb > 64:
        two_level = True
        rmax = (32 if est_nb <= 1024 else (
            48 if est_nb <= 2304 else (64 if est_nb <= 4096 else 96)))
    else:
        # one-level: every bucket is an L1 range; 1.5x headroom between
        # the estimate and the clamp keeps tail-merge overflows rare
        two_level = False
        rmax = 64 if est_nb <= 42 else 96
    sort_rows = cfg.v3_sort_rows
    pitch = sort_rows - rmax
    assert pitch > 0, (sort_rows, rmax)
    rows_in = _ceil_div(n, LANES)
    ntiles1 = _ceil_div(rows_in, pitch)
    rows1_max = rows_in + ntiles1 * rmax
    arena1_rows = _shape_class(
        rows1_max + rmax * CHUNK_ROWS
        + max(pitch, 2 * cap_rows) + CHUNK_ROWS
    )
    if two_level:
        t2max = max(_ceil_div(rows1_max, pitch) + rmax, 1)
        rows2_max = rows1_max + t2max * rmax
        arena2_rows = _shape_class(
            rows2_max + rmax * rmax * CHUNK_ROWS
            + 2 * cap_rows + CHUNK_ROWS
        )
    else:
        t2max, arena2_rows = 1, 8
    out_rows = rows_in + 2 * CHUNK_ROWS + 2
    # capacity-tied heavy threshold + sample-noise floor — see
    # _bounds_hybrid for why a fixed mass floor cannot be used
    heavy_frac = max(0.3 / nb_want, 12.0 / max(S, 1))
    return _GeomV4(
        n=n, nplanes=nplanes, rmax=rmax, pitch=pitch,
        sort_rows=sort_rows, cap_rows=cap_rows, ntiles1=ntiles1,
        t2max=t2max, arena1_rows=arena1_rows, arena2_rows=arena2_rows,
        out_rows=out_rows, ssz=ssz, S=S, nbq=nbq, nrad=nrad,
        prefix_bits=prefix_bits,
        heavy_cnt=max(1, int(math.ceil(heavy_frac * S))),
        cap_S=max(1, S // nb_want), nb_want=nb_want,
        two_level=two_level,
    )


def _l1_meta_np(g: _GeomV4) -> np.ndarray:
    meta = np.zeros(((g.ntiles1 + 1) * 3,), np.int32)
    for t in range(g.ntiles1):
        meta[t * 3 + 1] = t * g.pitch
        meta[t * 3 + 2] = min(
            g.n - t * g.pitch * LANES, g.pitch * LANES
        )
    return meta


def _plan_tables_dev(keys: jax.Array, g: _GeomV4, salt: int) -> dict:
    """The v4 planner as a traced program on the device-resident sample —
    the reference's splitter phases P1-P3 (msb_64.c:1511-1613) fused into
    the sort program, with no host round-trip.

    Semantics match make_plan_v4: equal-depth duplicate-aware bounds with
    heavy-value isolation (extract_delimiters, msb_64.c:1304-1322) merged
    with radix-equidistant delimiters (:1545-1564), coalesced on a
    cap_frac rank grid (undershooting, so buckets fit the terminal
    capacity), grouped in fixed stride for the two partition levels."""
    stats = _sample_stats(keys, ssz=g.ssz, nbq=g.nbq, salt=salt)
    return _tables_from_stats(stats, g)


def _tables_from_stats(stats, g: _GeomV4, S_dyn=None) -> dict:
    """Bound/terminal tables from quantile stats (see _plan_tables_dev).

    ``S_dyn``: traced effective sample size when the stats come from a
    dynamically-sized window of a shared sample (the dsort overlapped
    path slices the replicated global sample per shard) — the static
    ``g.S``-derived thresholds switch to their traced equivalents."""
    rmax, nbq = g.rmax, g.nbq
    keys_only = g.nplanes == 1
    if S_dyn is None:
        heavy_cnt = jnp.int32(g.heavy_cnt)
        cap_S = jnp.int32(g.cap_S)
        fill_S = jnp.int32(g.S)
    else:
        S_dyn = S_dyn.astype(jnp.int32)
        # heavy_cnt = max(ceil(0.3/nb_want * S), 12, 1) with the 0.3
        # as exact 3/10 integer arithmetic
        heavy_cnt = jnp.maximum(
            (3 * S_dyn + 10 * g.nb_want - 1) // (10 * g.nb_want), 12)
        heavy_cnt = jnp.maximum(heavy_cnt, 1)
        cap_S = jnp.maximum(S_dyn // g.nb_want, 1)
        fill_S = S_dyn
    pv = stats[0] ^ BIAS_I              # biased i32, ascending
    left, right = stats[1], stats[2]
    one_t = jnp.ones((1,), bool)
    first = jnp.concatenate([one_t, pv[1:] != pv[:-1]])
    hv = first & ((right - left) >= heavy_cnt)

    # ---- candidates: picks; v-1 isolation bounds before heavy values
    # (msb_64.c:1313-1320); radix-equidistant bounds (:1559-1563)
    iso_ok = hv & (pv > jnp.int32(BIAS_I))
    vs = [pv, pv - 1]
    rs = [right, left]
    aks = [jnp.zeros((nbq,), bool), iso_ok]     # always-keep
    hvs = [hv, jnp.zeros((nbq,), bool)]
    oks = [first, iso_ok]
    if g.nrad:
        radu = ((np.arange(1, g.nrad + 1, dtype=np.uint64)
                 << np.uint64(32 - g.prefix_bits)) - np.uint64(1))
        radv = jnp.asarray(_bias_np(radu.astype(np.uint32)))
        ridx = jnp.searchsorted(pv, radv, side="right").astype(jnp.int32)
        rrank = jnp.where(
            ridx > 0, jnp.take(right, jnp.clip(ridx - 1, 0, nbq - 1)), 0
        )
        vs.append(radv)
        rs.append(rrank)
        aks.append(jnp.ones((g.nrad,), bool))
        hvs.append(jnp.zeros((g.nrad,), bool))
        oks.append(jnp.ones((g.nrad,), bool))
    v = jnp.concatenate(vs)
    r = jnp.concatenate(rs).astype(jnp.int32)
    a = jnp.concatenate(aks).astype(jnp.int32)
    h = jnp.concatenate(hvs).astype(jnp.int32)
    inval = 1 - jnp.concatenate(oks).astype(jnp.int32)
    NBD = int(v.shape[0])

    # sort by (validity, value, rank); duplicates of one value always
    # carry the same rank, so flags OR over the short dup window below
    inval, v, r, a, h = jax.lax.sort(
        (inval, v, r, a, h), num_keys=3, is_stable=True
    )
    valid = inval == 0
    uniq = valid & jnp.concatenate([one_t, v[1:] != v[:-1]])
    for k in (1, 2):        # dup runs are <= 3 (pick, isolation, radix)
        eq = jnp.concatenate([v[k:] == v[:-k], jnp.zeros((k,), bool)])
        a = a | (jnp.concatenate([a[k:], jnp.zeros((k,), jnp.int32)])
                 * eq)
        h = h | (jnp.concatenate([h[k:], jnp.zeros((k,), jnp.int32)])
                 * eq)

    # ---- dense compaction of unique valid candidates
    vu = uniq
    pos = jnp.cumsum(vu.astype(jnp.int32)) - 1
    tgt = jnp.where(vu, pos, NBD)
    def _scat(x, fill):
        return jnp.full((NBD + 1,), fill, x.dtype).at[tgt].set(x)[:NBD]
    dv = _scat(v, SENT_I)
    dr = _scat(r, fill_S)
    da = _scat(a, jnp.int32(0))
    dh = _scat(h, jnp.int32(0))
    m = jnp.sum(vu.astype(jnp.int32))

    # ---- coalesce on the cap_frac rank grid: keep the last candidate of
    # each grid cell (undershoot — bucket mass <= cap + one pick gap),
    # plus heavy bounds, their isolation bounds, and the final bound
    idx = jnp.arange(NBD, dtype=jnp.int32)
    kb = dr // cap_S
    kb_next = jnp.concatenate([kb[1:], jnp.full((1,), 1 << 30, jnp.int32)])
    keep = (idx < m) & (
        (da != 0) | (dh != 0) | (idx == m - 1) | (kb_next > kb)
    )

    # ---- clamp to the topology (rmax one-level, rmax^2 two-level) and
    # force full coverage
    NBF = min(NBD, rmax if not g.two_level else rmax * rmax)
    kpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    keep2 = keep & (kpos < NBF)
    nbk = jnp.minimum(jnp.sum(keep2.astype(jnp.int32)), NBF)
    tgt2 = jnp.where(keep2, jnp.minimum(kpos, NBF), NBF)
    fb = jnp.full((NBF + 1,), SENT_I, jnp.int32).at[tgt2].set(dv)[:NBF]
    fhr = jnp.zeros((NBF + 1,), jnp.int32).at[tgt2].set(dh)[:NBF]
    fb = fb.at[jnp.clip(nbk - 1, 0, NBF - 1)].set(SENT_I)
    fidx = jnp.arange(NBF, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), fb[:-1]])
    adj = jnp.where(fidx == 0, fb == jnp.int32(BIAS_I), fb == prev + 1)
    fh = (fhr != 0) & adj & (fidx < nbk)

    # ---- fixed-stride grouping (groups = L1 ranges, members = L2)
    per = jnp.maximum(_ceil_div(nbk, rmax), 1)
    gidx = jnp.arange(rmax, dtype=jnp.int32)
    glen = jnp.clip(nbk - gidx * per, 1, per)
    lasti = jnp.clip(gidx * per + per - 1, 0, jnp.maximum(nbk - 1, 0))
    l1b = jnp.where(gidx * per < nbk, jnp.take(fb, lasti), SENT_I)
    jj = jnp.arange(rmax, dtype=jnp.int32)[None, :]
    fi = gidx[:, None] * per + jj
    in_group = (jj < per) & (fi < nbk)
    fi_c = jnp.clip(fi, 0, NBF - 1)
    l2b = jnp.where(in_group, jnp.take(fb, fi_c.reshape(-1))
                    .reshape(rmax, rmax), SENT_I)
    hvb = jnp.where(in_group, jnp.take(fh, fi_c.reshape(-1))
                    .reshape(rmax, rmax), False)

    # ---- drop flags + terminal tables at static slots c = g*rmax + j
    drop1 = (keys_only & (glen == 1) & hvb[:, 0]
             & (gidx * per < nbk)).astype(jnp.int32)
    drop2 = (keys_only & hvb & (glen[:, None] > 1)).astype(jnp.int32)
    # one-level: the terminal child IS the L1 range (gi); two-level: the
    # L2-flattened slot (msb_64.c one- vs multi-pass plan, :1344-1380)
    cidx = (gidx[:, None] * rmax + jj if g.two_level
            else jnp.broadcast_to(gidx[:, None], (rmax, rmax)))
    term_valid = in_group & jnp.where(drop1[:, None] != 0, jj == 0, True)
    term_child = jnp.where(
        drop1[:, None] != 0, -1 - gidx[:, None], cidx
    )
    term_mode = ((drop1[:, None] != 0) | (drop2 != 0)).astype(jnp.int32)

    return dict(
        l1_bounds=l1b, l2_bounds=l2b, group_len=glen,
        drop1=drop1, drop2=drop2.reshape(-1),
        term_child=term_child.reshape(-1),
        term_mode=term_mode.reshape(-1),
        term_fill=l2b.reshape(-1),
        term_valid=term_valid.reshape(-1).astype(jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("g", "nlex", "interpret", "debug", "stage",
                     "nclasses", "salt"),
)
def _pipeline_v4_dev(
    planes, *, g: _GeomV4, nlex: int, interpret: bool,
    debug: bool = False, stage: int = 0, nclasses: int = 1,
    salt: int = 0,
):
    """Device-planned entry: ONE fused XLA program from sample to sorted
    output (tables computed on device, l1_meta baked as a constant)."""
    tb = _plan_tables_dev(planes[0], g, salt)
    tb["l1_meta"] = jnp.asarray(_l1_meta_np(g))
    final, over, dbg = _pipeline_core(
        planes, tb, n=g.n, nplanes=g.nplanes, nlex=nlex, rmax=g.rmax,
        pitch=g.pitch, cap_rows=g.cap_rows, ntiles1=g.ntiles1,
        t2max=g.t2max, arena1_rows=g.arena1_rows,
        arena2_rows=g.arena2_rows, out_rows=g.out_rows,
        two_level=g.two_level,
        interpret=interpret, debug=debug, stage=stage, nclasses=nclasses,
    )
    if debug:
        dbg = dict(dbg, **{f"tb_{k}": v for k, v in tb.items()})
    return final, over, dbg


# ============================================================== glue

def _level_tables(h, keep, gap_rows):
    """Exact per-(tile, range) destination rows from a count matrix.

    h: (ntiles, rmax) TRUE counts (single parent); keep: (rmax,) 0/1 —
    dropped (heavy value-filled) ranges still occupy their run inside
    every sorted tile, so in-tile offsets use the true counts, but their
    runs are never stored: their dst is -1 (the route kernel's skip
    marker) and they contribute no arena rows.

    Children are packed [start_c, start_c + rows_c) with a ``gap_rows``
    slack gap after each child absorbing store-chunk overshoot."""
    pads = (-h) % LANES
    rrows = (h + pads) // LANES
    stored = rrows * keep[None, :]
    rows_c = jnp.sum(stored, axis=0)
    alloc = rows_c + gap_rows
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(alloc, dtype=jnp.int32)[:-1]]
    )
    excl = jnp.cumsum(stored, axis=0, dtype=jnp.int32) - stored
    dst = jnp.where(keep[None, :] != 0, start[None, :] + excl, -1)
    return pads * keep[None, :], rows_c, start, dst


def _pipeline_core(
    planes, tb,
    *, n: int, nplanes: int, nlex: int, rmax: int, pitch: int,
    cap_rows: int, ntiles1: int, t2max: int, arena1_rows: int,
    arena2_rows: int, out_rows: int, two_level: bool, interpret: bool,
    debug: bool = False,
    stage: int = 0,   # profiling: 1 = stop after L1 route, 2 = after L2
    nclasses: int = 1,  # terminal capacity classes (1 = single full-cap pass)
):
    """Shared traced body: levels + terminal from a table dict ``tb``
    (host-packed ints or device-planned tensors — same contract)."""
    l1_meta = tb["l1_meta"]
    l1_bounds, l2_bounds = tb["l1_bounds"], tb["l2_bounds"]
    group_len = tb["group_len"]
    drop1, drop2 = tb["drop1"], tb["drop2"]
    term_child, term_mode = tb["term_child"], tb["term_mode"]
    term_fill, term_valid = tb["term_fill"], tb["term_valid"] != 0
    nchild2 = rmax * rmax

    def _i32(x):
        return (jax.lax.bitcast_convert_type(x, jnp.int32)
                if x.dtype != jnp.int32 else x)

    rows_in = ntiles1 * pitch
    pad = rows_in * LANES - n
    planes2d = tuple(
        jnp.concatenate([_i32(p), jnp.zeros((pad,), jnp.int32)])
        .reshape(rows_in, LANES) for p in planes
    )

    # ---------------- level 1
    hist1 = tb.get("hist1")
    if hist1 is None:
        hist1 = hist_level(
            planes2d[0], l1_meta, l1_bounds, ntiles1, pitch, rmax,
            bias_input=True, interpret=interpret,
        )
    # an injected hist1 (the dsort overlapped path accumulates it per
    # exchange round) replaces the L1 sweep entirely
    real1 = jnp.sum(hist1, axis=0)              # pre-drop true counts
    pads1, rows_c1, start1, dst1 = _level_tables(
        hist1, 1 - drop1, CHUNK_ROWS
    )
    # pad values cycle over the child's next-level sub-bounds so inherited
    # phantoms spread across that level's children (kernels_v3 sinks)
    tt = jnp.arange(ntiles1, dtype=jnp.int32)[:, None]
    jsink = tt % jnp.maximum(group_len, 1)[None, :]       # (ntiles1, rmax)
    if two_level:
        padv1 = l2_bounds[jnp.arange(rmax)[None, :], jsink]
        g_sink = jnp.arange(rmax, dtype=jnp.int32)[None, :] * rmax + jsink
        pads1_into = jax.ops.segment_sum(
            pads1.reshape(-1), g_sink.reshape(-1), num_segments=nchild2
        )
    else:
        padv1 = jnp.broadcast_to(l1_bounds[None, :], (ntiles1, rmax))

    a1 = route_level(
        planes2d, l1_meta, hist1, dst1, padv1, arena1_rows, ntiles1,
        pitch, rmax, nlex=nlex, bias_input=True, interpret=interpret,
    )

    dbg = {}
    if debug:
        dbg.update(hist1=hist1, start1=start1, rows_c1=rows_c1,
                   a1=a1[0])

    if stage == 1:
        return (a1[0],), jnp.int32(0), dbg

    if not two_level:
        reals_t = jnp.where(
            term_child >= 0,
            jnp.take(real1, jnp.clip(term_child, 0, rmax - 1)),
            jnp.take(real1, jnp.clip(-1 - term_child, 0, rmax - 1)),
        )
        occ_t = jnp.where(
            term_child >= 0,
            jnp.take(rows_c1, jnp.clip(term_child, 0, rmax - 1)), 0
        )
        src_t = jnp.where(
            term_child >= 0,
            jnp.take(start1, jnp.clip(term_child, 0, rmax - 1)), 0
        )
        final, over, btbl = _finish(
            a1, reals_t, occ_t, src_t, term_mode, term_fill,
            term_valid, n, cap_rows, out_rows, nlex, interpret, nclasses)
        if debug:
            dbg["btbl"] = btbl
        return final, over, dbg

    # ---------------- level 2
    # traced tile table over the exactly-packed L1 children
    tc = _ceil_div(rows_c1, pitch)
    tbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(tc, dtype=jnp.int32)[:-1]]
    )
    total2 = tbase[-1] + tc[-1]
    ti = jnp.arange(t2max, dtype=jnp.int32)
    p_of = jnp.clip(
        jnp.searchsorted(tbase, ti, side="right").astype(jnp.int32) - 1,
        0, rmax - 1,
    )
    jloc = ti - jnp.take(tbase, p_of)
    live_t = ti < total2
    src_row2 = jnp.where(
        live_t, jnp.take(start1, p_of) + jloc * pitch, 0
    )
    nel2 = jnp.where(
        live_t,
        jnp.clip(
            jnp.take(rows_c1, p_of) * LANES - jloc * pitch * LANES,
            0, pitch * LANES,
        ),
        0,
    )
    parent2 = jnp.where(live_t, p_of, 0)
    meta2 = jnp.concatenate([
        jnp.stack([parent2, src_row2, nel2], axis=1).reshape(-1),
        jnp.zeros((3,), jnp.int32),
    ])

    hist2 = hist_level(
        a1[0], meta2, l2_bounds.reshape(-1), t2max, pitch, rmax,
        bias_input=False, interpret=interpret,
    )
    g2 = parent2[:, None] * rmax + jnp.arange(rmax, dtype=jnp.int32)[None, :]
    cnt2 = jax.ops.segment_sum(
        hist2.reshape(-1), g2.reshape(-1), num_segments=nchild2
    )
    real2 = cnt2 - pads1_into
    keep2 = 1 - jnp.take(drop2, g2.reshape(-1)).reshape(g2.shape)
    rrows2 = (hist2 + ((-hist2) % LANES)) // LANES    # TRUE rows
    stored2 = rrows2 * keep2
    rows_c2 = jax.ops.segment_sum(
        stored2.reshape(-1), g2.reshape(-1), num_segments=nchild2
    )
    alloc2 = rows_c2 + CHUNK_ROWS
    start2 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(alloc2, dtype=jnp.int32)[:-1]]
    )
    excl2 = jnp.cumsum(stored2, axis=0, dtype=jnp.int32) - stored2
    base2 = jnp.take(excl2, jnp.take(tbase, parent2), axis=0)
    dst2 = jnp.where(
        keep2 != 0,
        jnp.take(start2, g2.reshape(-1)).reshape(g2.shape)
        + excl2 - base2,
        -1,
    )
    padv2 = jnp.take(
        l2_bounds.reshape(-1), g2.reshape(-1)
    ).reshape(g2.shape)

    a2 = route_level(
        a1, meta2, hist2, dst2, padv2, arena2_rows, t2max,
        pitch, rmax, nlex=nlex, bias_input=False, interpret=interpret,
    )

    if stage == 2:
        return (a2[0],), jnp.int32(0), dbg

    cidx = jnp.clip(term_child, 0, nchild2 - 1)
    gidx = jnp.clip(-1 - term_child, 0, rmax - 1)
    reals_t = jnp.where(
        term_child >= 0, jnp.take(real2, cidx), jnp.take(real1, gidx)
    )
    occ_t = jnp.where(term_child >= 0, jnp.take(rows_c2, cidx), 0)
    src_t = jnp.where(term_child >= 0, jnp.take(start2, cidx), 0)
    final, over, btbl = _finish(
        a2, reals_t, occ_t, src_t, term_mode, term_fill,
        term_valid, n, cap_rows, out_rows, nlex, interpret, nclasses)
    if debug:
        dbg.update(hist2=hist2, real2=real2, start2=start2,
                   rows_c2=rows_c2, a2=a2[0], btbl=btbl)
    return final, over, dbg

@functools.partial(
    jax.jit,
    static_argnames=(
        "layout", "n", "nplanes", "nlex", "rmax", "pitch", "cap_rows",
        "ntiles1", "t2max", "arena1_rows", "arena2_rows", "out_rows",
        "two_level", "interpret", "debug", "stage", "nclasses",
    ),
)
def _pipeline_v4(planes, packed, *, layout, **kw):
    """Host-planned entry: unpack the single packed table upload."""
    return _pipeline_core(planes, _unpack(packed, layout), **kw)


def _finish(src_planes, reals_t, occ_t, src_t, term_mode, term_fill,
            term_valid, n, cap_rows, out_rows, nlex, interpret,
            nclasses=1, out_base=0, outs0=None, slice_n=True):
    """Terminal tier: class-chained ``terminal_write`` calls.

    v5 extensions over the v4 defaults: ``out_base`` offsets the bucket
    output positions (batched terminals continue a global stream),
    ``outs0`` seeds the class chain with an existing output buffer
    (aliased — the in-place splice into the working array), and
    ``slice_n=False`` returns the raw (out_rows, 128) planes for
    donation to the next batch."""
    reals_t = jnp.where(term_valid, reals_t, 0).astype(jnp.int32)
    occ_t = occ_t.astype(jnp.int32)
    # the XL rescue class sorts up to 2*cap_rows, so only a bucket beyond
    # THAT triggers the retry ladder — estimation noise and moderate skew
    # are absorbed in-device instead of silently doubling runtime
    over = jnp.any(
        term_valid & (term_mode == 0) & (occ_t > 2 * cap_rows)
    ).astype(jnp.int32)
    reals_t = jnp.where(
        term_mode == 0, jnp.minimum(reals_t, occ_t * LANES), reals_t
    )
    base = jnp.asarray(out_base, jnp.int32)
    ends = jnp.minimum(base + jnp.cumsum(reals_t), n).astype(jnp.int32)
    out_off = jnp.concatenate([base[None], ends[:-1]])
    reals_t = (ends - out_off).astype(jnp.int32)
    zeros = jnp.zeros_like(reals_t)
    # capacity class per bucket: the smallest cap that fits its
    # occupancy sorts with a proportionally cheaper network
    # (schedule_passes pass sizing, msb_64.c:1334-1400).  Value-fill
    # buckets never sort; put them in the smallest class.
    # capacity classes (schedule_passes pass sizing, msb_64.c:1334-1400):
    # class 0 is the always-present XL rescue tier (2*cap) absorbing
    # estimation overshoot; below it, nclasses tiers of halving caps so a
    # bucket sorts with the smallest network that fits.  Value-fill
    # buckets never sort; they stream from the smallest class.
    caps = [2 * cap_rows] + [
        cap_rows, cap_rows // 2, cap_rows // 4
    ][:nclasses]
    cls = jnp.full_like(occ_t, len(caps) - 1)
    for ci in range(len(caps) - 2, -1, -1):
        cls = jnp.where((term_mode == 0) & (occ_t > caps[ci + 1]), ci, cls)
    btbl = jnp.stack(
        [src_t, occ_t, reals_t, term_mode, term_fill, out_off,
         cls, zeros], axis=1,
    )
    outs = tuple(outs0) if outs0 is not None else None
    for ci, cap_c in enumerate(caps):
        outs = terminal_write(
            src_planes, btbl, out_rows, cap_c, nlex=nlex,
            unbias_output=True, interpret=interpret,
            class_id=ci, prev_outs=outs,
        )
    if not slice_n:
        return outs, over, btbl
    final = tuple(
        jax.lax.bitcast_convert_type(o.reshape(-1)[:n], jnp.uint32)
        for o in outs
    )
    return final, over, btbl


# ============================================================== debug

class InvariantError(AssertionError):
    """An in-situ pipeline invariant failed (debug_checks mode)."""


def _debug_validate(plan: _PlanV4, dbg: dict, over: int) -> None:
    """The ``#ifdef BG`` in-situ check suite (msb_64.c:474-495, 329-349,
    2185-2197 analog), run host-side on debug outputs fetched with the
    result.  Raises ``InvariantError`` with a precise message instead of
    letting corrupt metadata trap the device.

    Checks: histogram totals and non-negativity (classifier), per-child
    arena range purity (check_range_partition), terminal offset monotony
    + coverage of exactly n elements, and capacity accounting vs the
    overflow flag."""
    d = {k: np.asarray(jax.device_get(v)) for k, v in dbg.items()}
    n, rmax = plan.n, plan.rmax

    h1 = d["hist1"]
    if h1.min() < 0:
        raise InvariantError(
            f"L1 histogram has negative counts (min {h1.min()}): "
            "non-monotone L1 bounds")
    if int(h1.sum()) != n:
        raise InvariantError(
            f"L1 histogram total {int(h1.sum())} != n {n}")

    def _purity(arena, start, rows_c, bounds, lo_bounds, label):
        # every stored row of child c must lie in (lo, hi] (biased i32);
        # pads are in-range by construction so they pass too
        for c in range(len(start)):
            rc = int(rows_c[c])
            if rc == 0:
                continue
            seg = arena[int(start[c]): int(start[c]) + rc]
            hi, lo = int(bounds[c]), int(lo_bounds[c])
            if seg.max() > hi or (lo > -(2 ** 31) and seg.min() <= lo):
                raise InvariantError(
                    f"{label} child {c}: keys outside "
                    f"({lo}, {hi}] (min {seg.min()} max {seg.max()})")

    lob1 = np.concatenate([[-(2 ** 31)], plan.l1_bounds[:-1]])
    keep1 = (1 - plan.drop1).astype(bool)
    _purity(d["a1"], d["start1"][keep1], d["rows_c1"][keep1],
            plan.l1_bounds[keep1], lob1[keep1], "L1")

    if "a2" in d:
        h2 = d["hist2"]
        if h2.min() < 0:
            raise InvariantError(
                f"L2 histogram has negative counts (min {h2.min()}): "
                "non-monotone L2 bounds")
        b2 = plan.l2_bounds.reshape(-1)
        lob2 = np.concatenate([[-(2 ** 31)], b2[:-1]]).copy()
        lob2[::rmax] = -(2 ** 31)       # each group restarts at -inf...
        g_lo = np.repeat(
            np.concatenate([[-(2 ** 31)], plan.l1_bounds[:-1]]), rmax
        )
        lob2 = np.maximum(lob2, g_lo)   # ...bounded below by the parent
        live2 = d["rows_c2"] > 0
        _purity(d["a2"], d["start2"][live2], d["rows_c2"][live2],
                b2[live2], lob2[live2], "L2")

    btbl = d["btbl"]
    valid = plan.term_valid.astype(bool)
    offs, reals = btbl[valid, 5], btbl[valid, 2]
    if np.any(np.diff(offs) != reals[:-1]):
        raise InvariantError("terminal out_off not monotone-contiguous")
    if len(offs) and int(offs[-1] + reals[-1]) != n:
        raise InvariantError(
            f"terminal coverage {int(offs[-1] + reals[-1])} != n {n}")
    occ, mode = btbl[valid, 1], btbl[valid, 3]
    if not over and np.any((mode == 0) & (occ > 2 * plan.cap_rows)):
        raise InvariantError(
            "bucket occupancy exceeds the XL capacity (2*cap_rows) but "
            "the overflow flag is unset")


# ============================================================== driver

def sort_v4(
    keys: jax.Array,
    vals: Tuple[jax.Array, ...] = (),
    cfg: Optional[SortConfig] = None,
    timer: Optional[PhaseTimer] = None,
    _nb_mult: float = 1.0,
    _depth: int = 0,
    _deep_depth: int = 0,
):
    """Sort uint32 keys (with 0..2 uint32 payload planes) on one chip.

    Ordering is lexicographic by (key, *vals): a stable key sort when
    vals[0] is the original index; a full uint64 sort when the planes are
    (hi, lo) words; rid planes ride along exactly.
    """
    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    n = int(keys.shape[0])
    thr = cfg.min_engine_n if cfg.min_engine_n is not None else (1 << 16)
    if n < thr and _depth == 0:
        FALLBACK_STATS["small_n"] += 1
        return _xla_fallback(keys, vals)
    with jax.enable_x64(False):
        return _sort_v4_body(keys, vals, cfg, timer, _nb_mult, _depth, n,
                             _deep_depth)


def _exhausted(keys, vals, cfg, timer, deep_depth):
    """The retry ladder is out of plane-0 refinements.  Multi-plane
    inputs recurse into the lower planes (the ``schedule_passes`` tier
    over the remaining key bits, msb_64.c:1334-1400); keys-only inputs
    — where heavy values are already value-filled, so this means the
    sample missed pathologically — fall back to XLA."""
    if len(vals):
        from .deep import deep_sort
        return deep_sort(keys, vals, cfg, timer, deep_depth)
    FALLBACK_STATS["overflow"] += 1
    return _xla_fallback(keys, vals)


def _sort_v4_body(keys, vals, cfg, timer, nb_mult, depth, n,
                  deep_depth=0):
    nplanes = 1 + len(vals)
    interp = cfg.interpret
    if cfg.device_plan:
        return _sort_v4_body_dev(keys, vals, cfg, timer, nb_mult,
                                 depth, n, deep_depth)

    with timer.phase("sample"):
        ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
        ssz = min(ssz, n)
        _, nb_want = _geometry(n, nplanes, cfg)
        stats = np.asarray(jax.device_get(_sample_stats(
            keys, ssz=ssz, nbq=4 * max(1, int(nb_want * nb_mult)),
            salt=depth,
        )))
        rows = max(n // LANES, 1)
        neff = max(1, min(ssz, rows))
        S = min(n, ssz) if (rows <= 1 or neff >= rows) else neff
        try:
            plan = make_plan_v4(n, stats, S, nplanes, cfg, nb_mult)
        except ValueError:
            FALLBACK_STATS["plan"] += 1
            return _xla_fallback(keys, vals)

    with timer.phase("part_blocks"):
        packed, layout = _pack_tables_v4(plan)
        planes = (keys,) + tuple(vals)
        final, over, dbg = _pipeline_v4(
            planes, jnp.asarray(packed),
            layout=layout, n=n, nplanes=nplanes, nlex=nplanes - 1,
            rmax=plan.rmax, pitch=plan.pitch, cap_rows=plan.cap_rows,
            ntiles1=plan.ntiles1, t2max=plan.t2max,
            arena1_rows=plan.arena1_rows, arena2_rows=plan.arena2_rows,
            out_rows=plan.out_rows, two_level=plan.two_level,
            interpret=interp, debug=cfg.debug_checks,
            nclasses=cfg.term_classes,
        )
        timer.sync(final[0])

    over = int(jax.device_get(over))
    if cfg.debug_checks:
        _debug_validate(plan, dbg, over)
    if over:
        if depth < 2:
            FALLBACK_STATS["retry"] += 1
            return _sort_v4_body(keys, vals, cfg, timer, nb_mult * 2.0,
                                 depth + 1, n, deep_depth)
        return _exhausted(keys, vals, cfg, timer, deep_depth)
    return final[0], tuple(final[1:])


def _sort_v4_body_dev(keys, vals, cfg, timer, nb_mult, depth, n,
                      deep_depth=0):
    """Device-planned driver: one fused dispatch, one result-side fetch
    (the overflow flag doubles as the completion sync)."""
    nplanes = 1 + len(vals)
    g = _dev_geometry(n, nplanes, cfg, nb_mult)
    planes = (keys,) + tuple(vals)
    with timer.phase("part_blocks"):
        final, over, dbg = _pipeline_v4_dev(
            planes, g=g, nlex=nplanes - 1, interpret=cfg.interpret,
            debug=cfg.debug_checks, nclasses=cfg.term_classes,
            salt=depth,
        )
        timer.sync(final[0])
    over = int(jax.device_get(over))
    if cfg.debug_checks:
        import types
        tbh = {k[3:]: np.asarray(jax.device_get(v))
               for k, v in dbg.items() if k.startswith("tb_")}
        shim = types.SimpleNamespace(
            n=n, rmax=g.rmax, cap_rows=g.cap_rows,
            l1_bounds=tbh["l1_bounds"], l2_bounds=tbh["l2_bounds"],
            drop1=tbh["drop1"], term_valid=tbh["term_valid"],
        )
        _debug_validate(shim, {k: v for k, v in dbg.items()
                               if not k.startswith("tb_")}, over)
    if over:
        if depth < 2:
            FALLBACK_STATS["retry"] += 1
            return _sort_v4_body_dev(keys, vals, cfg, timer,
                                     nb_mult * 2.0, depth + 1, n,
                                     deep_depth)
        return _exhausted(keys, vals, cfg, timer, deep_depth)
    return final[0], tuple(final[1:])


def _pack_tables_v4(plan: _PlanV4):
    tables = _plan_tables(plan)
    layout = []
    chunks = []
    off = 0
    for name, arr in tables.items():
        a = np.ascontiguousarray(arr, dtype=np.int32)
        layout.append((name, off, a.shape))
        chunks.append(a.reshape(-1))
        off += a.size
    return np.concatenate(chunks), tuple(layout)


def _xla_fallback(keys, vals):
    """Correctness net for adversarial inputs the plan cannot fit.
    Matches the engine contract: lexicographic by (key, *vals), and the
    synchronous-return contract (SortResult.synced) via a tail fetch."""
    if vals:
        res = jax.lax.sort((keys,) + tuple(vals), num_keys=1 + len(vals))
        out = res[0], tuple(res[1:])
    else:
        out = jnp.sort(keys), ()
    if keys.shape[0]:
        jax.device_get(out[0][-1:])
    return out
