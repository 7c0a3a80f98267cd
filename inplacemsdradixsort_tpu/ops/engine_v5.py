"""v5 engine: the truly in-place single-chip MSD range sort.

The out-of-place v4 pipeline keeps input + level arenas + output alive at
once (~2.5-3x N HBM); resident 2^30-2^31 sorts need the reference's
defining feature — partitioning *within* one buffer.  v5 re-creates the
reference's in-place machinery (/root/reference/src/msb_64.c) TPU-first:

1. SAMPLE + PLAN (host): hybrid duplicate-aware quantile + radix bounds
   (``extract_delimiters`` + the hybrid set, msb_64.c:1304-1322,
   1545-1564), grouped into <= rmax L1 ranges of <= rmax sub-ranges.
2. L1 HIST (device, fetched): exact per-(tile, range) counts — every
   block's destination becomes host-computable (the deterministic
   replacement for the atomically-claimed block map, msb_64.c:658-666,
   2027, 2056).
3. L1 SEQROUTE (in place over W): ``range_partition_to_blocks``
   (msb_64.c:497-699) as ``kernels_v5.seqroute_level`` — tiles are read
   sequentially, sorted in VMEM, appended to per-range block
   accumulators, and FULL blocks flush to the next sequential W slot, so
   the writer can never overtake the reader.  Open per-range tails are
   phantom-padded and drained to the slack slots past the full-block
   frontier (the ``combine``/half-block machinery, msb_64.c:1220-1302,
   collapsed into an always-padded drain block per range).
4. BLOCK PERMUTE (in place over W): the online/offline block swaps
   (msb_64.c:2016-2158) as one deterministic cycle-following schedule
   (``permute_schedule``) streamed by ``kernels_v5.block_permute`` —
   after it, every L1 range is block-contiguous in W.
5. L2 BATCHES: consecutive regions are grouped so their blocks fit a
   bounded scratch arena S (~``v5_batch_frac`` x N — the ``fudge`` slack
   contract, msb_64.h:39).  One compiled step per geometry, re-invoked
   per batch: exact hist -> route the batch's regions into S ->
   ``terminal_write`` sorts each final bucket and splices it to its
   exact global output offset IN W (aliased output — local sort P12 +
   inject P11, msb_64.c:2199-2255, 1278-1302).  Writes always trail
   reads: cumulative real output <= cumulative region blocks.

Peak engine HBM = W (N + rmax blocks + a tile of slack) + S + VMEM-sized
tables ~= (1 + frac) x N; materializing the caller's (n,)-shaped result
from the row-padded W adds one final N-sized copy.

Heavy single-value ranges (keys-only) are never routed or sorted: the
terminal value-fills them from their exact count (msb_64.c:1313-1320).
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
from .engine_v3 import _bias_np, _ceil_div, _shape_class
from . import engine_v4
from .engine_v4 import (_bounds_hybrid, _finish, _stats_of_sorted,
                        _xla_fallback)
from .kernels_v4 import CHUNK_ROWS, LANES, hist_level, route_level
from .kernels_v5 import (BLK, BLKROWS, NSTAGE, RING, SCHED_CHUNK,
                         block_permute, seqroute_level)

U32_MAX = np.uint32(0xFFFFFFFF)


def _qclass(x: int, steps: int = 4) -> int:
    """Coarse pow2-octave size class without _shape_class's 1024 floor."""
    if x <= 8:
        return 8
    e = math.floor(math.log2(x))
    step = max(1, (1 << e) // steps)
    return _ceil_div(x, step) * step


# ===================================================== permute schedule

def permute_schedule(src_of_final: np.ndarray) -> np.ndarray:
    """Cycle-linearize a block permutation for ``block_permute``.

    ``src_of_final[f]`` = current W slot of the block that must end up at
    slot f (a permutation of [0, F)).  Self-loops are skipped — the
    kernel's aliased output leaves unmentioned slots in place.  Each
    cycle emits: a stage read of its head + a dummy rsem wait (so the
    head's slot is never overwritten before its save lands), one
    (read, write) entry per move, and a no-wait cycle-closing write from
    the stage buffer.  Stage buffers rotate over NSTAGE so consecutive
    short cycles never deadlock on one stage's wsem (the reference claims
    move targets with fetch-adds and dumps broken cycles to private
    space, msb_64.c:2027-2092; here the whole move graph is static).
    """
    F = len(src_of_final)
    visited = np.zeros(F, bool)
    ent = []
    rc = 0
    ncyc = 0
    for f0 in range(F):
        if visited[f0]:
            continue
        visited[f0] = True
        if src_of_final[f0] == f0:
            continue
        cyc = [f0]
        f = int(src_of_final[f0])
        while f != f0:
            visited[f] = True
            cyc.append(f)
            f = int(src_of_final[f])
        stage = RING + (ncyc % NSTAGE)
        ncyc += 1
        ent.append((cyc[0], stage, -2, stage))          # save head + dummy
        for i in range(len(cyc) - 1):
            b = rc % RING
            rc += 1
            ent.append((cyc[i + 1], b, cyc[i], b))
        ent.append((-1, 0, cyc[-1], stage + RING + NSTAGE))   # close (nowait)
    if not ent:
        ent.append((-1, 0, -1, 0))
    nch = _qclass(_ceil_div(len(ent), SCHED_CHUNK))
    arr = np.full((nch * SCHED_CHUNK, 4), -1, np.int32)
    arr[:, 1] = 0
    arr[:, 3] = 0
    arr[: len(ent)] = np.array(ent, np.int32)
    return arr.reshape(nch, SCHED_CHUNK * 4)


# ===================================================== geometry / plan

@dataclasses.dataclass(frozen=True)
class _GeomV5:
    n: int
    nplanes: int
    rmax: int
    pitch1: int
    sort_rows2: int
    pitch2: int
    cap_rows: int
    rows_in: int
    nblocks: int
    ntiles1: int
    w_rows: int
    ssz: int
    nbq: int
    nb_want: int


def _v5_geometry(n: int, nplanes: int, cfg: SortConfig,
                 nb_mult: float = 1.0) -> _GeomV5:
    cap_rows = cfg.v3_cap_rows
    if not cap_rows:
        cap_rows = 2048 if n >= (1 << 28) else 1024
        # beyond a 128-wide topology (never at u32-addressable sizes):
        # double the terminal class rather than overflow the plan
        while (cap_rows < 8192
               and _ceil_div(n, int(cap_rows * LANES * 0.80))
               * nb_mult * 1.4 > 128 * 128):
            cap_rows *= 2
    target = int(cap_rows * LANES * 0.80)
    nb_want = max(16, int(_ceil_div(n, target) * nb_mult))
    # rmax 128 exists for ~2^31: 96^2 buckets top out at ~1.9e9 keys with
    # the 2048-row terminal class (seen: 13263 buckets at 2^31 - 2^20);
    # growing the topology keeps the terminal networks at their tuned
    # size where growing cap_rows would compile a 2^20-element network
    rmax = cfg.v3_rmax or next(
        (r for r in (32, 48, 64, 96, 128) if r * r >= nb_want * 1.4), 128
    )
    sort_rows2 = cfg.v3_sort_rows
    pitch2 = sort_rows2 - rmax
    pitch1 = cfg.v5_pitch_rows or 2048
    assert (pitch1 * LANES) & (pitch1 * LANES - 1) == 0, pitch1
    rows_in = _ceil_div(n, LANES)
    nblocks = _ceil_div(n, BLK)
    ntiles1 = _ceil_div(rows_in, pitch1)
    # slots for all full blocks + one padded drain block per range, plus
    # a tile of load-overshoot slack past the last region
    w_rows = ((nblocks + rmax) * BLKROWS
              + max(pitch1, pitch2) + CHUNK_ROWS)
    ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
    ssz = min(ssz, n)
    return _GeomV5(
        n=n, nplanes=nplanes, rmax=rmax, pitch1=pitch1,
        sort_rows2=sort_rows2, pitch2=pitch2, cap_rows=cap_rows,
        rows_in=rows_in, nblocks=nblocks, ntiles1=ntiles1, w_rows=w_rows,
        ssz=ssz, nbq=4 * nb_want, nb_want=nb_want,
    )


@dataclasses.dataclass
class _PlanV5:
    """Host-side bound tables (u64-typed uint32 values, unbiased)."""
    ng: int
    l1_bounds_u: np.ndarray       # (rmax,)
    l2_bounds_u: np.ndarray       # (rmax, rmax)
    glen: np.ndarray              # (rmax,)
    heavy1: np.ndarray            # (rmax,) bool: fill-only region
    drop2: np.ndarray             # (rmax, rmax) int32


def _v5_plan(stats: np.ndarray, S: int, nplanes: int, cfg: SortConfig,
             nb_want: int, rmax: int) -> _PlanV5:
    keys_only = nplanes == 1
    bounds, is_heavy, _ = _bounds_hybrid(stats, S, nb_want, cfg)
    nb = len(bounds)
    if nb > rmax * rmax:
        raise ValueError(f"too many buckets {nb} for topology {rmax}")
    per = _ceil_div(nb, rmax)
    groups = [list(range(i, min(i + per, nb))) for i in range(0, nb, per)]
    ng = len(groups)
    l1_bounds_u = np.full(rmax, int(U32_MAX), np.uint64)
    l2_bounds_u = np.full((rmax, rmax), int(U32_MAX), np.uint64)
    glen = np.ones(rmax, np.int64)
    heavy1 = np.zeros(rmax, bool)
    drop2 = np.zeros((rmax, rmax), np.int32)
    for gi, g in enumerate(groups):
        l1_bounds_u[gi] = bounds[g[-1]]
        glen[gi] = len(g)
        for sj, j in enumerate(g):
            l2_bounds_u[gi, sj] = bounds[j]
        for sj in range(len(g), rmax):
            l2_bounds_u[gi, sj] = l2_bounds_u[gi, len(g) - 1]
        if keys_only and len(g) == 1 and bool(is_heavy[g[0]]):
            heavy1[gi] = True
        elif keys_only:
            for sj, j in enumerate(g):
                if is_heavy[j]:
                    drop2[gi, sj] = 1
    return _PlanV5(ng=ng, l1_bounds_u=l1_bounds_u, l2_bounds_u=l2_bounds_u,
                   glen=glen, heavy1=heavy1, drop2=drop2)


# ===================================================== host glue (L1)

def _seqroute_tables(h: np.ndarray, g: _GeomV5, plan: _PlanV5):
    """Exact seqroute tables + final block layout + permutation source.

    From the fetched (ntiles1, rmax) histogram: per-(tile, range) stream
    bases, the deterministic flush-slot assignment (events in (tile,
    range) order claim sequential W slots — the block map reborn,
    msb_64.c:658-666), the drain slots past the full-block frontier, the
    final region layout (nblk[d] = full blocks + 1 padded drain), and
    src_of_final for the cycle permute (identity-preferring matching to
    minimize moves)."""
    ntiles1, rmax = h.shape
    cnt = h.sum(0, dtype=np.int64)
    C = np.cumsum(h, 0, dtype=np.int64) - h
    ev = (C + h) // BLK - C // BLK
    flat = ev.reshape(-1)
    slot0 = (np.cumsum(flat) - flat).reshape(ev.shape)
    nfull = int(ev.sum())

    meta = np.zeros(((g.ntiles1 + 2) * 4,), np.int32)
    for t in range(ntiles1):
        meta[t * 4] = t * g.pitch1
        meta[t * 4 + 1] = min(g.n - t * g.pitch1 * LANES,
                              g.pitch1 * LANES)
    meta[ntiles1 * 4 + 2] = 1          # drain tile

    cnt_tbl = np.concatenate(
        [h, np.zeros((1, rmax), np.int64)]).astype(np.int32)
    base_tbl = np.concatenate([C, cnt[None]]).astype(np.int32)
    slot_tbl = np.concatenate(
        [slot0, (nfull + np.arange(rmax))[None]]).astype(np.int32)
    padv_tbl = np.zeros_like(cnt_tbl)
    padv_tbl[-1] = _bias_np(plan.l1_bounds_u.astype(np.uint32))

    # ---- final layout + identity-preferring permutation
    tt, dd = np.nonzero(ev)
    d_of_slot = np.concatenate(
        [np.repeat(dd, ev[tt, dd]), np.arange(rmax)])
    nblk = (cnt // BLK + 1).astype(np.int64)
    Fbase = np.concatenate([[0], np.cumsum(nblk)[:-1]]).astype(np.int64)
    F = int(nblk.sum())
    assert F == nfull + rmax
    order = np.argsort(d_of_slot, kind="stable")
    starts = np.concatenate(
        [[0], np.cumsum(np.bincount(d_of_slot, minlength=rmax))[:-1]])
    src = np.empty(F, np.int64)
    for d in range(rmax):
        # the drain block (current slot nfull+d) is pinned to the LAST
        # final slot of its region: region d then reads as cnt[d] real
        # elements followed by pads — the invariant the lossless
        # overflow-retry compaction relies on
        fin_last = int(Fbase[d] + nblk[d] - 1)
        src[fin_last] = nfull + d
        cur = np.sort(order[starts[d]: starts[d] + nblk[d]])
        cur = cur[cur != nfull + d]
        fin = np.arange(Fbase[d], Fbase[d] + nblk[d] - 1)
        common = np.intersect1d(cur, fin)
        src[common] = common
        src[np.setdiff1d(fin, common)] = np.setdiff1d(cur, common)
    return (meta, cnt_tbl, base_tbl, slot_tbl, padv_tbl,
            cnt, nblk, Fbase, src)


# ===================================================== batches (L2)

@dataclasses.dataclass(frozen=True)
class _BatchGeom:
    nreg_cap: int
    t2cap: int
    s_rows: int
    nb_batch: int


def _plan_batches(g: _GeomV5, plan: _PlanV5, nblk: np.ndarray,
                  frac: float):
    """Greedy consecutive-region batching under the scratch budget."""
    ng, rmax = plan.ng, g.rmax
    route_blocks = [0 if plan.heavy1[gi] else int(nblk[gi])
                    for gi in range(ng)]
    total = sum(route_blocks)
    sblocks = _qclass(max(_ceil_div(max(total, 1),
                                    max(1, round(1.0 / frac))),
                          max(route_blocks) if route_blocks else 1, 1))
    batches = []
    cur, blocks = [], 0
    for gi in range(ng):
        if cur and blocks + route_blocks[gi] > sblocks:
            batches.append(cur)
            cur, blocks = [], 0
        cur.append(gi)
        blocks += route_blocks[gi]
    if cur:
        batches.append(cur)
    nreg_cap = min(_qclass(max(len(b) for b in batches)), rmax * rmax)
    t2cap = _qclass(
        _ceil_div(sblocks * BLKROWS, g.pitch2) + nreg_cap + 1)
    nb_batch = nreg_cap * rmax
    s_rows = _shape_class(
        sblocks * BLKROWS + t2cap * rmax + nb_batch * CHUNK_ROWS
        + 2 * g.cap_rows + CHUNK_ROWS
    )
    return batches, _BatchGeom(nreg_cap=nreg_cap, t2cap=t2cap,
                               s_rows=s_rows, nb_batch=nb_batch)


def _batch_tables(g: _GeomV5, plan: _PlanV5, bg: _BatchGeom, batch,
                  nblk: np.ndarray, Fbase: np.ndarray, cnt: np.ndarray,
                  out_base: int):
    rmax = g.rmax
    meta2 = np.zeros(((bg.t2cap + 1) * 3,), np.int32)
    parent2 = np.zeros((bg.t2cap,), np.int32)
    tbase = np.zeros((bg.nreg_cap,), np.int32)
    l2b = np.full((bg.nreg_cap, rmax), int(U32_MAX), np.uint64)
    pads_into = np.zeros((bg.nreg_cap, rmax), np.int32)
    drop2 = np.zeros((bg.nreg_cap, rmax), np.int32)
    term_valid = np.zeros((bg.nreg_cap, rmax), np.int32)
    term_mode = np.zeros((bg.nreg_cap, rmax), np.int32)
    term_fill_u = np.zeros((bg.nreg_cap, rmax), np.uint32)
    heavy_mask = np.zeros((bg.nreg_cap, rmax), np.int32)
    heavy_real = np.zeros((bg.nreg_cap, rmax), np.int32)
    ti = 0
    for li, gi in enumerate(batch):
        l2b[li] = plan.l2_bounds_u[gi]
        gl = int(plan.glen[gi])
        tbase[li] = ti
        if plan.heavy1[gi]:
            term_valid[li, 0] = 1
            term_mode[li, 0] = 1
            term_fill_u[li, 0] = plan.l1_bounds_u[gi]
            heavy_mask[li, 0] = 1
            heavy_real[li, 0] = int(cnt[gi])
            continue
        pads_into[li, gl - 1] = int(nblk[gi] * BLK - cnt[gi])
        for sj in range(gl):
            term_valid[li, sj] = 1
            if plan.drop2[gi, sj]:
                term_mode[li, sj] = 1
                term_fill_u[li, sj] = plan.l2_bounds_u[gi, sj]
                drop2[li, sj] = 1
        region_rows = int(nblk[gi]) * BLKROWS
        nt = _ceil_div(region_rows, g.pitch2)
        for j in range(nt):
            meta2[ti * 3 + 0] = li
            meta2[ti * 3 + 1] = int(Fbase[gi]) * BLKROWS + j * g.pitch2
            meta2[ti * 3 + 2] = min(
                region_rows * LANES - j * g.pitch2 * LANES,
                g.pitch2 * LANES)
            parent2[ti] = li
            ti += 1
    assert ti <= bg.t2cap, (ti, bg.t2cap)
    return dict(
        meta2=meta2,
        parent2=parent2,
        tbase=tbase,
        l2b=_bias_np(l2b.reshape(-1).astype(np.uint32)),
        pads_into=pads_into.reshape(-1),
        drop2=drop2.reshape(-1),
        term_valid=term_valid.reshape(-1),
        term_mode=term_mode.reshape(-1),
        term_fill=_bias_np(term_fill_u.reshape(-1)),
        heavy_mask=heavy_mask.reshape(-1),
        heavy_real=heavy_real.reshape(-1),
        out_base=np.int32(out_base),
    )


# ===================================================== device steps

def _i32(x):
    return (jax.lax.bitcast_convert_type(x, jnp.int32)
            if x.dtype != jnp.int32 else x)


@functools.partial(jax.jit, static_argnames=("g", "nplanes"))
def _step_wzero(*, g: _GeomV5, nplanes: int):
    return tuple(
        jnp.zeros((g.w_rows, LANES), jnp.int32) for _ in range(nplanes)
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _step_wput(w, planes, row0):
    """Append one chunk's planes into W at (traced) row ``row0`` —
    donated dynamic_update_slice, so W is built at peak W + one chunk.
    Chunk lengths must be LANES multiples except the last (padded)."""
    out = []
    for wp, p in zip(w, planes):
        x = _i32(p)
        pad = (-x.shape[0]) % LANES
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), jnp.int32)])
        out.append(jax.lax.dynamic_update_slice(
            wp, x.reshape(-1, LANES), (row0, 0)))
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("g", "salt"))
def _step_stats(w, *, g: _GeomV5, salt: int):
    """Sample stats straight off the 2D working buffer.

    Gathers sample ROWS from the int32 W planes and bitcasts only the
    picked (neff, 128) block: bitcasting/reshaping all of W first
    materializes an N-sized HLO temp beside the W argument, which is
    exactly the OOM the >half-HBM chunked path exists to avoid (seen at
    2^31: 8 GiB arg + 8 GiB temp on a 16 GiB chip).  Semantics match
    engine_v4._sample_stats bit for bit (same PRNG stream, same lane
    de-correlation), so plans and fixtures are unchanged."""
    n, ssz = g.n, g.ssz
    rows = max(n // LANES, 1)
    neff = max(1, min(ssz, rows))
    if rows <= 1 or neff >= rows:
        m = min(n, ssz)
        mrows = _ceil_div(max(m, 1), LANES)
        s = jnp.sort(jax.lax.bitcast_convert_type(
            w[0][:mrows], jnp.uint32).reshape(-1)[:m])
        return _stats_of_sorted(s, g.nbq)
    key = jax.random.key(
        (n & 0xFFFFFF) ^ (salt * 2654435761 & 0x7FFFFFFF))
    idx = jax.random.randint(key, (neff,), 0, rows, dtype=jnp.int32)
    picked = jnp.take(w[0], idx, axis=0)          # in-place gather of W
    lane = (idx * 89 + jnp.arange(neff, dtype=jnp.int32) * 37) % LANES
    s = jnp.sort(jax.lax.bitcast_convert_type(
        jnp.take_along_axis(picked, lane[:, None], axis=1).reshape(-1),
        jnp.uint32))
    return _stats_of_sorted(s, g.nbq)


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def _step_hist1(w, meta1, l1b, *, g: _GeomV5, interpret: bool):
    return hist_level(w[0], meta1, l1b, g.ntiles1, g.pitch1, g.rmax,
                      bias_input=True, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("g", "nlex", "interpret"),
                   donate_argnums=(0,))
def _step_partition(w, meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl,
                    sched, *, g: _GeomV5, nlex: int, interpret: bool):
    """In-place L1: sequential-block partition + cycle block permute."""
    w = seqroute_level(
        w, meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl,
        g.ntiles1 + 1, g.pitch1, g.rmax, nlex=nlex,
        bias_input=True, interpret=interpret,
    )
    return block_permute(w, sched, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("g", "bg", "interpret"),
)
def _step_hist2(w, tbl, *, g: _GeomV5, bg: _BatchGeom, interpret: bool):
    """Non-destructive L2 precheck for one batch: exact hist over its
    regions + the terminal-capacity overflow flag.  All batches'
    prechecks run BEFORE any terminal writes into W, so an overflow is
    detected while W still holds every element (lossless retry)."""
    rmax = g.rmax
    nchild = bg.nreg_cap * rmax
    hist2 = hist_level(w[0], tbl["meta2"], tbl["l2b"], bg.t2cap,
                       g.pitch2, rmax, bias_input=False,
                       interpret=interpret)
    g2 = (tbl["parent2"][:, None] * rmax
          + jnp.arange(rmax, dtype=jnp.int32)[None, :])
    keep2 = 1 - jnp.take(tbl["drop2"], g2.reshape(-1)).reshape(g2.shape)
    rrows2 = (hist2 + ((-hist2) % LANES)) // LANES
    rows_c2 = jax.ops.segment_sum(
        (rrows2 * keep2).reshape(-1), g2.reshape(-1),
        num_segments=nchild)
    over = jnp.any(
        (tbl["term_valid"] != 0) & (tbl["term_mode"] == 0)
        & (rows_c2 > 2 * g.cap_rows)
    ).astype(jnp.int32)
    return hist2, over


@functools.partial(
    jax.jit,
    static_argnames=("g", "bg", "nlex", "interpret", "nclasses"),
    donate_argnums=(0,),
)
def _step_batch(w, hist2, tbl, *, g: _GeomV5, bg: _BatchGeom, nlex: int,
                interpret: bool, nclasses: int):
    """One L2 batch: route the batch's regions into the scratch arena ->
    terminal sort/fill spliced into W (aliased); ``hist2`` comes from
    the precheck pass."""
    rmax, pitch2 = g.rmax, g.pitch2
    nchild = bg.nreg_cap * rmax
    parent2 = tbl["parent2"]
    g2 = parent2[:, None] * rmax + jnp.arange(rmax, dtype=jnp.int32)[None, :]
    cnt2 = jax.ops.segment_sum(
        hist2.reshape(-1), g2.reshape(-1), num_segments=nchild)
    real2 = cnt2 - tbl["pads_into"]
    keep2 = 1 - jnp.take(tbl["drop2"], g2.reshape(-1)).reshape(g2.shape)
    rrows2 = (hist2 + ((-hist2) % LANES)) // LANES
    stored2 = rrows2 * keep2
    rows_c2 = jax.ops.segment_sum(
        stored2.reshape(-1), g2.reshape(-1), num_segments=nchild)
    alloc2 = rows_c2 + CHUNK_ROWS
    start2 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(alloc2, dtype=jnp.int32)[:-1]])
    excl2 = jnp.cumsum(stored2, axis=0, dtype=jnp.int32) - stored2
    base2 = jnp.take(excl2, jnp.take(tbl["tbase"], parent2), axis=0)
    dst2 = jnp.where(
        keep2 != 0,
        jnp.take(start2, g2.reshape(-1)).reshape(g2.shape)
        + excl2 - base2,
        -1,
    )
    padv2 = jnp.take(tbl["l2b"], g2.reshape(-1)).reshape(g2.shape)
    s_planes = route_level(
        w, tbl["meta2"], hist2, dst2, padv2, bg.s_rows, bg.t2cap,
        pitch2, rmax, nlex=nlex, bias_input=False, interpret=interpret,
    )
    reals_t = jnp.where(tbl["heavy_mask"] != 0, tbl["heavy_real"], real2)
    occ_t = jnp.where(tbl["term_mode"] == 0, rows_c2, 0)
    outs, _, _ = _finish(
        s_planes, reals_t, occ_t, start2, tbl["term_mode"],
        tbl["term_fill"], tbl["term_valid"] != 0, g.n, g.cap_rows,
        g.w_rows, nlex, interpret, nclasses,
        out_base=tbl["out_base"], outs0=w, slice_n=False,
    )
    return outs


@functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def _step_extract(w, *, n: int):
    return tuple(
        jax.lax.bitcast_convert_type(p.reshape(-1)[:n], jnp.uint32)
        for p in w
    )


@functools.partial(jax.jit, static_argnames=("spans",),
                   donate_argnums=(0,))
def _step_compact(w, *, spans):
    """Lossless retry path: re-extract the element multiset from the
    post-L1 W (region d = cnt[d] real elements then pads, the pinned
    drain-last layout).  ``spans`` = static ((start_elem, length), ...)."""
    outs = []
    for p in w:
        flat = p.reshape(-1)
        seg = jnp.concatenate([
            jax.lax.dynamic_slice(flat, (s,), (ln,)) for s, ln in spans
        ])
        outs.append(jax.lax.bitcast_convert_type(
            seg ^ np.int32(-0x80000000), jnp.uint32))
    return tuple(outs)


# ===================================================== driver

def sort_v5(
    keys: jax.Array,
    vals: Tuple[jax.Array, ...] = (),
    cfg: Optional[SortConfig] = None,
    timer: Optional[PhaseTimer] = None,
    _nb_mult: float = 1.0,
    _depth: int = 0,
):
    """Sort uint32 keys (with 0..2 uint32 payload planes) in place on
    one chip: peak engine HBM ~= (1 + v5_batch_frac) x N.

    Ordering matches sort_v4: lexicographic by (key, *vals).  The input
    arrays are not consumed; the engine working set is W (+frac) beside
    them — callers needing the resident >half-HBM path should deliver
    data through ``sort_v5_from_chunks`` instead of one big array.
    """
    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    n = int(keys.shape[0])
    thr = cfg.min_engine_n if cfg.min_engine_n is not None else (1 << 22)
    if n < thr and _depth == 0:
        return engine_v4.sort_v4(keys, vals, cfg, timer)
    with jax.enable_x64(False):
        return _sort_v5_body(keys, vals, cfg, timer, _nb_mult, _depth, n)


def sort_v5_from_chunks(
    chunk_fn,
    nchunks: int,
    n: int,
    cfg: Optional[SortConfig] = None,
    timer: Optional[PhaseTimer] = None,
    raw: bool = False,
):
    """Resident in-place sort of n elements delivered as ``nchunks``
    plane-tuples by ``chunk_fn(i)`` — W is assembled chunk by chunk
    (peak = W + one chunk), so inputs larger than half of HBM can be
    sorted resident (2^31 u32 on one 16 GB chip).  Every chunk except
    the last must be a multiple of 128 elements.

    ``raw=True`` returns the sorted planes as the FULL row-padded W
    buffers in their native 2D (w_rows, 128) **int32** form: raw uint32
    bit patterns, row-major prefix of n real elements, slack junk past
    n.  This is the identity on the engine buffers — truly zero extra
    HBM.  Neither a u32 bitcast (donation matches dtype) nor a 1D
    reshape (layout retiling) can alias, and either costs a second W —
    the OOM the chunked path exists to avoid at 2^31 on a 16 GB chip.
    Validate/consume raw results slab-by-slab
    (``utils.checking.raw_check_2d``) or stream them out row-wise.
    The default (n,)-exact extraction costs one more N-sized buffer."""
    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    with jax.enable_x64(False):
        return _sort_v5_core(chunk_fn, nchunks, cfg, timer, 1.0, 0, n,
                             len(chunk_fn(0)), raw=raw)


def _sort_v5_body(keys, vals, cfg, timer, nb_mult, depth, n):
    planes = (keys,) + tuple(vals)
    return _sort_v5_core(lambda i: planes, 1, cfg, timer, nb_mult,
                         depth, n, len(planes))


def _sort_v5_core(chunk_fn, nchunks, cfg, timer, nb_mult, depth, n,
                  nplanes, raw=False):
    interp = cfg.interpret
    g = _v5_geometry(n, nplanes, cfg, nb_mult)

    with timer.phase("part_first"):
        w = _step_wzero(g=g, nplanes=nplanes)
        row0 = 0
        for i in range(nchunks):
            planes_i = chunk_fn(i)
            celems = int(planes_i[0].shape[0])
            assert i == nchunks - 1 or celems % LANES == 0, celems
            w = _step_wput(w, planes_i, jnp.int32(row0))
            row0 += _ceil_div(celems, LANES)
        del planes_i

    with timer.phase("sample"):
        stats = np.asarray(jax.device_get(
            _step_stats(w, g=g, salt=depth)))
        rows = max(n // LANES, 1)
        neff = max(1, min(g.ssz, rows))
        S = min(n, g.ssz) if (rows <= 1 or neff >= rows) else neff
        try:
            plan = _v5_plan(stats, S, nplanes, cfg, g.nb_want, g.rmax)
        except ValueError:
            engine_v4.FALLBACK_STATS["plan"] += 1
            planes2 = _step_extract(w, n=n)
            return _xla_fallback(planes2[0], planes2[1:])

    with timer.phase("part_first"):
        l1b = jnp.asarray(_bias_np(plan.l1_bounds_u.astype(np.uint32)))
        meta1 = np.zeros(((g.ntiles1 + 1) * 3,), np.int32)
        for t in range(g.ntiles1):
            meta1[t * 3 + 1] = t * g.pitch1
            meta1[t * 3 + 2] = min(n - t * g.pitch1 * LANES,
                                   g.pitch1 * LANES)
        hist1 = _step_hist1(w, jnp.asarray(meta1), l1b, g=g,
                            interpret=interp)
        h = np.asarray(jax.device_get(hist1)).astype(np.int64)

    (meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl, cnt, nblk, Fbase,
     src) = _seqroute_tables(h, g, plan)
    sched = permute_schedule(src)
    batches, bg = _plan_batches(g, plan, nblk, cfg.v5_batch_frac)

    with timer.phase("part_blocks"):
        w = _step_partition(
            w, jnp.asarray(meta5), jnp.asarray(cnt_tbl),
            jnp.asarray(base_tbl), jnp.asarray(slot_tbl),
            jnp.asarray(padv_tbl), jnp.asarray(sched),
            g=g, nlex=nplanes - 1, interpret=interp,
        )

    with timer.phase("local_sort"):
        # non-destructive precheck for every batch, then ONE flag fetch
        # BEFORE any terminal writes: an overflow is detected while W
        # still holds every element
        tbls, hist2s, overs = [], [], []
        out_base = 0
        for batch in batches:
            tbl = {k: jnp.asarray(v) for k, v in _batch_tables(
                g, plan, bg, batch, nblk, Fbase, cnt, out_base).items()}
            h2, ov = _step_hist2(w, tbl, g=g, bg=bg, interpret=interp)
            tbls.append(tbl)
            hist2s.append(h2)
            overs.append(ov)
            out_base += int(sum(int(cnt[gi]) for gi in batch))
        over = int(np.max(np.asarray(
            jax.device_get(jnp.stack(overs))))) if overs else 0

        if over:
            spans = tuple(
                (int(Fbase[d]) * BLK, int(cnt[d]))
                for d in range(plan.ng) if int(cnt[d]) > 0
            )
            planes2 = _step_compact(w, spans=spans)
            if depth < 2:
                engine_v4.FALLBACK_STATS["retry"] += 1
                return _sort_v5_body(planes2[0], planes2[1:], cfg,
                                     timer, nb_mult * 2.0, depth + 1, n)
            # plane-0 refinement exhausted: multi-plane inputs recurse
            # into the lower planes (deep.deep_sort), keys-only fall
            # back to XLA (engine_v4._exhausted)
            return engine_v4._exhausted(planes2[0], planes2[1:], cfg,
                                        timer, 0)

        for h2, tbl in zip(hist2s, tbls):
            w = _step_batch(
                w, h2, tbl, g=g, bg=bg, nlex=nplanes - 1,
                interpret=interp, nclasses=cfg.term_classes,
            )
        if raw:
            # raw extraction is the IDENTITY: the (w_rows, 128) int32
            # planes are the result (raw uint32 bit patterns; row-major
            # prefix of n elements).  Any dtype/shape change here costs
            # a second W: XLA donation matches on (shape, dtype), so an
            # i32 -> u32 bitcast cannot alias (seen OOM at 2^31), and a
            # 1D reshape retiles (8,128) -> (1024) layouts.  Consumers
            # bitcast slab-by-slab (utils.checking.raw_check_2d).
            final = w
        else:
            final = _step_extract(w, n=n)
        timer.sync(final[0])
        if n:
            jax.device_get(final[0][-1:])

    return final[0], tuple(final[1:])


