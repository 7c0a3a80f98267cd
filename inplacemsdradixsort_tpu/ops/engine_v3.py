"""v3 engine: sample-planned, device-resident MSD range sort.

Pipeline (the reference ``sort_thread`` P1-P12 pipeline,
/root/reference/src/msb_64.c:1477-2259, re-shaped for TPU dispatch costs):

1. SAMPLE (device) + PLAN (host): draw a uniform sample, sort it on
   device, fetch it once, and derive on host: duplicate-aware equal-depth
   final-bucket bounds (``extract_delimiters`` analog, msb_64.c:1304-1322),
   a two-level grouping (L1 ranges x L2 sub-ranges, the NUMA x thread
   decomposition :206-237), per-bucket capacity allocations with ``fudge``
   slack (:1574-1578), heavy-duplicate isolation (:1313-1320), and all
   static tile/child tables.  This is the ONLY host round-trip.
2. L1 / L2 partition (``partition_level`` kernel): tiles are sorted in
   VMEM and their row-aligned runs DMA'd to per-child cursors.
3. TERMINAL (``terminal_sort_write`` kernel): per final bucket, in-VMEM
   sort + trim + exact-position splice into the output.

Capacities are *estimates* from the sample; genuine overflow is detected
on device and reported — the engine retries once with a larger fudge
(the reference instead asserts on insufficient fudge, README.md:27-29).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import PhaseTimer
from .kernels_v3 import (LANES, CHUNK_ROWS, partition_level,
                         terminal_sort_write)

U32_MAX = np.uint32(0xFFFFFFFF)


def _bias_np(u: np.ndarray) -> np.ndarray:
    return (u.astype(np.uint32) ^ np.uint32(0x80000000)).view(np.int32)


def _ceil_div(a, b):
    return -(-a // b)


def _shape_class(x: int, steps_per_octave: int = 8) -> int:
    """Round up to a coarse size class (recompile only across classes)."""
    if x <= 1024:
        return 1024
    e = math.floor(math.log2(x))
    step = max(1, (1 << e) // steps_per_octave)
    return _ceil_div(x, step) * step


# ============================================================== plan

@dataclasses.dataclass
class _Plan:
    """Host-side static structure for one sort invocation."""
    n: int
    pairs: bool
    # topology
    nparents: int            # padded L1 range count (static class)
    rmax: int                # ranges per parent at both levels (static)
    pitch: int               # tile data rows (sort_rows - rmax)
    sort_rows: int
    cap_rows: int            # terminal bucket capacity (rows, pow2 class)
    one_level: bool
    # level 1
    l1_bounds: np.ndarray    # (1, rmax1) biased  — rmax1 == nparents slots
    arena1_rows: int
    l1_dst_start: np.ndarray  # (nparents,)
    l1_dst_cap: np.ndarray
    l1_tiles: np.ndarray      # (ntiles1, 4)
    # level 2 (absent when one_level)
    l2_bounds: np.ndarray     # (nparents, rmax) biased
    arena2_rows: int
    l2_dst_start: np.ndarray  # (nchild,)
    l2_dst_cap: np.ndarray
    l2_tiles: np.ndarray      # (ntiles2, 4): parent, src_row, local_off
    # terminal
    term_src_row: np.ndarray  # (nb,) bucket start row in terminal arena
    term_child: np.ndarray    # (nb,) child index that produced the bucket
    term_mode: np.ndarray     # (nb,) 0 sort / 1 value-fill
    term_fill: np.ndarray     # (nb,) raw uint32 fill value
    term_valid: np.ndarray    # (nb,) bool: False for grid-padding entries
    group_len: np.ndarray     # (nparents,) sub-ranges per L1 group
    out_rows: int


@functools.partial(jax.jit, static_argnames=("ssz", "nbq"))
def _sample_stats(keys: jax.Array, *, ssz: int, nbq: int):
    """Device side of the splitter planner: draw an element-granular
    random sample, sort it, and return the equal-depth quantile picks with
    their left/right ranks in the sorted sample — a few KB instead of the
    whole sample (D2H over the tunnel is latency- and bandwidth-expensive).

    One element per random row (a row gather + per-row lane pick), NOT
    whole 128-lane rows: row-granular samples are worthless on inputs
    whose neighboring keys are correlated (e.g. sequential generators) —
    the effective sample size drops 128x and the per-bucket capacity
    estimates miss real skew (observed as 2x cap overruns on a
    dup-heavy structured input at 2^26)."""
    n = keys.shape[0]
    rows = max(n // LANES, 1)
    neff = max(1, min(ssz, rows))
    if rows <= 1 or neff >= rows:
        s = jnp.sort(keys[: min(n, ssz)])
    else:
        key = jax.random.key(n & 0xFFFF)
        idx = jax.random.randint(key, (neff,), 0, rows, dtype=jnp.int32)
        picked = jnp.take(
            keys[: rows * LANES].reshape(rows, LANES), idx, axis=0
        )
        # decorrelating lane pick: one pseudo-random lane per sampled row
        lane = (idx * 89 + jnp.arange(neff, dtype=jnp.int32) * 37) % LANES
        s = jnp.sort(
            jnp.take_along_axis(picked, lane[:, None], axis=1).reshape(-1)
        )
    S = s.shape[0]
    # host-side int64 math: jnp would silently downcast to int32 and
    # overflow at nbq * S > 2^31
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


def _quantile_bounds(picks_u32: np.ndarray, left: np.ndarray,
                     right: np.ndarray, S: int, heavy_frac: float,
                     cap_frac: float):
    """Duplicate-aware equal-depth bounds (inclusive uppers, uint32).

    Host side of the planner, from device-computed quantile stats.
    Mirrors the reference's splitter extraction + duplicate shifting
    (msb_64.c:1304-1322): heavy values get an isolated single-value
    bucket [v, v] by inserting a bound at v-1.
    Returns (bounds (nb,), est_frac (nb,), is_heavy (nb,)).
    """
    picks = picks_u32.astype(np.uint64)
    order = np.argsort(picks, kind="stable")
    picks, left, right = picks[order], left[order], right[order]
    uniq, first = np.unique(picks, return_index=True)
    u_left, u_right = left[first], right[first]
    cnt = u_right - u_left

    heavy = cnt / S >= heavy_frac
    # candidate bounds = unique picks, plus v-1 before each heavy value v
    # (isolating v as its own single-value bucket); each candidate keeps
    # its right-rank in the sorted sample (rank of v-1 == left rank of v)
    b_list = [uniq]
    r_list = [u_right]
    hv = uniq[heavy]
    hl = u_left[heavy]
    keep = hv >= 1
    b_list.append(hv[keep] - 1)
    r_list.append(hl[keep])
    b = np.concatenate(b_list)
    r = np.concatenate(r_list)
    o = np.argsort(b, kind="stable")
    b, r = b[o], r[o]
    b, idx = np.unique(b, return_index=True)
    r = r[idx]
    if b[-1] != int(U32_MAX):
        b = np.concatenate([b, [np.uint64(U32_MAX)]])
        r = np.concatenate([r, [S]])
    else:
        r[-1] = S

    # greedy coalesce: drop candidate bounds while the merged bucket mass
    # stays under cap_frac (finer-than-needed picks get merged back; skew
    # regions keep every bound they need).  Closes BEFORE exceeding
    # cap_frac — an overshooting close would make the typical worst
    # bucket ~cap_frac * (1 + 1/picks_per_bucket), which at high
    # occupancy targets blows the terminal capacity and silently doubles
    # runtime through the retry ladder.
    est0 = np.diff(np.concatenate([[0], r])) / S
    lo0 = np.concatenate([[-1], b[:-1].astype(np.int64)])
    heavy0 = (b.astype(np.int64) == lo0 + 1) & (est0 >= heavy_frac)
    keep_idx = []
    acc = 0.0
    for j in range(len(b)):
        if acc > 0.0 and acc + est0[j] > cap_frac and not heavy0[j]:
            keep_idx.append(j - 1)
            acc = 0.0
        acc += est0[j]
        if heavy0[j] or j == len(b) - 1 or (
            j + 1 < len(b) and heavy0[j + 1]
        ):
            keep_idx.append(j)
            acc = 0.0
    ki = np.unique(np.array(keep_idx))
    b, r = b[ki], r[ki]

    est = np.diff(np.concatenate([[0], r])) / S
    lo_excl = np.concatenate([[-1], b[:-1].astype(np.int64)])
    is_heavy = (b.astype(np.int64) == lo_excl + 1) & (est >= heavy_frac)
    return b.astype(np.uint32), est, is_heavy


def _plan_geometry(n: int, pairs: bool, fudge: float, cfg: SortConfig):
    if cfg.v3_cap_rows:
        cap_rows = cfg.v3_cap_rows
    else:
        cap_rows = 1024 if not pairs else 512
        if n >= (1 << 28):
            cap_rows *= 2        # keep the bucket count in topology range
    target = int(cap_rows * LANES * 0.60 / fudge)  # aim per final bucket
    nb_want = max(1, _ceil_div(n, target))
    return cap_rows, nb_want


def make_plan(n: int, stats: np.ndarray, S: int, pairs: bool,
              cfg: SortConfig, fudge: Optional[float] = None) -> _Plan:
    fudge = fudge if fudge is not None else max(cfg.fudge, 1.2)
    cap_rows, nb_want = _plan_geometry(n, pairs, fudge, cfg)

    heavy_frac = max(0.3 / nb_want, 0.002)
    bounds, est, is_heavy = _quantile_bounds(
        stats[0].view(np.uint32), stats[1], stats[2], S, heavy_frac,
        cap_frac=1.0 / nb_want,
    )
    nb = len(bounds)
    rmax = cfg.v3_rmax or (
        32 if nb <= 1024 else (
            48 if nb <= 2304 else (64 if nb <= 4096 else 96))
    )
    nparents = rmax                                 # square topology
    sort_rows = cfg.v3_sort_rows
    pitch = sort_rows - rmax
    assert pitch > 0, (sort_rows, rmax)

    # ---- group consecutive final buckets into L1 ranges.  Even count
    # split always fits the (nparents x rmax) topology since
    # nb <= nparents*rmax; mass balance is handled by per-group capacity
    # estimates, not by the grouping.
    if nb > nparents * rmax:
        raise ValueError(f"too many buckets {nb} for topology")
    per = _ceil_div(nb, nparents)
    groups = [
        list(range(i, min(i + per, nb))) for i in range(0, nb, per)
    ]
    ng = len(groups)
    ntiles1 = _ceil_div(_ceil_div(n, LANES), pitch)

    # ---- capacities
    def rows_for(frac: float, ntiles_feeding: int) -> int:
        """Usable capacity in rows: estimate * fudge + 4-sigma sampling
        slack + phantom growth.  The allocation spacing adds CHUNK_ROWS
        on top (fixed-chunk scatter DMAs over-copy up to CHUNK_ROWS-1
        rows past the cursor; that slack must never reach the next
        child's region)."""
        est_elems = frac * n * fudge
        # binomial sampling noise of the estimate: std ~ n*sqrt(p/S)
        est_elems += 4.0 * n * math.sqrt(max(frac, 1e-12) / max(S, 1))
        r = _ceil_div(int(est_elems), LANES)
        r += ntiles_feeding          # phantom pad growth bound
        return int(r)

    group_est = np.array([sum(est[j] for j in g) for g in groups])
    group_heavy_drop = [
        (not pairs) and len(g) == 1 and bool(is_heavy[g[0]])
        for g in groups
    ]

    l1_cap = np.zeros(nparents, np.int64)
    for gi, g in enumerate(groups):
        l1_cap[gi] = 0 if group_heavy_drop[gi] else rows_for(
            group_est[gi], ntiles1
        )
    l1_alloc = np.where(l1_cap > 0, l1_cap + CHUNK_ROWS, 0)
    l1_start = np.zeros(nparents, np.int64)
    l1_start[1:] = np.cumsum(l1_alloc)[:-1]
    # quantize the (data-dependent) arena size so recompiles are rare
    arena1_rows = _shape_class(
        int(np.cumsum(l1_alloc)[-1]) + pitch + 1
    )

    l1_bounds_u = np.full(rmax, int(U32_MAX), np.uint64)
    for gi, g in enumerate(groups):
        l1_bounds_u[gi] = bounds[g[-1]]
    l1_bounds = _bias_np(l1_bounds_u.astype(np.uint32)).reshape(1, rmax)

    l1_tiles = np.zeros((max(ntiles1, 1), 4), np.int32)
    for t in range(ntiles1):
        l1_tiles[t] = (0, t * pitch, t * pitch * LANES, 0)

    # ---- level 2
    nchild = nparents * rmax
    l2_bounds_u = np.full((nparents, rmax), int(U32_MAX), np.uint64)
    l2_cap = np.zeros(nchild, np.int64)
    term_child = []
    term_mode = []
    term_fill = []
    for gi, g in enumerate(groups):
        if group_heavy_drop[gi]:
            # dropped at L1; terminal = value fill, no child storage
            l2_bounds_u[gi, :] = bounds[g[0]]   # pad values stay in-range
            term_child.append(-1 - gi)   # encodes: real count from L1
            term_mode.append(1)
            term_fill.append(int(bounds[g[0]]))
            continue
        ntiles_g = _ceil_div(int(l1_cap[gi]), pitch)
        for sj, j in enumerate(g):
            c = gi * rmax + sj
            l2_bounds_u[gi, sj] = bounds[j]
            if (not pairs) and is_heavy[j] and len(g) > 1:
                l2_cap[c] = 0
                term_child.append(c)
                term_mode.append(1)
                term_fill.append(int(bounds[j]))
            else:
                # + inflow of L1 phantom pads cycled over this group's
                # sub-ranges (see kernels_v3 pad sinks)
                inflow = _ceil_div(ntiles1, max(len(g), 1)) + 4
                l2_cap[c] = min(
                    rows_for(float(est[j]), ntiles_g) + inflow, cap_rows
                )
                term_child.append(c)
                term_mode.append(0)
                term_fill.append(0)
        # trailing empty ranges keep bound = group's last bound => hist 0
        for sj in range(len(g), rmax):
            l2_bounds_u[gi, sj] = l2_bounds_u[gi, len(g) - 1]

    l2_alloc = np.where(l2_cap > 0, l2_cap + CHUNK_ROWS, 0)
    l2_start = np.zeros(nchild, np.int64)
    l2_start[1:] = np.cumsum(l2_alloc)[:-1]
    arena2_rows = _shape_class(
        int(np.cumsum(l2_alloc)[-1]) + cap_rows + 1
    )
    l2_bounds = _bias_np(
        l2_bounds_u.reshape(-1).astype(np.uint32)
    ).reshape(nparents, rmax)

    l2_tiles_list = []
    for gi in range(ng):
        ntg = _ceil_div(int(l1_cap[gi]), pitch)
        for t in range(ntg):
            l2_tiles_list.append(
                (gi, int(l1_start[gi]) + t * pitch, t * pitch * LANES, 0)
            )
    # pad the tile grid to a size class with dead tiles (local offset
    # beyond any possible fill => nelems 0 => skipped)
    nt2 = _shape_class(max(len(l2_tiles_list), 1))
    while len(l2_tiles_list) < nt2:
        l2_tiles_list.append((0, 0, (1 << 30), 0))
    l2_tiles = np.array(l2_tiles_list, np.int32).reshape(-1, 4)

    # pad the terminal grid to a size class with empty buckets
    nb_total = _shape_class(max(len(term_child), 1))
    term_valid = [True] * len(term_child)
    while len(term_child) < nb_total:
        term_child.append(0)
        term_mode.append(0)
        term_fill.append(0)
        term_valid.append(False)
    term_src = np.zeros(nb_total, np.int64)
    for i, c in enumerate(term_child):
        term_src[i] = l2_start[c] if c >= 0 else 0

    out_rows = _ceil_div(n, LANES) + 2 * CHUNK_ROWS + 2

    return _Plan(
        n=n, pairs=pairs,
        nparents=nparents, rmax=rmax, pitch=pitch, sort_rows=sort_rows,
        cap_rows=cap_rows, one_level=False,  # always run both levels
        l1_bounds=l1_bounds.astype(np.int32),
        arena1_rows=arena1_rows,
        l1_dst_start=l1_start.astype(np.int32),
        l1_dst_cap=l1_cap.astype(np.int32),
        l1_tiles=l1_tiles,
        l2_bounds=l2_bounds.astype(np.int32),
        arena2_rows=arena2_rows,
        l2_dst_start=l2_start.astype(np.int32),
        l2_dst_cap=l2_cap.astype(np.int32),
        l2_tiles=l2_tiles,
        term_src_row=term_src.astype(np.int32),
        term_child=np.array(term_child, np.int32),
        term_mode=np.array(term_mode, np.int32),
        term_fill=np.array(term_fill, np.int64),   # raw uint32 values
        term_valid=np.array(term_valid, bool),
        group_len=np.array(
            [max(len(g), 1) for g in groups]
            + [1] * (nparents - ng), np.int64
        ).astype(np.int32),
        out_rows=out_rows,
    )


# ============================================================== engine

def _pack_tables(plan: "_Plan"):
    """Pack every plan table into ONE int32 array (a single H2D transfer —
    each separate upload pays tens of ms of tunnel latency) plus a static
    (name, offset, shape) layout for in-jit unpacking."""
    fill_biased = (
        (plan.term_fill.astype(np.uint32) ^ np.uint32(0x80000000))
        .view(np.int32)
    )
    tables = dict(
        l1_tiles=plan.l1_tiles, l1_bounds=plan.l1_bounds,
        l1_start=plan.l1_dst_start, l1_cap=plan.l1_dst_cap,
        l2_tiles=plan.l2_tiles, l2_bounds=plan.l2_bounds,
        l2_start=plan.l2_dst_start, l2_cap=plan.l2_dst_cap,
        group_len=plan.group_len,
        term_src=plan.term_src_row, term_child=plan.term_child,
        term_mode=plan.term_mode, term_fill=fill_biased,
        term_valid=plan.term_valid.astype(np.int32),
    )
    layout = []
    chunks = []
    off = 0
    for name, arr in tables.items():
        a = np.ascontiguousarray(arr, dtype=np.int32)
        layout.append((name, off, a.shape))
        chunks.append(a.reshape(-1))
        off += a.size
    packed = np.concatenate(chunks)
    return packed, tuple(layout)


def _unpack(packed, layout):
    out = {}
    for name, off, shape in layout:
        size = int(np.prod(shape)) if shape else 1
        out[name] = jax.lax.dynamic_slice_in_dim(
            packed, off, size
        ).reshape(shape)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "layout", "pairs", "pitch", "rmax", "nparents", "arena1_rows",
        "arena2_rows", "cap_rows", "out_rows", "n", "interpret",
    ),
)
def _pipeline(
    keys, rids, packed,
    *, layout, pairs: bool, pitch: int, rmax: int, nparents: int,
    arena1_rows: int, arena2_rows: int, cap_rows: int, out_rows: int,
    n: int, interpret: bool,
):
    """The whole post-plan device pipeline as ONE program: L1 partition,
    L2 partition, phantom-count correction, terminal sort + splice."""
    tb = _unpack(packed, layout)
    l1_tiles, l1_bounds = tb["l1_tiles"], tb["l1_bounds"]
    l1_start, l1_cap = tb["l1_start"], tb["l1_cap"]
    l2_tiles, l2_bounds = tb["l2_tiles"], tb["l2_bounds"]
    l2_start, l2_cap = tb["l2_start"], tb["l2_cap"]
    group_len = tb["group_len"]
    term_src, term_child = tb["term_src"], tb["term_child"]
    term_mode, term_fill_biased = tb["term_mode"], tb["term_fill"]
    term_valid = tb["term_valid"] != 0
    def _i32(x):
        return (jax.lax.bitcast_convert_type(x, jnp.int32)
                if x.dtype != jnp.int32 else x)

    ntiles1 = l1_tiles.shape[0]
    rows_in = ntiles1 * pitch
    pad = rows_in * LANES - n
    k2 = jnp.concatenate([
        _i32(keys), jnp.zeros((pad,), jnp.int32)
    ]).reshape(rows_in, LANES)
    v2 = None
    if pairs:
        v2 = jnp.concatenate([
            _i32(rids) ^ np.int32(-0x80000000),
            jnp.zeros((pad,), jnp.int32),
        ]).reshape(rows_in, LANES)

    nchild2 = nparents * rmax
    a1, va1, occ1, real1, pads1, over1 = partition_level(
        k2, v2, l1_tiles, jnp.zeros((1,), jnp.int32), l1_bounds,
        l1_start, l1_cap, arena1_rows, pitch, rmax,
        parent_fill=jnp.array([n], jnp.int32),
        sink_base=jnp.arange(nparents, dtype=jnp.int32) * rmax,
        sink_cnt=group_len,
        padsrc=l2_bounds,
        nsinks=nchild2,
        pad_stride=rmax,
        bias_input=True, interpret=interpret,
    )
    a2, va2, occ2, real2, pads2, over2 = partition_level(
        a1, va1, l2_tiles,
        jnp.arange(nparents, dtype=jnp.int32) * rmax,
        l2_bounds, l2_start, l2_cap, arena2_rows, pitch, rmax,
        parent_fill=occ1 * LANES,
        sink_base=jnp.arange(nchild2, dtype=jnp.int32),
        sink_cnt=jnp.ones((nchild2,), jnp.int32),
        padsrc=l2_bounds.reshape(nchild2, 1),
        nsinks=nchild2,
        pad_stride=1,
        bias_input=False, interpret=interpret,
    )

    # L2 histograms counted the L1 phantom pads as data; the pad-sink
    # accounting makes the correction exact per child
    real2c = real2 - pads1

    reals_t = jnp.where(
        term_child >= 0,
        jnp.take(real2c, jnp.maximum(term_child, 0)),
        jnp.take(real1, jnp.maximum(-1 - term_child, 0)),
    )
    reals_t = jnp.where(term_valid, reals_t, 0).astype(jnp.int32)
    occ_t = jnp.where(
        term_child >= 0, jnp.take(occ2, jnp.maximum(term_child, 0)), 0
    ).astype(jnp.int32)
    # bound every terminal access even when the overflow flag is set (the
    # host retries, but the device must never DMA out of bounds): under
    # L2 cap overflow a bucket's histogram-derived real count exceeds its
    # stored occ*LANES elements, and an unclamped count would drive the
    # terminal writer's chunk reads past its VMEM stream buffer
    reals_t = jnp.where(
        term_mode == 0, jnp.minimum(reals_t, occ_t * LANES), reals_t
    )
    ends = jnp.minimum(jnp.cumsum(reals_t), n).astype(jnp.int32)
    out_off = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    reals_t = (ends - out_off).astype(jnp.int32)

    btbl = jnp.stack([term_src, occ_t, reals_t, term_mode], axis=1)
    out, vout = terminal_sort_write(
        a2, va2, btbl, term_fill_biased, out_off,
        out_rows, cap_rows, unbias_output=True, interpret=interpret,
    )
    final_k = jax.lax.bitcast_convert_type(
        out.reshape(-1)[:n], jnp.uint32
    )
    final_v = (
        jax.lax.bitcast_convert_type(vout.reshape(-1)[:n], jnp.uint32)
        if pairs else None
    )
    return final_k, final_v, over1[0] | over2[0]


def sort_v3(
    keys: jax.Array,
    rids: Optional[jax.Array] = None,
    cfg: Optional[SortConfig] = None,
    timer: Optional[PhaseTimer] = None,
    _fudge: Optional[float] = None,
    _depth: int = 0,
):
    """Sort uint32 keys (optionally with uint32 rids) on one chip.

    Pairs mode orders lexicographically by (key, rid) — a stable key sort
    when rids are the original indices, and a full uint64 sort when
    (key, rid) are the (hi, lo) words.
    """
    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    n = int(keys.shape[0])
    pairs = rids is not None
    if n < (1 << 16) and _fudge is None:
        # small inputs: one XLA sort dispatch beats the pipeline setup
        return _xla_fallback(keys, rids)
    interp = cfg.interpret
    # the engine is uint32-native; tracing it under an ambient x64
    # context leaks int64 into Mosaic lowering
    with jax.enable_x64(False):
        return _sort_v3_body(keys, rids, cfg, timer, _fudge, _depth,
                             n, pairs, interp)


def _sort_v3_body(keys, rids, cfg, timer, _fudge, _depth, n, pairs,
                  interp):

    # ---- P1-P3: sample, sort, plan (one host round-trip, a few KB)
    with timer.phase("sample"):
        ssz = int(min(max(cfg.sample_rate * n, 4096), cfg.sample_cap))
        ssz = min(ssz, n)
        fudge_now = _fudge if _fudge is not None else max(cfg.fudge, 1.2)
        _, nb_want = _plan_geometry(n, pairs, fudge_now, cfg)
        stats = np.asarray(jax.device_get(
            _sample_stats(keys, ssz=ssz, nbq=4 * nb_want)
        ))
        # replicate _sample_stats' sample-size computation
        rows = max(n // LANES, 1)
        neff = max(1, min(ssz, rows))
        S = min(n, ssz) if (rows <= 1 or neff >= rows) else neff
        try:
            plan = make_plan(n, stats, S, pairs, cfg, _fudge)
        except ValueError:
            # skew beyond the planner's topology — fall back
            return _xla_fallback(keys, rids)

    # ---- P4-P12 as one fused device program, tables as one upload
    with timer.phase("part_blocks"):
        packed, layout = _pack_tables(plan)
        final_k, final_v, over = _pipeline(
            keys, rids if pairs else jnp.zeros((1,), jnp.uint32),
            jnp.asarray(packed),
            layout=layout,
            pairs=pairs, pitch=plan.pitch, rmax=plan.rmax,
            nparents=plan.nparents, arena1_rows=plan.arena1_rows,
            arena2_rows=plan.arena2_rows, cap_rows=plan.cap_rows,
            out_rows=plan.out_rows, n=n, interpret=interp,
        )
        timer.sync(final_k)

    # ---- overflow check (rides the output fetch; retry if hit)
    over = int(jax.device_get(over))
    if over:
        if _depth < 2:
            bigger = (_fudge or max(cfg.fudge, 1.2)) * 1.6
            return sort_v3(keys, rids, cfg, timer, _fudge=bigger,
                           _depth=_depth + 1)
        return _xla_fallback(keys, rids)
    return final_k, (final_v if pairs else None)


def _xla_fallback(keys, rids):
    """Correctness net for adversarial skew the sampled plan cannot fit
    (the reference instead aborts on insufficient fudge, README.md:27-29).

    Must match the engine's pairs contract: lexicographic (key, rid) —
    the u64 path relies on rids being the low key words."""
    if rids is not None:
        k, v = jax.lax.sort((keys, rids), num_keys=2)
        return k, v
    return jnp.sort(keys), None
