"""Out-of-core chunked sort: inputs larger than the resident HBM budget.

The reference's answer to "data bigger than one memory domain" is its
128-way range partition + block exchange: every domain sends each key
range to its owner, the owner sorts locally (SURVEY §5.7; the
combine/balance/swap pipeline, /root/reference/src/msb_64.c:1672-2158).
On one chip the analogous scarcity is HBM itself: 2^31 u32 keys are 8 GiB
— no out-of-place pipeline fits input + arenas at once.

``sort_external`` is that exchange with the chip as the single compute
domain and the *caller's source* as the other: an external-sort-style
two-read schedule over caller-supplied chunks,

1. SAMPLE  - stream chunks once, draw per-chunk samples, free each chunk
             (reference P1-P3, msb_64.c:1511-1613, duplicate-aware
             equal-depth bounds with heavy-value isolation).
2. COUNT   - stream chunks again (same pass as 3): exact per-(tile,
             range) histograms (P5's count role).
3. ROUTE   - route each chunk's tiles into ONE shared range-major arena
             at exact precomputed positions (the deterministic
             replacement for P6-P10's block exchange: no combine, no
             balancing, no atomics — positions follow from the exact
             counts).  The arena is accumulated across chunk calls via
             buffer aliasing; peak memory = arena + one chunk ~ 1.3xN.
4. LOCAL   - per range: slice, fully sort with the v4 engine, trim the
             row-alignment phantoms (value = range upper bound, so they
             sort to the range tail exactly like v4's terminal trim), and
             YIELD the sorted piece (P12 + inject P11).

The output is a stream of contiguous sorted ranges — the chunked analog
of the reference's per-NUMA-node result arrays (msb_64.h:37: ``sort``
returns each node holding one contiguous key range).

The caller's ``chunk_fn(i)`` is invoked twice per chunk (once for
sampling+counting, once for routing); for generated or disk-backed data
this is the standard external-sort trade.
"""

from __future__ import annotations

import functools
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import PhaseTimer
from .engine_v3 import _bias_np, _ceil_div, _quantile_bounds, _shape_class
from .engine_v4 import sort_v4
from .kernels_v4 import BIAS, CHUNK_ROWS, LANES, SENT, hist_level, route_level

U32_MAX = np.uint32(0xFFFFFFFF)


def _rmax_class(nb: int) -> int:
    for c in (16, 32, 48, 64, 96):
        if nb <= c:
            return c
    raise ValueError(f"too many ranges {nb}")


def _draw_sample(chunk: jax.Array, ssz: int, salt: int) -> jax.Array:
    """Element-granular uniform sample of one chunk (device)."""
    n = int(chunk.shape[0])
    rows = max(n // LANES, 1)
    if rows <= 1 or ssz >= rows:
        return chunk[: min(n, ssz)]
    key = jax.random.key((n & 0xFFFFFF) ^ (salt * 2654435761 & 0x7FFFFFFF))
    idx = jax.random.randint(key, (ssz,), 0, rows, dtype=jnp.int32)
    picked = jnp.take(chunk[: rows * LANES].reshape(rows, LANES), idx,
                      axis=0)
    lane = (idx * 89 + jnp.arange(ssz, dtype=jnp.int32) * 37) % LANES
    return jnp.take_along_axis(picked, lane[:, None], axis=1).reshape(-1)


def _bounds_from_sample(sample: np.ndarray, nb_want: int):
    """Host: duplicate-aware equal-depth bounds from the combined sample
    (extract_delimiters analog, msb_64.c:1304-1322)."""
    s = np.sort(sample.astype(np.uint64))
    S = len(s)
    nbq = 4 * nb_want
    pos = np.clip((np.arange(1, nbq + 1, dtype=np.int64) * S) // nbq - 1,
                  0, S - 1)
    picks = s[pos].astype(np.uint64)
    picks[-1] = np.uint64(U32_MAX)
    left = np.searchsorted(s, picks, side="left").astype(np.int32)
    right = np.searchsorted(s, picks, side="right").astype(np.int32)
    heavy_frac = max(0.3 / nb_want, 0.002)
    return _quantile_bounds(
        picks.astype(np.uint32), left, right, S, heavy_frac,
        cap_frac=1.0 / nb_want,
    )


@functools.partial(
    jax.jit,
    static_argnames=("arena_rows", "ntiles", "pitch", "rmax", "nlex",
                     "interpret"),
    donate_argnums=(0,),
)
def _route_into(arenas, p2d, meta, h, dst, padv, *, arena_rows, ntiles,
                pitch, rmax, nlex, interpret):
    """Route one chunk into the shared arena.  The jit + donation wrapper
    is what makes the pallas input/output aliasing reuse the arena buffer
    for real (eager pallas calls copy instead)."""
    return route_level(
        p2d, meta, h, dst, padv, arena_rows, ntiles, pitch, rmax,
        nlex=nlex, bias_input=True, interpret=interpret, arenas=arenas,
    )


def _to2d(planes: Tuple[jax.Array, ...], rows: int) -> Tuple[jax.Array, ...]:
    n = int(planes[0].shape[0])
    pad = rows * LANES - n
    out = []
    for p in planes:
        x = jax.lax.bitcast_convert_type(p, jnp.int32)
        x = jnp.concatenate([x, jnp.full((pad,), SENT, jnp.int32)])
        out.append(x.reshape(rows, LANES))
    return tuple(out)


def sort_external(
    chunk_fn: Callable[[int], Tuple[jax.Array, ...]],
    nchunks: int,
    total_n: int,
    cfg: Optional[SortConfig] = None,
    nranges: Optional[int] = None,
    timer: Optional[PhaseTimer] = None,
) -> Iterator[Tuple[jax.Array, ...]]:
    """Sort ``total_n`` uint32 keys supplied as ``nchunks`` chunks.

    ``chunk_fn(i)`` returns chunk i's planes (keys, *payload planes) as
    uint32 arrays; it is called twice per chunk.  Yields the sorted
    result as a stream of contiguous plane tuples in ascending key-range
    order (concatenation = the fully sorted sequence).  Heavy single-value
    ranges in keys-only mode are value-filled without a sort.
    """
    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    assert nchunks >= 1

    # ---- range count: target ≤ ~2^27 elements per range so the local
    # sort's own arenas stay far below the resident budget
    if nranges is None:
        nranges = max(4, min(64, _ceil_div(total_n, 1 << 27)))

    # ---------------- pass 1a: sample
    with timer.phase("sample"):
        ssz = int(min(max(cfg.sample_rate * total_n, 4096),
                      cfg.sample_cap)) // nchunks + 1
        samples = []
        nplanes = None
        chunk_elems = []
        for i in range(nchunks):
            planes = chunk_fn(i)
            if not isinstance(planes, tuple):
                planes = (planes,)
            nplanes = len(planes)
            chunk_elems.append(int(planes[0].shape[0]))
            samples.append(np.asarray(jax.device_get(
                _draw_sample(planes[0], ssz, salt=i)
            )))
            del planes
        assert sum(chunk_elems) == total_n, (chunk_elems, total_n)
        bounds, _est, is_heavy = _bounds_from_sample(
            np.concatenate(samples), nranges
        )
        nb = len(bounds)
        rmax = _rmax_class(nb)
        bounds_pad = np.full(rmax, int(U32_MAX), np.uint64)
        bounds_pad[:nb] = bounds
        bounds_biased = jnp.asarray(
            _bias_np(bounds_pad.astype(np.uint32))
        )
        sort_rows = cfg.v3_sort_rows
        pitch = sort_rows - rmax
        assert pitch > 0

    # ---------------- pass 1b: exact histograms
    def _meta(n_i: int):
        rows = _ceil_div(n_i, LANES)
        ntiles = _ceil_div(rows, pitch)
        m = np.zeros(((ntiles + 1) * 3,), np.int32)
        for t in range(ntiles):
            m[t * 3 + 1] = t * pitch
            m[t * 3 + 2] = min(n_i - t * pitch * LANES, pitch * LANES)
        return jnp.asarray(m), ntiles

    with timer.phase("part_first"):
        hists = []
        for i in range(nchunks):
            planes = chunk_fn(i)
            if not isinstance(planes, tuple):
                planes = (planes,)
            meta, ntiles = _meta(chunk_elems[i])
            # pad to WHOLE tiles: the kernels DMA full pitch-row tiles,
            # and an out-of-bounds load start would be clamped by XLA —
            # silently shifting the last tile's window
            k2d = _to2d(planes[:1], ntiles * pitch)[0]
            h = hist_level(
                k2d, meta, bounds_biased, ntiles, pitch, rmax,
                bias_input=True, interpret=cfg.interpret,
            )
            hists.append(np.asarray(jax.device_get(h)))
            del planes, k2d

    # ---------------- host layout: exact range-major arena positions
    with timer.phase("combine"):
        rrows = [(h + (-h) % LANES) // LANES for h in hists]
        rows_ci = np.stack([r.sum(axis=0) for r in rrows])  # (nchunks, rmax)
        range_rows = rows_ci.sum(axis=0)                    # (rmax,)
        real_r = np.stack([h.sum(axis=0) for h in hists]).sum(axis=0)
        alloc = range_rows + CHUNK_ROWS                     # per-range gap
        range_start = np.concatenate([[0], np.cumsum(alloc)[:-1]]).astype(
            np.int64
        )
        chunk_base = np.concatenate(
            [np.zeros((1, rmax), np.int64),
             np.cumsum(rows_ci, axis=0)[:-1]], axis=0
        )
        P = _shape_class(int(range_rows.max()) + 1)
        arena_rows = int(alloc.sum()) + P + CHUNK_ROWS

    # ---------------- pass 2: route chunks into the shared arena
    with timer.phase("part_blocks"):
        arenas = tuple(
            jnp.full((arena_rows, LANES), SENT, jnp.int32)
            for _ in range(nplanes)
        )
        padv_row = _bias_np(bounds_pad.astype(np.uint32)).astype(np.int32)
        for i in range(nchunks):
            planes = chunk_fn(i)
            if not isinstance(planes, tuple):
                planes = (planes,)
            meta, ntiles = _meta(chunk_elems[i])
            p2d = _to2d(planes, ntiles * pitch)
            del planes
            h = hists[i]
            excl = np.cumsum(rrows[i], axis=0) - rrows[i]
            dst = (range_start[None, :] + chunk_base[i][None, :]
                   + excl).astype(np.int32)
            padv = np.broadcast_to(padv_row[None, :], (ntiles, rmax))
            arenas = _route_into(
                arenas, p2d, meta, jnp.asarray(h), jnp.asarray(dst),
                jnp.asarray(np.ascontiguousarray(padv)),
                arena_rows=arena_rows, ntiles=ntiles, pitch=pitch,
                rmax=rmax, nlex=nplanes - 1, interpret=cfg.interpret,
            )
            del p2d
        timer.sync(arenas[0])

    # ---------------- per range: local sort + trim, yielded in order
    rowi = jnp.arange(P, dtype=jnp.int32)[:, None]
    for r in range(nb):
        with timer.phase("local_sort"):
            real = int(real_r[r])
            if real == 0:
                continue
            lo = int(range_start[r])
            if bool(is_heavy[r]) and nplanes == 1:
                yield (jnp.full((real,), np.uint32(bounds[r]),
                                jnp.uint32),)
                continue
            # one static shape class for every range: rows past the
            # range's true row count are masked to the +inf sentinel —
            # they cover the inter-range gap, which holds store-chunk
            # overshoot garbage (arbitrary values), and later ranges.
            # The range's own phantom pads (value = bound) stay inside
            # rows_r and trim away past ``real`` exactly as in v4.
            rows_r = jnp.int32(int(range_rows[r]))
            sl = tuple(
                jax.lax.bitcast_convert_type(
                    jnp.where(rowi < rows_r, a[lo: lo + P], SENT)
                    .reshape(-1) ^ BIAS,
                    jnp.uint32,
                ) for a in arenas
            )
            out0, outs = sort_v4(sl[0], sl[1:], cfg)
            yield tuple(x[:real] for x in (out0,) + tuple(outs))
