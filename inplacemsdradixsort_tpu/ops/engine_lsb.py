"""LSB radix sort engine: out-of-place ping-pong over fixed-width digits.

Covers the reference suite's ``lsb_32``/``lsb_64`` variants
(/root/reference/Makefile:8-24, README.md:19-33) and mirrors its one
surviving LSB pass, the parallel sample sort ``partition_keys``
(/root/reference/src/msb_64.c:1037-1142): per pass a per-tile digit
histogram, cross-tile prefix sums for exact write cursors, and a stable
buffered scatter.  No sampling, no splitters, no overflow paths — counts
are exact by construction.

TPU shape: each pass runs three streaming kernels over static shapes:

1. ``hist_level`` (digit mode): exact per-(tile, digit) counts.
2. ``route_level`` (digit mode): per tile, STABLE partition by digit —
   in-VMEM sort on a unique (digit, arrival-rank) composite — and DMA of
   row-aligned runs to exact destinations (phantom-padded to whole rows,
   the TPU substitute for ``partition_keys``'s cache-line write-combining
   buffers, msb_64.c:1085-1124).
3. ``splice_runs``: streaming compaction back to a dense element-exact
   array (the ``inject`` role, msb_64.c:1278-1302) so the next pass sees
   no phantoms.

Stability is inherent (rank-composite routing + in-order splice), so
payload planes ride along without an index plane, and multi-word keys
(u64 as (hi, lo) planes) sort by running the digit passes over the less
significant word first — the reference's 8x8-bit u64 schedule
(msb_64.c:1526-1542).

This engine is the A/B baseline for the MSD engine (engine_v4): it makes
more full-data sweeps (3 per pass x width/digit_bits passes) but has no
data-dependent planning at all — one device program, no host round-trip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import PhaseTimer
from .engine_v3 import _ceil_div, _shape_class
from .engine_v4 import _level_tables
from .kernels_v4 import (CHUNK_ROWS, LANES, LCH, hist_level, route_level,
                         splice_runs)


def _pass_schedule(nkey: int, bits: int,
                   key_bits: Optional[int] = None
                   ) -> Tuple[Tuple[int, int], ...]:
    """(plane, shift) per pass, least significant digit first.

    Planes are most-significant-word first (u64 = (hi, lo)), so passes
    walk planes in reverse — the reference's shift schedule 0,8,...,56
    over one u64 word (msb_64.c:1526-1542) split into our u32 planes.

    ``key_bits`` (total significant LOW bits across the key planes) skips
    passes over constant-zero high digits — the analog of the reference
    sorting only the 58 bits its range prefix leaves undetermined
    (msb_64.c:2242).
    """
    if key_bits is None:
        key_bits = 32 * nkey
    passes = []
    for w in range(nkey - 1, -1, -1):
        wbits = min(32, max(0, key_bits - 32 * (nkey - 1 - w)))
        for shift in range(0, wbits, bits):
            passes.append((w, shift))
    return tuple(passes)


def _pipeline_lsb(planes, *, n: int, nplanes: int, nkey: int, bits: int,
                  key_bits: Optional[int], pitch: int, ntiles: int,
                  arena_rows: int, dense_rows: int, interpret: bool):
    nbins = 1 << bits
    rows_in = ntiles * pitch
    pad = rows_in * LANES - n

    def _i32(x):
        return (jax.lax.bitcast_convert_type(x, jnp.int32)
                if x.dtype != jnp.int32 else x)

    cur = tuple(
        jnp.concatenate([_i32(p), jnp.zeros((pad,), jnp.int32)])
        .reshape(rows_in, LANES) for p in planes
    )

    # static dense-tile meta: identical for every pass (splice re-densifies)
    meta_np = np.zeros(((ntiles + 1) * 3,), np.int32)
    for t in range(ntiles):
        meta_np[t * 3 + 1] = t * pitch
        meta_np[t * 3 + 2] = min(n - t * pitch * LANES, pitch * LANES)
    meta = jnp.asarray(meta_np)
    dig_bounds = jnp.arange(nbins, dtype=jnp.int32)
    keep = jnp.ones((nbins,), jnp.int32)
    padv_np = np.broadcast_to(
        np.arange(nbins, dtype=np.int64)[None, :], (ntiles, nbins)
    )

    for dp, shift in _pass_schedule(nkey, bits, key_bits):
        h = hist_level(
            cur[dp], meta, dig_bounds, ntiles, pitch, nbins,
            interpret=interpret, digit_shift=shift, digit_bits=bits,
        )
        pads, rows_c, start, dst = _level_tables(h, keep, CHUNK_ROWS)
        padv = jnp.asarray(
            (padv_np << shift).astype(np.uint32).view(np.int32)
        )
        arena = route_level(
            cur, meta, h, dst, padv, arena_rows, ntiles, pitch, nbins,
            nlex=0, interpret=interpret,
            digit_shift=shift, digit_bits=bits, digit_plane=dp,
        )
        # splice runs in (digit-major, tile-minor) order back to dense
        occ = (h + pads) // LANES
        real_f = h.T.reshape(-1)
        ends = jnp.cumsum(real_f, dtype=jnp.int32)
        off = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        zeros = jnp.zeros_like(real_f)
        btbl = jnp.stack(
            [dst.T.reshape(-1), occ.T.reshape(-1), real_f, zeros,
             zeros, off, zeros, zeros], axis=1,
        )
        dense = splice_runs(
            arena, btbl, dense_rows, max_occ=pitch, interpret=interpret,
        )
        cur = tuple(d[:rows_in] for d in dense)

    return tuple(
        jax.lax.bitcast_convert_type(c.reshape(-1)[:n], jnp.uint32)
        for c in cur
    )


# the fused whole-program jit is for hardware; interpret mode runs the
# passes eagerly (each pallas call jits itself) — a single jit over
# npass x 3 interpreted kernels takes tens of minutes to compile on CPU
_pipeline_lsb_jit = jax.jit(
    _pipeline_lsb,
    static_argnames=("n", "nplanes", "nkey", "bits", "key_bits", "pitch",
                     "ntiles", "arena_rows", "dense_rows", "interpret"),
)


def sort_lsb(
    keys: jax.Array,
    vals: Tuple[jax.Array, ...] = (),
    cfg: Optional[SortConfig] = None,
    timer: Optional[PhaseTimer] = None,
    nkey: int = 1,
    key_bits: Optional[int] = None,
):
    """Sort uint32 planes by LSB radix passes over the first ``nkey``
    planes (most significant word first); remaining planes are payload.

    Stable by construction — equal keys keep their input order without an
    index plane (the LSB property the reference's README names as the
    variants' advantage, README.md:19-26).  ``key_bits`` (total
    significant LOW key bits) skips passes over constant-zero high
    digits — the 58-bit trick (msb_64.c:2242).
    """
    cfg = cfg or SortConfig()
    timer = timer or PhaseTimer(enabled=False)
    n = int(keys.shape[0])
    planes = (keys,) + tuple(vals)
    thr = cfg.min_engine_n if cfg.min_engine_n is not None else (1 << 14)
    if n < thr:
        # stable by the key planes only — matching the engine's inherent
        # stability (NOT v4's lexicographic-over-payload tie order)
        res = jax.lax.sort(planes, num_keys=nkey, is_stable=True)
        return res[0], tuple(res[1:])

    bits = cfg.lsb_digit_bits
    nbins = 1 << bits
    sort_rows = cfg.v3_sort_rows
    pitch = sort_rows - nbins
    assert pitch > 0, (sort_rows, nbins)
    rows_in = _ceil_div(n, LANES)
    ntiles = _ceil_div(rows_in, pitch)
    rows_in = ntiles * pitch
    arena_rows = _shape_class(
        rows_in + ntiles * nbins + (nbins + 1) * CHUNK_ROWS
    )
    dense_rows = rows_in + LCH + 2

    with timer.phase("part_blocks"):
        fn = _pipeline_lsb if cfg.interpret else _pipeline_lsb_jit
        with jax.enable_x64(False):
            outs = fn(
                planes, n=n, nplanes=len(planes), nkey=nkey, bits=bits,
                key_bits=key_bits, pitch=pitch, ntiles=ntiles,
                arena_rows=arena_rows, dense_rows=dense_rows,
                interpret=cfg.interpret,
            )
        timer.sync(outs[0])
    return outs[0], tuple(outs[1:])
