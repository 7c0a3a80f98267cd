"""v3 Pallas kernels: fused partition level and terminal sort+writeout.

The v3 engine re-creates the reference pipeline (sample -> splitters ->
range exchange -> local sort, /root/reference/src/msb_64.c:1477-2259) as a
chain of a few fused device programs with NO host round-trips after the
splitter plan:

- ``partition_level``: for every tile of the source arena: load, sentinel-
  mask, count ranges (the SIMD classifier ``range_histogram`` analog,
  msb_64.c:239-351), synthesize row-alignment phantom pads, bitonic-sort
  the padded tile, and DMA each range's row-aligned run to its destination
  bucket cursor.  Cursors are per-child SMEM counters advanced across the
  (sequential) TPU grid — the deterministic replacement for the reference's
  atomic block claiming (``__sync_fetch_and_add``, msb_64.c:2027,2056,1711).
- ``terminal_sort_write``: per final bucket: load, mask, sort in VMEM, trim
  to the real (non-phantom) count, rotate to the exact element-aligned
  output offset, and read-modify-write the boundary rows — the local sort
  P12 (msb_64.c:2199-2255) fused with the ``inject`` splice (:1278-1302).

Phantom pads: each (tile, range) run is padded to whole 128-lane rows with
elements valued at the range's inclusive upper bound (rid = +inf in pairs
mode).  Pads are value-identical to legal keys of their range, so they flow
through later passes as ordinary data and sort to the tail of their range;
real-count bookkeeping (side outputs, corrected per level by the engine)
lets the terminal writer trim them.  This is the reference's ``fudge``
slack reborn as in-band max-valued filler — it makes every exchanged run
whole rows, so the block exchange is pure contiguous DMA.

Keys/vals are int32 in the sign-biased uint32 encoding (msb_64.c:248-251);
``bias_input``/``unbias_output`` fold the conversion into the first/last
kernels.  Sentinel = biased +inf; per-tile counts are clamped to the live
element count so slack sentinels are never miscounted into the last range.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .netsort import net_sort

LANES = 128
SENT = np.int32(0x7FFFFFFF)       # biased +inf (= unbiased 0xFFFFFFFF)
BIAS = np.int32(-0x80000000)
CHUNK_ROWS = 64                   # fixed DMA chunk (dst caps carry slack)


def _flat_iota(shape):
    r = lax.broadcasted_iota(jnp.int32, shape, 0)
    l = lax.broadcasted_iota(jnp.int32, shape, 1)
    return r * LANES + l


# ===================================================== partition_level

def _partition_kernel(
    # SMEM inputs
    tile_tbl,      # (ntiles*4,) flat: parent, src_row, local_off, pad
    child_base,    # (nparents,): first global child index of each parent
    bounds,        # (nparents*rmax,) flat biased inclusive upper bounds
    dst_start,     # (nchild,): dst arena row where the child region begins
    dst_cap,       # (nchild,): child capacity in rows (0 => drop range)
    parent_fill,   # (nparents,): live elements in each parent region
    sink_base,     # (nchild,): first pad-sink index of each child
    sink_cnt,      # (nchild,): pad sinks per child (next level's split)
    padsrc,        # flat pad values; sink slot j of child c is at
                   # [c*pad_stride + j] (L1: stride rmax, L2: stride 1)
    # array inputs
    src_ref,       # (src_rows, 128) ANY
    vsrc_ref,      # (src_rows, 128) ANY (pairs) or (8,128) dummy
    # outputs
    dst_ref,       # (dst_rows, 128) ANY
    vdst_ref,      # (dst_rows, 128) ANY (pairs) or (8,128) dummy
    occ_out,       # (nchild,) SMEM: occupied rows per child
    real_out,      # (nchild,) SMEM: real element count per child
    pad_out,       # (nsinks,) SMEM: phantom pads routed into each sink
    over_out,      # (1,) SMEM: overflow flag
    # scratch
    kbuf, vbuf, cursors, reals, padacc, hist, sems,
    *,
    sort_rows: int, pitch: int, rmax: int, nchild: int, nsinks: int,
    pad_stride: int, pairs: bool, bias_input: bool,
):
    t = pl.program_id(0)
    ntiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        def ib(i, _):
            cursors[i] = dst_start[i]
            reals[i] = 0
            return 0
        lax.fori_loop(0, nchild, ib, 0, unroll=False)
        def pb(i, _):
            padacc[i] = 0
            return 0
        lax.fori_loop(0, nsinks, pb, 0, unroll=False)
        over_out[0] = 0

    parent = tile_tbl[t * 4]
    src_row = tile_tbl[t * 4 + 1]
    local_off = tile_tbl[t * 4 + 2]
    nelems = jnp.clip(
        parent_fill[parent] - local_off, 0, pitch * LANES
    )

    @pl.when(nelems > 0)
    def _work():
        # ---- load tile data region; sentinel-mask slack
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(src_row, pitch), :],
            kbuf.at[pl.ds(0, pitch), :], sems.at[0],
        )
        cp.start()
        if pairs:
            cv = pltpu.make_async_copy(
                vsrc_ref.at[pl.ds(src_row, pitch), :],
                vbuf.at[pl.ds(0, pitch), :], sems.at[1],
            )
            cv.start()
            cv.wait()
        cp.wait()

        flat = _flat_iota((pitch, LANES))
        live = flat < nelems
        k = kbuf[pl.ds(0, pitch), :]
        if bias_input:
            k = k ^ BIAS
        k = jnp.where(live, k, SENT)
        kbuf[pl.ds(0, pitch), :] = k
        if pairs:
            vbuf[pl.ds(0, pitch), :] = jnp.where(
                live, vbuf[pl.ds(0, pitch), :], SENT
            )

        # ---- per-range histogram: clamped cnt_leq compare-reduce
        def cnt_body(d, prev):
            bd = bounds[parent * rmax + d]
            leq = jnp.sum(jnp.where(k <= bd, 1, 0), dtype=jnp.int32)
            leq = jnp.minimum(leq, nelems)     # exclude slack sentinels
            hist[d] = leq - prev
            return leq
        lax.fori_loop(0, rmax, cnt_body, jnp.int32(0), unroll=True)

        # ---- synthesize phantom pad rows at [pitch, pitch+rmax).
        # Pad values cycle (per tile) over the child's NEXT-level
        # sub-bounds so inherited phantoms spread across that level's
        # children instead of piling into the last sub-range; every pad
        # is accounted to its sink, so downstream real counts are exact.
        lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        cb0 = child_base[parent]
        def pad_body(d, _):
            npad = (-hist[d]) % LANES
            c = cb0 + d
            j = t % jnp.maximum(sink_cnt[c], 1)
            v = padsrc[c * pad_stride + j]
            row = jnp.where(lane1 < npad, v, SENT)
            kbuf[pl.ds(pitch + d, 1), :] = row
            padacc[sink_base[c] + j] = padacc[sink_base[c] + j] + npad
            return 0
        lax.fori_loop(0, rmax, pad_body, 0, unroll=True)
        if pairs:
            vbuf[pl.ds(pitch, rmax), :] = jnp.full(
                (rmax, LANES), SENT, jnp.int32
            )

        # ---- sort the padded tile (grouped by range, runs row-aligned)
        if pairs:
            sk, sv = net_sort(kbuf[pl.ds(0, sort_rows), :],
                              vbuf[pl.ds(0, sort_rows), :])
            kbuf[pl.ds(0, sort_rows), :] = sk
            vbuf[pl.ds(0, sort_rows), :] = sv
        else:
            sk, _ = net_sort(kbuf[pl.ds(0, sort_rows), :])
            kbuf[pl.ds(0, sort_rows), :] = sk

        # ---- scatter runs to child cursors in fixed-size chunks
        cb = child_base[parent]
        def run_body(d, carry):
            row0, nissued = carry
            h = hist[d]
            rrows = (h + LANES - 1) // LANES
            c = cb + d
            space = jnp.maximum(dst_start[c] + dst_cap[c] - cursors[c], 0)
            w = jnp.minimum(rrows, space)

            @pl.when((w < rrows) & (dst_cap[c] > 0))
            def _():
                over_out[0] = 1

            nch = (w + CHUNK_ROWS - 1) // CHUNK_ROWS
            cur = cursors[c]
            def ch_body(i, _):
                pltpu.make_async_copy(
                    kbuf.at[pl.ds(row0 + i * CHUNK_ROWS, CHUNK_ROWS), :],
                    dst_ref.at[pl.ds(cur + i * CHUNK_ROWS, CHUNK_ROWS), :],
                    sems.at[0],
                ).start()
                if pairs:
                    pltpu.make_async_copy(
                        vbuf.at[pl.ds(row0 + i * CHUNK_ROWS, CHUNK_ROWS), :],
                        vdst_ref.at[
                            pl.ds(cur + i * CHUNK_ROWS, CHUNK_ROWS), :
                        ],
                        sems.at[1],
                    ).start()
                return 0
            lax.fori_loop(0, nch, ch_body, 0, unroll=False)

            cursors[c] = cur + w
            reals[c] = reals[c] + h
            return (row0 + rrows, nissued + nch)
        _, nissued = lax.fori_loop(
            0, rmax, run_body, (jnp.int32(0), jnp.int32(0)), unroll=True
        )

        # ---- drain all chunk DMAs.  The wait op only decrements the
        # DMA semaphore by its descriptor's byte count (uniform 32KB
        # chunks here), so aggregate the waits with larger dummy
        # descriptors — one group-sized wait per gmax completed chunks,
        # then single-chunk waits for the remainder.  Dummy src and dst
        # are both kbuf so the descriptor fits at any geometry.
        def wait_chunks(rows):
            pltpu.make_async_copy(
                kbuf.at[pl.ds(0, rows), :],
                kbuf.at[pl.ds(0, rows), :],
                sems.at[0],
            ).wait()
            if pairs:
                pltpu.make_async_copy(
                    vbuf.at[pl.ds(0, rows), :],
                    vbuf.at[pl.ds(0, rows), :],
                    sems.at[1],
                ).wait()

        gmax = max(1, min(16, (sort_rows + CHUNK_ROWS) // CHUNK_ROWS))
        def drain_group(i, _):
            wait_chunks(gmax * CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nissued // gmax, drain_group, 0, unroll=False)
        def drain_one(i, _):
            wait_chunks(CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nissued % gmax, drain_one, 0, unroll=False)

    @pl.when(t == ntiles - 1)
    def _fini():
        def eb(i, _):
            occ_out[i] = cursors[i] - dst_start[i]
            real_out[i] = reals[i]
            return 0
        lax.fori_loop(0, nchild, eb, 0, unroll=False)
        def pe(i, _):
            pad_out[i] = padacc[i]
            return 0
        lax.fori_loop(0, nsinks, pe, 0, unroll=False)


@functools.lru_cache(maxsize=None)
def _partition_exe(src_rows: int, dst_rows: int, ntiles: int, rmax: int,
                   nparents: int, nchild: int, nsinks: int, pitch: int,
                   sort_rows: int, pad_stride: int, pairs: bool,
                   bias_input: bool, interpret: bool):
    kernel = functools.partial(
        _partition_kernel,
        sort_rows=sort_rows, pitch=pitch, rmax=rmax, nchild=nchild,
        nsinks=nsinks, pad_stride=pad_stride, pairs=pairs,
        bias_input=bias_input,
    )
    dummy = jax.ShapeDtypeStruct((8, LANES), jnp.int32)
    data = jax.ShapeDtypeStruct((dst_rows, LANES), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            # + CHUNK_ROWS: the fixed-size run DMA over-reads past the
            # last partial chunk (the copied slack is masked downstream)
            pltpu.VMEM((sort_rows + CHUNK_ROWS, LANES), jnp.int32),
            pltpu.VMEM(((sort_rows + CHUNK_ROWS) if pairs else 8, LANES),
                       jnp.int32),
            pltpu.SMEM((nchild,), jnp.int32),
            pltpu.SMEM((nchild,), jnp.int32),
            pltpu.SMEM((nsinks,), jnp.int32),
            pltpu.SMEM((rmax,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            data,
            data if pairs else dummy,
            jax.ShapeDtypeStruct((nchild,), jnp.int32),
            jax.ShapeDtypeStruct((nchild,), jnp.int32),
            jax.ShapeDtypeStruct((nsinks,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    return call


def partition_level(
    src: jax.Array,                    # (src_rows, 128) int32
    vsrc: Optional[jax.Array],
    tile_tbl: jax.Array,               # (ntiles, 4) int32
    child_base: jax.Array,             # (nparents,) int32
    bounds: jax.Array,                 # (nparents, rmax) int32 (biased)
    dst_start: jax.Array,              # (nchild,) int32
    dst_cap: jax.Array,                # (nchild,) int32
    dst_rows: int,
    pitch: int,
    rmax: int,
    parent_fill: jax.Array,            # (nparents,) int32 live elements
    sink_base: jax.Array,              # (nchild,) int32
    sink_cnt: jax.Array,               # (nchild,) int32
    padsrc: jax.Array,                 # flat int32 biased pad values
    nsinks: int,
    pad_stride: int = 1,
    bias_input: bool = False,
    interpret: bool = False,
):
    """Run one partition level.

    Returns (dst, vdst, occ, real, padcnt, overflow).  Every
    (tile, range) run lands row-aligned at its child's cursor; dst row
    regions [dst_start, dst_start+occ) are fully populated, the rest of
    each child's cap is untouched slack (masked downstream via occ).
    ``padcnt[s]`` counts the phantom pad elements whose value was
    ``padsrc``'s sink ``s`` — the next level subtracts them from its
    histogram counts to recover exact real counts.
    """
    pairs = vsrc is not None
    ntiles = tile_tbl.shape[0]
    assert tile_tbl.ndim == 2 and tile_tbl.shape[1] == 4
    nparents = bounds.shape[0]
    nchild = int(dst_start.shape[0])
    sort_rows = pitch + rmax
    assert sort_rows * LANES & (sort_rows * LANES - 1) == 0, \
        f"sort size must be pow2, got {sort_rows} rows"
    call = _partition_exe(
        src.shape[0], dst_rows, ntiles, rmax, nparents, nchild, nsinks,
        pitch, sort_rows, pad_stride, pairs, bias_input, interpret,
    )
    dummy = jnp.zeros((8, LANES), jnp.int32)
    dst, vdst, occ, real, padcnt, over = call(
        tile_tbl.reshape(-1), child_base, bounds.reshape(-1),
        dst_start, dst_cap,
        parent_fill.astype(jnp.int32),
        sink_base.astype(jnp.int32), sink_cnt.astype(jnp.int32),
        padsrc.reshape(-1).astype(jnp.int32),
        src, vsrc if pairs else dummy,
    )
    return dst, (vdst if pairs else None), occ, real, padcnt, over


# ===================================================== terminal_sort_write

def _terminal_kernel(
    # SMEM inputs
    btbl,          # (nb*4,) flat: src_row, occ_rows, real_cnt, mode
                   #   mode: 0 = sort+write, 1 = value-fill (all-equal)
    fillval,       # (nb,): biased fill value for mode 1
    out_off,       # (nb,): element-aligned output offset
    # array inputs
    src_ref, vsrc_ref,
    # outputs
    out_ref, vout_ref,
    # scratch
    kbuf, vbuf, head, vhead, sems,
    *,
    cap_rows: int, pairs: bool, unbias_output: bool,
):
    b = pl.program_id(0)
    src_row = btbl[b * 4]
    occ = btbl[b * 4 + 1]
    real = btbl[b * 4 + 2]
    mode = btbl[b * 4 + 3]
    # hard safety clamp: in mode 0 the write span streams from the
    # cap_rows-sized sorted buffer, so a corrupt/overflowed real count
    # must never drive chunk reads past it (mode 1 streams from two
    # fixed chunks and tolerates any span)
    real = jnp.where(
        mode == 0, jnp.minimum(real, cap_rows * LANES), real
    )
    off = out_off[b]
    phase = off % LANES
    q0 = off // LANES
    lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # Stream layout in kbuf/vbuf: row 1 = output row q0 (head), rows
    # 2.. = subsequent output rows.  Row 1+cap_rows = spill row.  Rows
    # beyond hold fill chunks for mode 1.
    FILLROW = 2 + cap_rows + CHUNK_ROWS    # start of mode-1 fill chunk

    @pl.when(real > 0)
    def _():
        @pl.when(mode == 0)
        def _load_sort():
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(src_row, cap_rows), :],
                kbuf.at[pl.ds(1, cap_rows), :], sems.at[0],
            )
            cp.start()
            if pairs:
                cv = pltpu.make_async_copy(
                    vsrc_ref.at[pl.ds(src_row, cap_rows), :],
                    vbuf.at[pl.ds(1, cap_rows), :], sems.at[1],
                )
                cv.start()
                cv.wait()
            cp.wait()
            rowi = lax.broadcasted_iota(jnp.int32, (cap_rows, LANES), 0)
            k = jnp.where(rowi < occ, kbuf[pl.ds(1, cap_rows), :], SENT)
            if pairs:
                v = jnp.where(rowi < occ, vbuf[pl.ds(1, cap_rows), :], SENT)
                k, v = net_sort(k, v)
            else:
                k, _ = net_sort(k)
                v = None

            # rotate right by phase so element 0 lands at lane (off % 128);
            # then flip bias on the stream if requested.
            def rot(x):
                lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
                idx = (lane - phase) % LANES
                rolled = jnp.take_along_axis(x, idx, axis=1)
                up = jnp.roll(rolled, 1, axis=0)     # row r-1's tail
                main = jnp.where(lane >= phase, rolled, up)
                spill = jnp.where(lane[0:1] < phase,
                                  rolled[cap_rows - 1: cap_rows, :], SENT)
                return main, spill
            mk, sk = rot(k)
            if unbias_output:
                mk = mk ^ BIAS
                sk = sk ^ BIAS
            kbuf[pl.ds(1, cap_rows), :] = mk
            kbuf[pl.ds(1 + cap_rows, 1), :] = sk
            if pairs:
                mv, sv2 = rot(v)
                if unbias_output:
                    mv = mv ^ BIAS
                    sv2 = sv2 ^ BIAS
                vbuf[pl.ds(1, cap_rows), :] = mv
                vbuf[pl.ds(1 + cap_rows, 1), :] = sv2

        @pl.when(mode == 1)
        def _fill():
            fv = fillval[b] ^ (BIAS if unbias_output else np.int32(0))
            blk = jnp.full((CHUNK_ROWS, LANES), 1, jnp.int32) * fv
            # head chunk (row 1 gets merged below) + steady-state chunk
            kbuf[pl.ds(1, CHUNK_ROWS), :] = blk
            kbuf[pl.ds(FILLROW, CHUNK_ROWS), :] = blk

        # ---- head row RMW: merge previously written content at
        # lanes < phase (the inject splice boundary)
        hp = pltpu.make_async_copy(
            out_ref.at[pl.ds(q0, 1), :], head, sems.at[0]
        )
        hp.start()
        if pairs:
            hv = pltpu.make_async_copy(
                vout_ref.at[pl.ds(q0, 1), :], vhead, sems.at[1]
            )
            hv.start()
            hv.wait()
        hp.wait()
        kbuf[pl.ds(1, 1), :] = jnp.where(
            lane1 < phase, head[:], kbuf[pl.ds(1, 1), :]
        )
        if pairs:
            vbuf[pl.ds(1, 1), :] = jnp.where(
                lane1 < phase, vhead[:], vbuf[pl.ds(1, 1), :]
            )

        # ---- write rows [q0, q0 + span) in fixed chunks
        span = (phase + real + LANES - 1) // LANES
        nch = (span + CHUNK_ROWS - 1) // CHUNK_ROWS
        def wb(i, _):
            # mode 0: stream from the rotated buffer; mode 1: head chunk
            # once, then the steady fill chunk
            src_r = jnp.where(
                mode == 0, 1 + i * CHUNK_ROWS,
                jnp.where(i == 0, 1, FILLROW),
            )
            pltpu.make_async_copy(
                kbuf.at[pl.ds(src_r, CHUNK_ROWS), :],
                out_ref.at[pl.ds(q0 + i * CHUNK_ROWS, CHUNK_ROWS), :],
                sems.at[0],
            ).start()
            if pairs:
                pltpu.make_async_copy(
                    vbuf.at[pl.ds(src_r, CHUNK_ROWS), :],
                    vout_ref.at[pl.ds(q0 + i * CHUNK_ROWS, CHUNK_ROWS), :],
                    sems.at[1],
                ).start()
            return 0
        lax.fori_loop(0, nch, wb, 0, unroll=False)
        # aggregated drain (see partition kernel): each wait decrements
        # the DMA semaphore by its descriptor's bytes, so group them
        def wait_chunks(rows):
            pltpu.make_async_copy(
                kbuf.at[pl.ds(0, rows), :],
                kbuf.at[pl.ds(0, rows), :], sems.at[0],
            ).wait()
            if pairs:
                pltpu.make_async_copy(
                    vbuf.at[pl.ds(0, rows), :],
                    vbuf.at[pl.ds(0, rows), :], sems.at[1],
                ).wait()

        kbuf_rows = cap_rows + 2 + 2 * CHUNK_ROWS
        gmax = max(1, min(16, kbuf_rows // CHUNK_ROWS))
        def dr_group(i, _):
            wait_chunks(gmax * CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nch // gmax, dr_group, 0, unroll=False)
        def dr_one(i, _):
            wait_chunks(CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nch % gmax, dr_one, 0, unroll=False)


@functools.lru_cache(maxsize=None)
def _terminal_exe(src_rows: int, out_rows: int, nb: int, cap_rows: int,
                  pairs: bool, unbias_output: bool, interpret: bool):
    kernel = functools.partial(
        _terminal_kernel,
        cap_rows=cap_rows, pairs=pairs, unbias_output=unbias_output,
    )
    dummy = jax.ShapeDtypeStruct((8, LANES), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            # rows: [0] unused, [1..1+cap] stream+spill, then chunk slack
            # for over-reads, then the mode-1 steady fill chunk
            pltpu.VMEM((cap_rows + 2 + 2 * CHUNK_ROWS, LANES), jnp.int32),
            pltpu.VMEM(
                ((cap_rows + 2 + 2 * CHUNK_ROWS) if pairs else 8, LANES),
                jnp.int32,
            ),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((out_rows if pairs else 8, LANES),
                                 jnp.int32),
        ],
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )
    return call


def terminal_sort_write(
    src: jax.Array,
    vsrc: Optional[jax.Array],
    btbl: jax.Array,        # (nb, 4) int32: src_row, occ, real, mode
    fillval: jax.Array,     # (nb,) int32
    out_off: jax.Array,     # (nb,) int32
    out_rows: int,
    cap_rows: int,
    unbias_output: bool = True,
    interpret: bool = False,
):
    """Sort every bucket in VMEM and write its real prefix to the exact
    output position.  Buckets must be given in ascending out_off order
    (RMW boundary merging relies on the sequential grid)."""
    pairs = vsrc is not None
    nb = int(btbl.shape[0])
    call = _terminal_exe(
        src.shape[0], out_rows, nb, cap_rows, pairs, unbias_output,
        interpret,
    )
    dummy = jnp.zeros((8, LANES), jnp.int32)
    out, vout = call(
        btbl.reshape(-1), fillval, out_off, src,
        vsrc if pairs else dummy,
    )
    return out, (vout if pairs else None)
