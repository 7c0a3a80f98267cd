"""v5 in-place kernels: sequential-block partition + cycle block permute.

The out-of-place v4 levels need input + arena alive at once (~2x N HBM);
at 2^31 u32 that cannot fit a 16 GB chip.  v5 re-creates the reference's
truly in-place machinery (/root/reference/src/msb_64.c):

- ``seqroute_level`` — the P5 analog (``range_partition_to_blocks``,
  msb_64.c:497-699): per input tile (read sequentially): sort the tile
  in VMEM, append each range's run to that range's VMEM block
  accumulator (the write-combining-buffer role, :368-440, at block
  rather than cache-line granularity), and flush FULL blocks to the
  NEXT SEQUENTIAL block slot of the SAME buffer — the writer can never
  overtake the reader, so the partition runs in place over one arena.
  Which (tile, range) events flush which slots is fully determined by
  the exact histogram, so the reference's atomically-claimed block map
  (:658-666) becomes a precomputed table.
- ``block_permute`` — the P9/P10 analog (online/offline block swaps,
  msb_64.c:2016-2158): moves whole blocks to their range-contiguous
  positions by deterministic cycle-following.  The reference claims
  destinations with ``__sync_fetch_and_add`` and dumps broken cycles to
  private space; here the cycle-linearized move schedule is computed
  from the histogram (engine_v5) and the kernel streams it with
  ring-buffered reads prefetched ahead and one staged block per cycle.

Both kernels alias their output onto the working buffer (the donated
input): peak HBM = N + a few percent of block-granular slack — the
reference's ``fudge`` over-allocation contract (msb_64.h:39) reborn.

Flat-shift semantics used by the append (dst_flat = src_flat + D, D of
either sign; exercised by tests/test_engine_v5.py):

    phase = D % 128
    rs    = (R*128 - D - 1) // 128        # window top src row
    win   = src rows [rs, rs + S + 1)
    rolled= win[:, (lane - phase) % 128]
    dst row R+r, lane l = rolled[r+1, l] if l >= phase else rolled[r, l]
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .netsort import net_sort_multi
from .kernels_v4 import LANES, SENT, BIAS, VMEM_LIMIT

BLKROWS = 256                     # rows per exchange block
BLK = BLKROWS * LANES             # elements per block
SEGROWS = 16                      # append sub-segment rows (divides BLKROWS)
PAD0 = SEGROWS + 1                # tile-buffer top/bottom junk padding rows
SCHED_CHUNK = 256                 # permute schedule entries per grid step
RING = 16                         # permute ring slots (lookahead RING//2)
NSTAGE = 4                        # rotating cycle-head stage buffers: a
                                  # cycle's stage read is issued LOOK
                                  # entries early, so consecutive short
                                  # cycles must not share one stage
                                  # (ring buf index RING + cycle % NSTAGE)


def _blk_wait(ref2d, sem):
    """Decrement ``sem`` by one block's bytes (one plane)."""
    pltpu.make_async_copy(
        ref2d.at[pl.ds(0, BLKROWS), :], ref2d.at[pl.ds(0, BLKROWS), :],
        sem,
    ).wait()


# ===================================================== seqroute_level

def _seqroute_body(
    meta, cnt_ref, base_ref, slot_ref, padv_ref, srcs, outs, bufs,
    accs, lsem, fsem, nout, *, pitch, rmax, nlex, bias_input, nplanes,
):
    """Grid step = one tile (data tile or region-drain tile).

    meta (stride 4 per tile): src_row, nelems, drain_flag, reserved.

    Blocked SMEM tables per (tile, range):
      cnt   — elements of range d in this tile (exact histogram row)
      base  — range-d stream offset before this tile (region-local)
      slot  — W block slot of this event's first full-block flush;
              on drain tiles: the range's drain block slot
      padv  — biased phantom pad value (used by drain tiles)

    Flush-DMA accounting: ``nout`` (SMEM) counts outstanding flush
    events (one event = ``nplanes`` block DMAs reading an accumulator
    parity).  All outstanding flushes are drained (a) after each tile's
    sort, before its appends reuse accumulator rows, and (b) inside a
    tile when one range cycles back onto a parity it flushed earlier in
    the SAME tile (>= 2 blocks completed this tile) — without (b), an
    append could overwrite a parity whose read-DMA is still in flight.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = lax.rem(t, 2)
    grow = lax.rem(t, 8)

    def drain_all():
        def dr1(i, _):
            for p in range(nplanes):
                _blk_wait(accs[p].at[0, 0], fsem.at[0])
            return 0
        lax.fori_loop(0, nout[0], dr1, 0, unroll=False)
        nout[0] = 0

    def start_load(tile, s):
        srow = meta[tile * 4]
        for p in range(nplanes):
            pltpu.make_async_copy(
                srcs[p].at[pl.ds(srow, pitch), :],
                bufs[p].at[s, pl.ds(PAD0, pitch), :],
                lsem.at[s],
            ).start()

    @pl.when(t == 0)
    def _():
        nout[0] = 0
        start_load(0, 0)

    nelems = meta[t * 4 + 1]

    @pl.when(nelems > 0)
    def _():
        for p in range(nplanes):
            pltpu.make_async_copy(
                bufs[0].at[slot, pl.ds(PAD0, pitch), :],
                bufs[0].at[slot, pl.ds(PAD0, pitch), :],
                lsem.at[slot],
            ).wait()

    @pl.when((t + 1 < nt) & (meta[(t + 1) * 4 + 1] > 0))
    def _():
        start_load(t + 1, 1 - slot)

    # ---- mask + bias + sort the tile
    @pl.when(nelems > 0)
    def _():
        flat = (lax.broadcasted_iota(jnp.int32, (pitch, LANES), 0) * LANES
                + lax.broadcasted_iota(jnp.int32, (pitch, LANES), 1))
        live = flat < nelems
        for p in range(nplanes):
            k = bufs[p][slot, pl.ds(PAD0, pitch), :]
            if bias_input:
                k = k ^ BIAS
            bufs[p][slot, pl.ds(PAD0, pitch), :] = jnp.where(
                live, k, SENT)
        planes = tuple(
            bufs[p][slot, pl.ds(PAD0, pitch), :] for p in range(nplanes)
        )
        sp = net_sort_multi(planes, nlex=nlex)
        for p in range(nplanes):
            bufs[p][slot, pl.ds(PAD0, pitch), :] = sp[p]

    # ---- wait all outstanding flushes (acc slots may be reused); the
    # flushes had a full tile sort's worth of time to land
    drain_all()

    lane_s = lax.broadcasted_iota(jnp.int32, (SEGROWS, LANES), 1)
    row_s = lax.broadcasted_iota(jnp.int32, (SEGROWS, LANES), 0)
    lane_w = lax.broadcasted_iota(jnp.int32, (SEGROWS + 1, LANES), 1)

    # ---- append each range's run; flush full blocks to sequential slots
    @pl.when(nelems > 0)
    def _():
        def child(d, e0):
            cnt = cnt_ref[grow, d]
            base = base_ref[grow, d]
            slot0 = slot_ref[grow, d]
            D = base - e0                     # dst_flat = src_flat + D
            phase = D % LANES
            R0 = (base // LANES) & ~(SEGROWS - 1)
            nseg = jnp.where(
                cnt > 0,
                (base + cnt - R0 * LANES + SEGROWS * LANES - 1)
                // (SEGROWS * LANES),
                0,
            )

            def seg(i, _):
                Ra = R0 + i * SEGROWS         # absolute acc row
                rb = Ra % BLKROWS
                par = (Ra // BLKROWS) % 2
                blk = Ra // BLKROWS
                rs = (Ra * LANES - D - 1) // LANES
                aflat = (Ra + row_s) * LANES + lane_s
                okw = (aflat >= base) & (aflat < base + cnt)

                # parity reuse within one tile: block blk-2 (same parity)
                # was flushed earlier in this tile; its read-DMA must
                # complete before these appends overwrite the parity
                @pl.when((rb == 0) & (blk - base // BLK >= 2))
                def _():
                    drain_all()
                for p in range(nplanes):
                    win = bufs[p][slot, pl.ds(PAD0 + rs, SEGROWS + 1), :]
                    rolled = jnp.take_along_axis(
                        win, (lane_w - phase) % LANES, axis=1)
                    val = jnp.where(
                        lane_s >= phase,
                        rolled[1:SEGROWS + 1, :], rolled[0:SEGROWS, :],
                    )
                    cur = accs[p][d, par, pl.ds(rb, SEGROWS), :]
                    accs[p][d, par, pl.ds(rb, SEGROWS), :] = jnp.where(
                        okw, val, cur)

                @pl.when((rb == BLKROWS - SEGROWS)
                         & ((blk + 1) * BLK <= base + cnt))
                def _():
                    ws = slot0 + (blk - base // BLK)
                    for p in range(nplanes):
                        pltpu.make_async_copy(
                            accs[p].at[d, par],
                            outs[p].at[pl.ds(ws * BLKROWS, BLKROWS), :],
                            fsem.at[0],
                        ).start()
                    nout[0] = nout[0] + 1
                return 0

            lax.fori_loop(0, nseg, seg, 0, unroll=False)
            return e0 + cnt

        lax.fori_loop(0, rmax, child, jnp.int32(0), unroll=True)

    # ---- region drain: pad each range's open block, flush to its drain
    # slot, and wait everything (the next region restarts the accs)
    @pl.when(meta[t * 4 + 2] != 0)
    def _():
        rowf = (lax.broadcasted_iota(jnp.int32, (BLKROWS, LANES), 0)
                * LANES
                + lax.broadcasted_iota(jnp.int32, (BLKROWS, LANES), 1))

        def dchild(d, _):
            end = base_ref[grow, d] + cnt_ref[grow, d]
            par = (end // BLK) % 2
            fill = end % BLK
            dslot = slot_ref[grow, d]
            padv = padv_ref[grow, d]
            for p in range(nplanes):
                cur = accs[p][d, par]
                accs[p][d, par] = jnp.where(
                    rowf < fill, cur,
                    padv if p == 0 else SENT)
            for p in range(nplanes):
                pltpu.make_async_copy(
                    accs[p].at[d, par],
                    outs[p].at[pl.ds(dslot * BLKROWS, BLKROWS), :],
                    fsem.at[0],
                ).start()
            nout[0] = nout[0] + 1
            return 0

        lax.fori_loop(0, rmax, dchild, 0, unroll=True)
        drain_all()


def _seqroute_factory(nplanes, **kw):
    def kernel(meta, cnt_ref, base_ref, slot_ref, padv_ref, *rest):
        srcs = rest[:nplanes]
        outs = rest[nplanes:2 * nplanes]
        bufs = rest[2 * nplanes:3 * nplanes]
        accs = rest[3 * nplanes:4 * nplanes]
        lsem, fsem, nout = rest[4 * nplanes:]
        _seqroute_body(meta, cnt_ref, base_ref, slot_ref, padv_ref,
                       srcs, outs, bufs, accs, lsem, fsem, nout,
                       nplanes=nplanes, **kw)
    return kernel


@functools.lru_cache(maxsize=None)
def _seqroute_exe(w_rows: int, ntiles: int, rmax: int, pitch: int,
                  nplanes: int, nlex: int, bias_input: bool,
                  interpret: bool):
    kernel = _seqroute_factory(
        nplanes, pitch=pitch, rmax=rmax, nlex=nlex,
        bias_input=bias_input,
    )
    smem_row = lambda t, *_: (t // 8, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=(
            [pl.BlockSpec((8, rmax), smem_row,
                          memory_space=pltpu.SMEM)] * 4
            + [pl.BlockSpec(memory_space=pl.ANY)] * nplanes
        ),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=(
            [pltpu.VMEM((2, pitch + 2 * PAD0, LANES), jnp.int32)]
            * nplanes
            + [pltpu.VMEM((rmax, 2, BLKROWS, LANES), jnp.int32)]
            * nplanes
            + [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
                pltpu.SMEM((1,), jnp.int32),
            ]
        ),
    )
    aliases = {5 + p: p for p in range(nplanes)}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((w_rows, LANES), jnp.int32)
        ] * nplanes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def seqroute_level(
    w: Sequence[jax.Array],        # nplanes x (w_rows, 128) int32
    meta: jax.Array,               # ((ntiles+1)*4,) int32
    cnt_tbl: jax.Array,            # (ntiles, rmax)
    base_tbl: jax.Array,           # (ntiles, rmax)
    slot_tbl: jax.Array,           # (ntiles, rmax)
    padv_tbl: jax.Array,           # (ntiles, rmax)
    ntiles: int,
    pitch: int,
    rmax: int,
    nlex: Optional[int] = None,
    bias_input: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """In-place sequential-block partition level over ``w`` (aliased).

    The tile sequence must end with a drain tile for every region (a
    drain tile has nelems=0, drain_flag=1, and per-range tables: base =
    total appended, cnt = 0, slot = drain block slot, padv = phantom)."""
    nplanes = len(w)
    assert (pitch * LANES) & (pitch * LANES - 1) == 0, pitch
    assert BLKROWS % SEGROWS == 0
    if nlex is None:
        nlex = nplanes - 1
    call = _seqroute_exe(w[0].shape[0], ntiles, rmax, pitch, nplanes,
                         nlex, bias_input, interpret)
    ntp = -(-ntiles // 8) * 8
    pad = ((0, ntp - ntiles), (0, 0))
    outs = call(
        meta,
        jnp.pad(cnt_tbl, pad), jnp.pad(base_tbl, pad),
        jnp.pad(slot_tbl, pad), jnp.pad(padv_tbl, pad),
        *w,
    )
    return tuple(outs)


# ===================================================== block_permute

def _permute_body(sched_ref, srcs, outs, ring, rsem, wsem, *, nplanes):
    """Grid step = SCHED_CHUNK schedule entries; entry fields (stride 4):

      rd_slot — W block to read (-1 none)
      rd_buf  — ring slot 0..RING-1 for the read; RING..RING+NSTAGE-1 =
                rotating stage buffers (cycle heads)
      wr_slot — W block to write; -1 none; -2 dummy (consume rsem[wb]
                without a DMA — placed before each cycle's first write
                so the stage read of the cycle head has completed
                before its slot is overwritten)
      wr_buf  — ring slot whose content to write (RING = stage);
                values >= RING+NSTAGE encode buf wb-(RING+NSTAGE)
                written WITHOUT waiting rsem (the cycle-closing stage
                write, whose read token the dummy already consumed)

    Reads are issued LOOK entries ahead of their consuming writes; a
    read into buffer b first waits b's previous write (wsem[b], primed
    once at step 0 so the first use never blocks), and writes wait
    their source read (rsem[b]).  The glue assigns rd_buf = (running
    read count) % RING, so slot-reuse distance is RING reads while the
    issue lookahead is only LOOK — by the time a read waits on wsem[b],
    that buffer's consuming write is ~RING/2 entries old.  The final
    grid step drains one write token per buffer (every buffer ends with
    exactly one unconsumed write or its priming token).  Build the
    schedule with engine_v5.permute_schedule."""
    LOOK = RING // 2
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    g = lax.rem(c, 8)

    @pl.when(c == 0)
    def _():
        for b in range(RING + NSTAGE):
            for p in range(nplanes):
                pltpu.make_async_copy(
                    ring[p].at[b], ring[p].at[b], wsem.at[b]
                ).start()

    def entry(j, field):
        return sched_ref[g, j * 4 + field]

    def issue_read(j):
        rd = entry(j, 0)
        b = entry(j, 1)

        @pl.when(rd >= 0)
        def _():
            for p in range(nplanes):
                _blk_wait(ring[p].at[0], wsem.at[b])
            for p in range(nplanes):
                pltpu.make_async_copy(
                    srcs[p].at[pl.ds(rd * BLKROWS, BLKROWS), :],
                    ring[p].at[b],
                    rsem.at[b],
                ).start()

    def pro(j, _):
        issue_read(j)
        return 0
    lax.fori_loop(0, LOOK, pro, 0, unroll=False)

    def step(j, _):
        @pl.when(j + LOOK < SCHED_CHUNK)
        def _():
            issue_read(j + LOOK)
        wr = entry(j, 2)
        wb = entry(j, 3)

        # wr == -2: dummy wait — consume rsem[wb] without a DMA.  The
        # schedule places one before each cycle's first write so the
        # stage read of the cycle head (whose slot that write targets)
        # is complete before being overwritten.
        @pl.when(wr == -2)
        def _():
            for p in range(nplanes):
                _blk_wait(ring[p].at[0], rsem.at[wb])

        @pl.when(wr >= 0)
        def _():
            # wb >= RING+NSTAGE encodes a no-wait write from buf
            # wb-(RING+NSTAGE): used for the cycle-closing write from
            # the stage buffer, whose read token the dummy consumed.
            wbe = lax.rem(wb, RING + NSTAGE)

            @pl.when(wb < RING + NSTAGE)
            def _():
                for p in range(nplanes):
                    _blk_wait(ring[p].at[0], rsem.at[wbe])
            for p in range(nplanes):
                pltpu.make_async_copy(
                    ring[p].at[wbe],
                    outs[p].at[pl.ds(wr * BLKROWS, BLKROWS), :],
                    wsem.at[wbe],
                ).start()
        return 0

    lax.fori_loop(0, SCHED_CHUNK, step, 0, unroll=False)

    @pl.when(c == nc - 1)
    def _():
        for b in range(RING + NSTAGE):
            for p in range(nplanes):
                _blk_wait(ring[p].at[0], wsem.at[b])


def _permute_factory(nplanes, **kw):
    def kernel(sched_ref, *rest):
        srcs = rest[:nplanes]
        outs = rest[nplanes:2 * nplanes]
        ring = rest[2 * nplanes:3 * nplanes]
        rsem, wsem = rest[3 * nplanes:]
        _permute_body(sched_ref, srcs, outs, ring, rsem, wsem,
                      nplanes=nplanes, **kw)
    return kernel


@functools.lru_cache(maxsize=None)
def _permute_exe(w_rows: int, nchunks: int, nplanes: int,
                 interpret: bool):
    kernel = _permute_factory(nplanes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nchunks,),
        in_specs=(
            [pl.BlockSpec((8, SCHED_CHUNK * 4), lambda c: (c // 8, 0),
                          memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * nplanes
        ),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=(
            [pltpu.VMEM((RING + NSTAGE, BLKROWS, LANES), jnp.int32)]
            * nplanes
            + [
                pltpu.SemaphoreType.DMA((RING + NSTAGE,)),
                pltpu.SemaphoreType.DMA((RING + NSTAGE,)),
            ]
        ),
    )
    aliases = {1 + p: p for p in range(nplanes)}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((w_rows, LANES), jnp.int32)
        ] * nplanes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def block_permute(
    w: Sequence[jax.Array],
    sched: jax.Array,              # (nchunks*8? , SCHED_CHUNK*4) int32
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Apply a cycle-linearized block-move schedule in place over ``w``.

    ``sched`` is (nchunks, SCHED_CHUNK*4) int32, padded with -1 slots;
    see _permute_body for the entry format.  Build it with
    engine_v5.permute_schedule."""
    nplanes = len(w)
    nchunks = int(sched.shape[0])
    ncp = -(-nchunks // 8) * 8
    sched = jnp.pad(sched, ((0, ncp - nchunks), (0, 0)),
                    constant_values=-1)
    call = _permute_exe(w[0].shape[0], nchunks, nplanes, interpret)
    return tuple(call(sched, *w))
