"""v4 Pallas kernels: exact-plan histogram + route partition levels.

The v4 engine splits every partition level into two sweeps, mirroring the
reference's histogram/permute split (``histogram`` msb_64.c:701-738 then
``partition_ip_buf`` :785-978, and the block engine's count-then-scatter
``range_partition_to_blocks`` :497-699):

- ``hist_level``: per tile, count elements per range (the SIMD classifier
  ``range_histogram`` analog, msb_64.c:239-351).  Output is the exact
  (ntiles, rmax) count matrix.
- XLA glue (engine_v4) turns the counts into *exact* per-(tile, range)
  destination rows, pad counts and pad values via prefix sums — the
  deterministic replacement for the reference's atomic block claiming
  (``__sync_fetch_and_add``, msb_64.c:2027,2056,1711).  Arenas are packed
  exactly (no ``fudge`` slack, no overflow possible at the levels).
- ``route_level``: per tile: load (double-buffered), sentinel-mask,
  synthesize row-alignment phantom pads, sort the tile in VMEM, and DMA
  each range's row-aligned run to its precomputed destination.  No SMEM
  cursors, no in-kernel histogram — all scalar tables arrive per tile as
  blocked SMEM inputs.  Stores from tile t drain while tile t+1 sorts.
- ``terminal_write``: per final bucket: load, mask, in-VMEM sort, trim to
  the real (non-phantom) count, rotate to the element-aligned output
  offset, and read-modify-write the boundary rows — local sort P12
  (msb_64.c:2199-2255) fused with the ``inject`` splice (:1278-1302).

Value planes: every kernel moves ``nv`` (0..2) payload planes alongside
the keys (rids as one u32 plane, or u64 rids/keys as two planes); the
comparison is lexicographic over (key, planes...) — most significant
first — which makes the pipeline a stable key sort when plane 0 is the
original index and a full u64 sort when the planes are (hi, lo) words.

Keys/planes are int32 in the sign-biased uint32 encoding
(msb_64.c:248-251).  Sentinel = biased +inf.
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

LANES = 128
SENT = np.int32(0x7FFFFFFF)       # biased +inf (= unbiased 0xFFFFFFFF)
BIAS = np.int32(-0x80000000)
CHUNK_ROWS = 64                   # fixed store-DMA chunk; also the arena
                                  # per-child gap absorbing chunk overshoot
VMEM_LIMIT = 100 * 1024 * 1024    # scoped-VMEM budget (v5e has 128 MiB);
                                  # the default 16 MiB stack limit OOMs the
                                  # multi-plane sort networks at sr=2048


def _flat_iota(shape):
    r = lax.broadcasted_iota(jnp.int32, shape, 0)
    l = lax.broadcasted_iota(jnp.int32, shape, 1)
    return r * LANES + l


def _dummy_wait(buf, sem, rows):
    """Decrement ``sem`` by ``rows`` rows' worth of bytes: the wait op
    subtracts its descriptor's byte count, so a self-copy descriptor of
    the right size drains previously issued DMAs in aggregate."""
    pltpu.make_async_copy(
        buf.at[pl.ds(0, rows), :], buf.at[pl.ds(0, rows), :], sem
    ).wait()


# ===================================================== hist_level

def _hist_kernel(
    meta,          # SMEM prefetch (ntiles+1)*3 flat: parent, src_row, nelems
    bounds,        # SMEM prefetch (nparents*rmax,) biased inclusive uppers
    src_ref,       # (src_rows, 128) ANY
    hist_ref,      # (rmax,) SMEM blocked out: counts for this tile
    kbuf,          # (2, pitch, 128) VMEM scratch
    sems,          # DMA (2,)
    *,
    pitch: int, rmax: int, bias_input: bool,
    digit_shift: Optional[int] = None, digit_bits: int = 0,
):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = lax.rem(t, 2)

    def load(tile, s):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(meta[tile * 3 + 1], pitch), :],
            kbuf.at[s], sems.at[s],
        )

    # dead (nelems == 0) tiles skip their loads entirely — the L2 grid
    # is padded with up to rmax dead tiles whose loads would otherwise
    # stream ~1 MB of garbage each
    @pl.when((t == 0) & (meta[2] > 0))
    def _():
        load(0, 0).start()

    nelems = meta[t * 3 + 2]

    @pl.when(nelems > 0)
    def _():
        load(t, slot).wait()

    @pl.when((t + 1 < nt) & (meta[(t + 1) * 3 + 2] > 0))
    def _():
        load(t + 1, 1 - slot).start()

    parent = meta[t * 3]
    k = kbuf[slot]
    if digit_shift is not None:
        # LSB digit mode: classify by the radix digit of the RAW (unbiased)
        # word — the ``histogram`` shift/mask analog (msb_64.c:701-738).
        # Bounds are the digit values 0..rmax-1; masked slack counts as
        # rmax (past every bound).
        k = lax.shift_right_logical(k, digit_shift) & np.int32(
            (1 << digit_bits) - 1
        )
        k = jnp.where(_flat_iota(k.shape) < nelems, k, np.int32(rmax))
    else:
        if bias_input:
            k = k ^ BIAS
        k = jnp.where(_flat_iota(k.shape) < nelems, k, SENT)

    row = lax.rem(t, 8)          # row inside the 8-tile SMEM block group

    def body(d, prev):
        b = bounds[parent * rmax + d]
        leq = jnp.sum(jnp.where(k <= b, 1, 0), dtype=jnp.int32)
        leq = jnp.minimum(leq, nelems)     # exclude slack sentinels
        hist_ref[row, d] = leq - prev
        return leq

    lax.fori_loop(0, rmax, body, jnp.int32(0), unroll=True)


@functools.lru_cache(maxsize=None)
def _hist_exe(src_rows: int, ntiles: int, rmax: int, pitch: int,
              bias_input: bool, interpret: bool,
              digit_shift: Optional[int] = None, digit_bits: int = 0):
    kernel = functools.partial(
        _hist_kernel, pitch=pitch, rmax=rmax, bias_input=bias_input,
        digit_shift=digit_shift, digit_bits=digit_bits,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            # 8-tile SMEM block groups (t//8): the TPU lowering needs the
            # second-to-last block dim divisible by 8 (rank-1 and (1, r)
            # blocked SMEM specs are rejected); tile t writes row t%8
            pl.BlockSpec((8, rmax), lambda t, *_: (t // 8, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, pitch, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    ntp = -(-ntiles // 8) * 8
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ntp, rmax), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def hist_level(
    src: jax.Array,           # (src_rows, 128) int32
    meta: jax.Array,          # ((ntiles+1)*3,) int32 flat
    bounds: jax.Array,        # (nparents*rmax,) int32 flat, biased
    ntiles: int,
    pitch: int,
    rmax: int,
    bias_input: bool = False,
    interpret: bool = False,
    digit_shift: Optional[int] = None,
    digit_bits: int = 0,
) -> jax.Array:
    """Exact per-(tile, range) histogram sweep.  Returns (ntiles, rmax).

    With ``digit_shift`` set, classifies by the radix digit
    ``(raw >> digit_shift) & (2^digit_bits - 1)`` of the raw word instead
    of range bounds (the LSB variants' per-pass histogram, the reference
    ``histogram``/``partition_keys`` count phase, msb_64.c:701-738,
    1056-1071); ``bounds`` must then be ``arange(rmax)``.
    """
    call = _hist_exe(src.shape[0], ntiles, rmax, pitch, bias_input,
                     interpret, digit_shift, digit_bits)
    (h,) = call(meta, bounds, src)
    return h[:ntiles]


# ===================================================== route_level

def _route_body(
    meta, cnt_ref, dst_ref, padv_ref, srcs, outs, bufs, lsem, ssem,
    schunks, *, pitch, rmax, sort_rows, nlex, bias_input,
    digit_shift=None, digit_bits=0, digit_plane=0, nosort=False,
):
    nplanes = len(srcs)
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = lax.rem(t, 2)
    grow = lax.rem(t, 8)         # row inside the 8-tile SMEM block group
    BUFROWS = sort_rows + CHUNK_ROWS
    GMAX = BUFROWS // CHUNK_ROWS

    def start_loads(tile, s):
        srow = meta[tile * 3 + 1]
        for p in range(nplanes):
            pltpu.make_async_copy(
                srcs[p].at[pl.ds(srow, pitch), :],
                bufs[p].at[s, pl.ds(0, pitch), :],
                lsem.at[s],
            ).start()

    nelems = meta[t * 3 + 2]

    @pl.when(t == 0)
    def _():
        schunks[0] = 0
        schunks[1] = 0

    @pl.when((t == 0) & (meta[2] > 0))
    def _():
        start_loads(0, 0)

    # ---- wait for this tile's planes (one dummy per plane: equal
    # sizes); dead tiles never started a load (see _hist_kernel note)
    @pl.when(nelems > 0)
    def _():
        for p in range(nplanes):
            pltpu.make_async_copy(
                bufs[0].at[slot, pl.ds(0, pitch), :],
                bufs[0].at[slot, pl.ds(0, pitch), :],
                lsem.at[slot],
            ).wait()

    @pl.when(nelems > 0)
    def _compute():
        live = _flat_iota((pitch, LANES)) < nelems
        k = bufs[0][slot, pl.ds(0, pitch), :]
        if bias_input:
            k = k ^ BIAS
        bufs[0][slot, pl.ds(0, pitch), :] = jnp.where(live, k, SENT)
        for p in range(1, nplanes):
            v = bufs[p][slot, pl.ds(0, pitch), :]
            if bias_input:
                v = v ^ BIAS
            bufs[p][slot, pl.ds(0, pitch), :] = jnp.where(live, v, SENT)

        # ---- synthesize phantom pad rows at [pitch, pitch+rmax)
        lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        dp = digit_plane
        def pad_body(d, _):
            npad = (-cnt_ref[grow, d]) % LANES
            row = jnp.where(lane1 < npad, padv_ref[grow, d], SENT)
            bufs[dp][slot, pl.ds(pitch + d, 1), :] = row
            return 0
        lax.fori_loop(0, rmax, pad_body, 0, unroll=True)
        for p in range(nplanes):
            if p != dp:
                bufs[p][slot, pl.ds(pitch, rmax), :] = jnp.full(
                    (rmax, LANES), SENT, jnp.int32
                )

        # ---- sort the padded tile (groups ranges, runs row-aligned)
        planes = tuple(
            bufs[p][slot, pl.ds(0, sort_rows), :] for p in range(nplanes)
        )
        if nosort:
            sorted_planes = planes      # profiling: overhead w/o the sort
        elif digit_shift is None:
            sorted_planes = net_sort_multi(planes, nlex=nlex)
        else:
            # LSB digit mode: order by a synthesized unique composite
            # (digit, arrival rank) — a STABLE per-pass partition (the
            # write-cursor order of partition_keys, msb_64.c:1085-1124);
            # pad lanes rank past every real element, slack sorts to the
            # end past all runs.
            ranksz = 1 << int(
                np.ceil(np.log2(pitch * LANES + 2 * LANES))
            )
            kd = planes[dp]
            dig = lax.shift_right_logical(kd, digit_shift) & np.int32(
                (1 << digit_bits) - 1
            )
            rowi = lax.broadcasted_iota(jnp.int32, kd.shape, 0)
            lanei = lax.broadcasted_iota(jnp.int32, kd.shape, 1)
            flat = rowi * LANES + lanei
            rank = jnp.where(
                rowi < pitch, flat, np.int32(pitch * LANES) + lanei
            )
            islive = jnp.where(rowi < pitch, flat < nelems, kd != SENT)
            comp = jnp.where(islive, dig * np.int32(ranksz) + rank, SENT)
            sorted_planes = net_sort_multi((comp,) + planes, nlex=0)[1:]
        for p in range(nplanes):
            bufs[p][slot, pl.ds(0, sort_rows), :] = sorted_planes[p]

    # ---- drain the OTHER slot's stores (issued at t-1; they had a full
    # sort's worth of time to land), then prefetch the next tile into it
    def drain(s):
        nch = schunks[s]
        def grp(i, _):
            _dummy_wait(bufs[0].at[s], ssem.at[s], GMAX * CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nch // GMAX, grp, 0, unroll=False)
        def one(i, _):
            _dummy_wait(bufs[0].at[s], ssem.at[s], CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nch % GMAX, one, 0, unroll=False)
        schunks[s] = 0

    drain(1 - slot)

    @pl.when((t + 1 < nt) & (meta[(t + 1) * 3 + 2] > 0))
    def _():
        start_loads(t + 1, 1 - slot)

    # ---- issue this tile's run stores at precomputed destinations
    @pl.when(nelems > 0)
    def _stores():
        def run_body(d, carry):
            row0, nch_acc = carry
            cnt = cnt_ref[grow, d]
            rrows = (cnt + LANES - 1) // LANES
            dst0 = dst_ref[grow, d]
            # dst < 0 marks a dropped (heavy value-filled) range: its run
            # still occupies the sorted tile — offsets always advance by
            # the TRUE row count — but nothing is stored
            nch = jnp.where(
                dst0 >= 0, (rrows + CHUNK_ROWS - 1) // CHUNK_ROWS, 0
            )
            dst0 = jnp.maximum(dst0, 0)
            def ch(i, _):
                for p in range(nplanes):
                    pltpu.make_async_copy(
                        bufs[p].at[
                            slot, pl.ds(row0 + i * CHUNK_ROWS, CHUNK_ROWS),
                            :,
                        ],
                        outs[p].at[pl.ds(dst0 + i * CHUNK_ROWS,
                                         CHUNK_ROWS), :],
                        ssem.at[slot],
                    ).start()
                return 0
            lax.fori_loop(0, nch, ch, 0, unroll=False)
            return (row0 + rrows, nch_acc + nch * nplanes)
        _, nch_total = lax.fori_loop(
            0, rmax, run_body, (jnp.int32(0), jnp.int32(0)), unroll=True
        )
        schunks[slot] = nch_total

    # ---- last tile: drain own stores before the kernel exits
    @pl.when(t == nt - 1)
    def _():
        drain(slot)


def _route_kernel_factory(nplanes, accumulate=False, nosort=False, **kw):
    def kernel(meta, cnt_ref, dst_ref, padv_ref, *rest):
        srcs = rest[:nplanes]
        # in accumulate mode the outputs are aliased to arena inputs that
        # sit between srcs and outs (never read in-kernel)
        base = 2 * nplanes if accumulate else nplanes
        outs = rest[base:base + nplanes]
        bufs = rest[base + nplanes:base + 2 * nplanes]
        lsem, ssem, schunks = rest[base + 2 * nplanes:]
        _route_body(meta, cnt_ref, dst_ref, padv_ref, srcs, outs, bufs,
                    lsem, ssem, schunks, nosort=nosort, **kw)
    return kernel


@functools.lru_cache(maxsize=None)
def _route_exe(src_rows: int, dst_rows: int, ntiles: int, rmax: int,
               pitch: int, sort_rows: int, nplanes: int, nlex: int,
               bias_input: bool, interpret: bool,
               digit_shift: Optional[int] = None, digit_bits: int = 0,
               digit_plane: int = 0, accumulate: bool = False,
               nosort: bool = False):
    kernel = _route_kernel_factory(
        nplanes, accumulate=accumulate, nosort=nosort,
        pitch=pitch, rmax=rmax, sort_rows=sort_rows, nlex=nlex,
        bias_input=bias_input, digit_shift=digit_shift,
        digit_bits=digit_bits, digit_plane=digit_plane,
    )
    BUFROWS = sort_rows + CHUNK_ROWS
    data = jax.ShapeDtypeStruct((dst_rows, LANES), jnp.int32)
    smem_row = lambda t, *_: (t // 8, 0)
    ndata_in = nplanes * (2 if accumulate else 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=(
            # 8-tile SMEM block groups (see _hist_exe): tile t reads
            # row t%8 of block t//8
            [pl.BlockSpec((8, rmax), smem_row,
                          memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pl.ANY)] * ndata_in
        ),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=(
            [pltpu.VMEM((2, BUFROWS, LANES), jnp.int32)] * nplanes
            + [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((2,), jnp.int32),
            ]
        ),
    )
    # arena input p (operand 1 scalar-prefetch + 3 tables + nplanes srcs
    # + p) aliases output p: k route calls accumulate into ONE shared
    # arena — chunk-partitioned regions interleave inside range regions
    aliases = {
        4 + nplanes + p: p for p in range(nplanes)
    } if accumulate else {}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[data] * nplanes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def route_level(
    srcs: Sequence[jax.Array],     # nplanes x (src_rows, 128) int32
    meta: jax.Array,               # ((ntiles+1)*3,) int32 flat
    cnt_tbl: jax.Array,            # (ntiles, rmax) int32 exact counts
    dst_tbl: jax.Array,            # (ntiles, rmax) int32 dest rows
    padv_tbl: jax.Array,           # (ntiles, rmax) int32 biased pad values
    dst_rows: int,
    ntiles: int,
    pitch: int,
    rmax: int,
    nlex: Optional[int] = None,
    bias_input: bool = False,
    interpret: bool = False,
    digit_shift: Optional[int] = None,
    digit_bits: int = 0,
    digit_plane: int = 0,
    arenas: Optional[Sequence[jax.Array]] = None,
    nosort: bool = False,
) -> Tuple[jax.Array, ...]:
    """Run one partition level with exact precomputed destinations.

    Every (tile, range) run lands row-aligned at ``dst_tbl[t, r]``; runs
    are padded to whole rows with ``padv_tbl`` values (phantom pads — in
    range for their target, trimmed by the terminal via exact accounting
    in the engine glue).  Store chunks may overshoot up to CHUNK_ROWS-1
    rows past a run; the arena layout must leave a CHUNK_ROWS gap after
    each child region.

    With ``digit_shift`` set, partitions STABLY by the radix digit of
    plane ``digit_plane`` (the LSB variants' permute phase,
    msb_64.c:1085-1124); ``padv_tbl`` must then carry a raw word whose
    digit equals the run's digit (e.g. ``d << digit_shift``).
    """
    nplanes = len(srcs)
    sort_rows = pitch + rmax
    assert sort_rows * LANES & (sort_rows * LANES - 1) == 0, \
        f"sort size must be pow2, got {sort_rows} rows"
    if nlex is None:
        nlex = nplanes - 1
    call = _route_exe(
        srcs[0].shape[0], dst_rows, ntiles, rmax, pitch, sort_rows,
        nplanes, nlex, bias_input, interpret, digit_shift, digit_bits,
        digit_plane, arenas is not None, nosort,
    )
    ntp = -(-ntiles // 8) * 8
    pad = ((0, ntp - ntiles), (0, 0))
    extra = tuple(arenas) if arenas is not None else ()
    outs = call(
        meta,
        jnp.pad(cnt_tbl.reshape(ntiles, rmax), pad),
        jnp.pad(dst_tbl.reshape(ntiles, rmax), pad),
        jnp.pad(padv_tbl.reshape(ntiles, rmax), pad),
        *srcs, *extra,
    )
    return tuple(outs)


# ===================================================== terminal_write

def _terminal_body(
    btbl, srcs, outs, bufs, heads, tails, sems, *,
    cap_rows, nlex, unbias_output, class_id=None,
):
    """Per final bucket: load, mask, sort, trim, rotate, splice.

    btbl layout per bucket (stride 8): src_row, occ_rows, real_cnt, mode,
    fill_value (biased), out_off, class, 0.  mode: 0 sort+write,
    1 value-fill.

    With ``class_id`` set, only buckets whose class column matches are
    processed — the engine partitions buckets into capacity classes and
    runs one (cheaper) sort network per class instead of always sorting
    the largest cap (the ``schedule_passes`` pass-sizing idea,
    msb_64.c:1334-1400, applied to the terminal tier).  Because classes
    interleave arbitrarily in output order, boundary rows are
    read-modify-written on BOTH sides (head AND tail): each bucket
    touches only its own lanes, so any serialized processing order is
    correct.
    """
    nplanes = len(srcs)
    b = pl.program_id(0)
    src_row = btbl[b * 8]
    occ = btbl[b * 8 + 1]
    real = btbl[b * 8 + 2]
    mode = btbl[b * 8 + 3]
    fillv = btbl[b * 8 + 4]
    off = btbl[b * 8 + 5]
    cls = btbl[b * 8 + 6]
    # hard safety clamp: in mode 0 the write span streams from the
    # cap_rows-sized sorted buffer; a corrupt/overflowed real count must
    # never drive chunk reads past it
    real = jnp.where(
        mode == 0, jnp.minimum(real, cap_rows * LANES), real
    )
    phase = off % LANES
    q0 = off // LANES
    lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    span = (phase + real + LANES - 1) // LANES
    end_phase = (phase + real) % LANES

    # buf layout: row 1 = output row q0 (head), rows 2.. = later rows,
    # row 1+cap_rows = spill row; FILLROW.. = mode-1 steady fill chunk.
    FILLROW = 2 + cap_rows + CHUNK_ROWS

    want = real > 0
    if class_id is not None:
        want = want & (cls == class_id)

    @pl.when(want)
    def _():
        # ---- boundary reads FIRST (head + tail rows of my output span):
        # both get merged so this bucket only ever writes its own lanes
        for p in range(nplanes):
            pltpu.make_async_copy(
                outs[p].at[pl.ds(q0, 1), :], heads[p], sems.at[p]
            ).start()
            pltpu.make_async_copy(
                outs[p].at[pl.ds(q0 + span - 1, 1), :], tails[p],
                sems.at[p],
            ).start()
        for p in range(nplanes):
            pltpu.make_async_copy(
                outs[p].at[pl.ds(q0, 1), :], heads[p], sems.at[p]
            ).wait()
            pltpu.make_async_copy(
                outs[p].at[pl.ds(q0, 1), :], tails[p], sems.at[p]
            ).wait()

        @pl.when(mode == 0)
        def _load_sort():
            for p in range(nplanes):
                pltpu.make_async_copy(
                    srcs[p].at[pl.ds(src_row, cap_rows), :],
                    bufs[p].at[pl.ds(1, cap_rows), :], sems.at[p],
                ).start()
            for p in range(nplanes):
                pltpu.make_async_copy(
                    srcs[p].at[pl.ds(src_row, cap_rows), :],
                    bufs[p].at[pl.ds(1, cap_rows), :], sems.at[p],
                ).wait()
            rowi = lax.broadcasted_iota(jnp.int32, (cap_rows, LANES), 0)
            planes = tuple(
                jnp.where(rowi < occ, bufs[p][pl.ds(1, cap_rows), :], SENT)
                for p in range(nplanes)
            )
            planes = net_sort_multi(planes, nlex=nlex)

            # rotate right by phase so element 0 lands at lane (off%128)
            def rot(x):
                lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
                idx = (lane - phase) % LANES
                rolled = jnp.take_along_axis(x, idx, axis=1)
                up = jnp.roll(rolled, 1, axis=0)     # row r-1's tail
                main = jnp.where(lane >= phase, rolled, up)
                spill = jnp.where(lane[0:1] < phase,
                                  rolled[cap_rows - 1: cap_rows, :], SENT)
                return main, spill
            for p in range(nplanes):
                mk, sk = rot(planes[p])
                if unbias_output:
                    mk = mk ^ BIAS
                    sk = sk ^ BIAS
                bufs[p][pl.ds(1, cap_rows), :] = mk
                bufs[p][pl.ds(1 + cap_rows, 1), :] = sk
            # head/tail RMW merges: keep existing output outside my lanes
            for p in range(nplanes):
                bufs[p][pl.ds(1, 1), :] = jnp.where(
                    lane1 < phase, heads[p][:], bufs[p][pl.ds(1, 1), :]
                )

            @pl.when(end_phase > 0)
            def _():
                for p in range(nplanes):
                    bufs[p][pl.ds(span, 1), :] = jnp.where(
                        lane1 >= end_phase, tails[p][:],
                        bufs[p][pl.ds(span, 1), :]
                    )

        @pl.when(mode == 1)
        def _fill():
            fv = fillv ^ (BIAS if unbias_output else np.int32(0))
            blk = jnp.full((CHUNK_ROWS, LANES), 1, jnp.int32) * fv
            bufs[0][pl.ds(1, CHUNK_ROWS), :] = blk
            bufs[0][pl.ds(FILLROW, CHUNK_ROWS), :] = blk
            bufs[0][pl.ds(1, 1), :] = jnp.where(
                lane1 < phase, heads[0][:], bufs[0][pl.ds(1, 1), :]
            )
            # patched last row, written as the final 1-row store below
            t = jnp.where(lane1 < end_phase, fv, tails[0][:])
            t = jnp.where((span == 1) & (lane1 < phase), heads[0][:], t)
            tails[0][...] = jnp.where(end_phase > 0, t, fv)

        # ---- write rows [q0, q0+span) EXACTLY (no chunk overshoot:
        # classes interleave in output order, so rows past my span may
        # already hold other buckets' finished content).
        # mode-1 with a partial last row: that row is written ONLY by
        # the merged-tail patch store below — writing it here too would
        # race two in-flight DMAs on one row (observed as interleaved
        # 8-lane granules of fill value inside the next bucket's lanes,
        # zipf1.1 @ 2^26)
        npatch = jnp.where((mode == 1) & (end_phase > 0), 1, 0)
        wspan = span - npatch
        nfull = wspan // CHUNK_ROWS
        def wb(i, _):
            src_r = jnp.where(
                mode == 0, 1 + i * CHUNK_ROWS,
                jnp.where(i == 0, 1, FILLROW),
            )
            for p in range(nplanes):
                pltpu.make_async_copy(
                    bufs[p].at[pl.ds(src_r, CHUNK_ROWS), :],
                    outs[p].at[pl.ds(q0 + i * CHUNK_ROWS, CHUNK_ROWS), :],
                    sems.at[p],
                ).start()
            return 0
        lax.fori_loop(0, nfull, wb, 0, unroll=False)

        # remainder rows via binary decomposition (exact, <=log2 DMAs)
        rem = wspan % CHUNK_ROWS
        done = nfull * CHUNK_ROWS
        sz = CHUNK_ROWS // 2
        while sz >= 1:
            bit = (rem & sz) != 0
            # mode-1 steady source must hold fv for any slice: FILLROW
            # block is CHUNK_ROWS of fv; head row only matters when no
            # full chunk preceded (done == 0 -> source from row 1)
            @pl.when(bit)
            def _(sz=sz, done=done):
                src_r = jnp.where(
                    mode == 0, 1 + done,
                    jnp.where(done == 0, 1, FILLROW),
                )
                for p in range(nplanes):
                    pltpu.make_async_copy(
                        bufs[p].at[pl.ds(src_r, sz), :],
                        outs[p].at[pl.ds(q0 + done, sz), :],
                        sems.at[p],
                    ).start()
            done = done + jnp.where(bit, sz, 0)
            sz //= 2

        # mode-1 tail patch: the merged final row (sole writer of that
        # row — see wspan above)
        @pl.when(npatch > 0)
        def _():
            for p in range(min(nplanes, 1)):
                pltpu.make_async_copy(
                    tails[p], outs[p].at[pl.ds(q0 + span - 1, 1), :],
                    sems.at[p],
                ).start()

        # aggregated drain: the wait op decrements the semaphore by its
        # descriptor's byte count, so grouped/binary self-descriptors
        # drain exactly what was issued
        gmax = max(1, min(16, (cap_rows + 2 + 2 * CHUNK_ROWS)
                          // CHUNK_ROWS))
        def dr_group(i, _):
            for p in range(nplanes):
                _dummy_wait(bufs[p], sems.at[p], gmax * CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nfull // gmax, dr_group, 0, unroll=False)
        def dr_one(i, _):
            for p in range(nplanes):
                _dummy_wait(bufs[p], sems.at[p], CHUNK_ROWS)
            return 0
        lax.fori_loop(0, nfull % gmax, dr_one, 0, unroll=False)
        sz2 = CHUNK_ROWS // 2
        while sz2 >= 1:
            @pl.when((rem & sz2) != 0)
            def _(sz2=sz2):
                for p in range(nplanes):
                    _dummy_wait(bufs[p], sems.at[p], sz2)
            sz2 //= 2
        @pl.when(npatch > 0)
        def _():
            _dummy_wait(bufs[0], sems.at[0], 1)


def _terminal_kernel_factory(nplanes, chained, **kw):
    def kernel(btbl, *rest):
        srcs = rest[:nplanes]
        base = 2 * nplanes if chained else nplanes
        outs = rest[base:base + nplanes]
        bufs = rest[base + nplanes:base + 2 * nplanes]
        heads = rest[base + 2 * nplanes:base + 3 * nplanes]
        tails = rest[base + 3 * nplanes:base + 4 * nplanes]
        sems = rest[base + 4 * nplanes]
        _terminal_body(btbl, srcs, outs, bufs, heads, tails, sems, **kw)
    return kernel


@functools.lru_cache(maxsize=None)
def _terminal_exe(src_rows: int, out_rows: int, nb: int, cap_rows: int,
                  nplanes: int, nlex: int, unbias_output: bool,
                  interpret: bool, class_id: Optional[int] = None,
                  chained: bool = False):
    kernel = _terminal_kernel_factory(
        nplanes, chained, cap_rows=cap_rows, nlex=nlex,
        unbias_output=unbias_output, class_id=class_id,
    )
    BUF = cap_rows + 2 + 2 * CHUNK_ROWS
    ndata_in = nplanes * (2 if chained else 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ndata_in,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=(
            [pltpu.VMEM((BUF, LANES), jnp.int32)] * nplanes
            + [pltpu.VMEM((1, LANES), jnp.int32)] * nplanes
            + [pltpu.VMEM((1, LANES), jnp.int32)] * nplanes
            + [pltpu.SemaphoreType.DMA((nplanes,))]
        ),
    )
    # chained: the prior class pass's outputs arrive as aliased inputs
    # (operand 1 + nplanes srcs + p) so class passes serialize on the
    # same output buffer
    aliases = {
        1 + nplanes + p: p for p in range(nplanes)
    } if chained else {}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
        ] * nplanes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def terminal_write(
    srcs: Sequence[jax.Array],
    btbl: jax.Array,        # (nb, 8) int32 (see _terminal_body)
    out_rows: int,
    cap_rows: int,
    nlex: Optional[int] = None,
    unbias_output: bool = True,
    interpret: bool = False,
    class_id: Optional[int] = None,
    prev_outs: Optional[Sequence[jax.Array]] = None,
) -> Tuple[jax.Array, ...]:
    """Sort every bucket in VMEM and write its real prefix to the exact
    output position.

    Single-call mode (``class_id=None``): processes every bucket;
    buckets must be in ascending out_off order.  Class mode: processes
    only buckets whose btbl class column (col 6) equals ``class_id``,
    with ``cap_rows`` sized for that class; chain calls via
    ``prev_outs`` (aliased) from the largest class down.  Boundary rows
    are RMW'd on both sides, so cross-class interleaving is safe."""
    nplanes = len(srcs)
    nb = int(btbl.shape[0])
    if nlex is None:
        nlex = nplanes - 1
    call = _terminal_exe(
        srcs[0].shape[0], out_rows, nb, cap_rows, nplanes, nlex,
        unbias_output, interpret, class_id, prev_outs is not None,
    )
    extra = tuple(prev_outs) if prev_outs is not None else ()
    outs = call(btbl.reshape(-1), *srcs, *extra)
    return tuple(outs)


# ===================================================== splice_runs

LCH = 8          # splice load/store chunk rows


def _splice_body(
    btbl, srcs, outs, bufs, obufs, tails, lsem, ssem, *,
    max_occ: int, unbias_output: bool,
):
    """Streaming compaction: concatenate the REAL prefixes of row-aligned
    runs into one dense element-exact output stream.

    btbl per run (stride 8): src_row, occ_rows, real_cnt, _, _, out_off.
    Runs must arrive in ascending out_off order with out_off exactly
    cumulative (off[b+1] = off[b] + real[b]): the partial last output row
    is carried in VMEM (``tails``) across grid steps instead of being
    read back from HBM — the ``inject`` splice (msb_64.c:1278-1302)
    without its read-modify-write.
    """
    nplanes = len(srcs)
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    slot = lax.rem(b, 2)

    def start_load(run, s):
        src_row = btbl[run * 8]
        occ = jnp.minimum(btbl[run * 8 + 1], max_occ)
        nld = (occ + LCH - 1) // LCH
        def ld(i, _):
            for p in range(nplanes):
                pltpu.make_async_copy(
                    srcs[p].at[pl.ds(src_row + i * LCH, LCH), :],
                    bufs[p].at[s, pl.ds(1 + i * LCH, LCH), :],
                    lsem.at[s],
                ).start()
            return 0
        lax.fori_loop(0, nld, ld, 0, unroll=False)

    @pl.when(b == 0)
    def _():
        start_load(0, 0)

    # wait own load (nld chunks x nplanes, equal sizes)
    occ = jnp.minimum(btbl[b * 8 + 1], max_occ)
    nld = (occ + LCH - 1) // LCH
    def wt(i, _):
        for p in range(nplanes):
            _dummy_wait(bufs[0].at[slot], lsem.at[slot], LCH)
        return 0
    lax.fori_loop(0, nld, wt, 0, unroll=False)

    @pl.when(b + 1 < nb)
    def _():
        start_load(b + 1, 1 - slot)

    real = btbl[b * 8 + 2]
    real = jnp.minimum(real, occ * LANES)
    off = btbl[b * 8 + 5]
    phase = off % LANES
    q0 = off // LANES
    lane1 = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    rot_idx1 = (lane1 - phase) % LANES

    @pl.when(real > 0)
    def _emit():
        nfull = (phase + real) // LANES
        rem = (phase + real) % LANES
        nch = (nfull + LCH - 1) // LCH
        lanef = lax.broadcasted_iota(jnp.int32, (LCH + 1, LANES), 1)

        # NB: the (LCH+1)-row window has an unaligned sublane count; the
        # Mosaic pipeline compiles dynamic-shift ``pltpu.roll`` and
        # PREFIX slices of such values, but aborts (jellyfish CHECK,
        # array.h limits<=dim) on dynamic gathers and on selects mixing
        # the [1:] / [:-1] offset slices — hence roll-then-prefix-slice.
        def chunk(i, _):
            # wait the previous chunk's stores before reusing obuf
            @pl.when(i >= 1)
            def _():
                for p in range(nplanes):
                    _dummy_wait(obufs[p], ssem.at[0], LCH)
            for p in range(nplanes):
                # buf row j holds element row j-1; window covers
                # element rows [i*LCH - 1, i*LCH + LCH)
                win = bufs[p][slot, pl.ds(i * LCH, LCH + 1), :]
                rolled = pltpu.roll(win, phase, 1)      # lane rotation
                up = pltpu.roll(rolled, LCH, 0)         # up[j] = rolled[j+1]
                mainf = jnp.where(lanef >= phase, up, rolled)
                main = mainf[:LCH]
                head = jnp.where(
                    (i == 0) & (lanef[0:1] < phase),
                    tails[p][:], mainf[0:1],
                )
                if unbias_output:
                    main = main ^ BIAS
                    head = head ^ BIAS
                obufs[p][...] = main
                obufs[p][pl.ds(0, 1), :] = head
                pltpu.make_async_copy(
                    obufs[p].at[pl.ds(0, LCH), :],
                    outs[p].at[pl.ds(q0 + i * LCH, LCH), :],
                    ssem.at[0],
                ).start()
            return 0
        lax.fori_loop(0, nch, chunk, 0, unroll=False)

        # ---- carry the new partial output row in VMEM
        @pl.when(rem > 0)
        def _():
            for p in range(nplanes):
                wt2 = bufs[p][slot, pl.ds(nfull, 2), :]
                rolledt = pltpu.roll(wt2, phase, 1)
                upt = pltpu.roll(rolledt, 1, 0)         # upt[0] = rolledt[1]
                tcand = jnp.where(
                    lane1 >= phase, upt[0:1], rolledt[0:1]
                )
                tcand = jnp.where(
                    (nfull == 0) & (lane1 < phase), tails[p][:], tcand
                )
                tails[p][...] = tcand

        # drain remaining stores before the next run writes obuf/out
        @pl.when(nch >= 1)
        def _():
            for p in range(nplanes):
                _dummy_wait(obufs[p], ssem.at[0], LCH)

    # ---- final flush: write the trailing partial row
    @pl.when(b == nb - 1)
    def _flush():
        end = off + real
        remf = end % LANES
        @pl.when(remf > 0)
        def _():
            for p in range(nplanes):
                t = tails[p][:]
                if unbias_output:
                    t = t ^ BIAS
                obufs[p][pl.ds(0, 1), :] = t
                pltpu.make_async_copy(
                    obufs[p].at[pl.ds(0, 1), :],
                    outs[p].at[pl.ds(end // LANES, 1), :],
                    ssem.at[0],
                ).start()
            for p in range(nplanes):
                _dummy_wait(obufs[p], ssem.at[0], 1)


def _splice_kernel_factory(nplanes, **kw):
    def kernel(btbl, *rest):
        srcs = rest[:nplanes]
        outs = rest[nplanes:2 * nplanes]
        bufs = rest[2 * nplanes:3 * nplanes]
        obufs = rest[3 * nplanes:4 * nplanes]
        tails = rest[4 * nplanes:5 * nplanes]
        lsem, ssem = rest[5 * nplanes:]
        _splice_body(btbl, srcs, outs, bufs, obufs, tails, lsem, ssem,
                     **kw)
    return kernel


@functools.lru_cache(maxsize=None)
def _splice_exe(src_rows: int, out_rows: int, nruns: int, max_occ: int,
                nplanes: int, unbias_output: bool, interpret: bool):
    kernel = _splice_kernel_factory(
        nplanes, max_occ=max_occ, unbias_output=unbias_output,
    )
    BUF = 1 + max_occ + LCH
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nruns,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nplanes,
        scratch_shapes=(
            [pltpu.VMEM((2, BUF, LANES), jnp.int32)] * nplanes
            + [pltpu.VMEM((LCH, LANES), jnp.int32)] * nplanes
            + [pltpu.VMEM((1, LANES), jnp.int32)] * nplanes
            + [
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ]
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
        ] * nplanes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def splice_runs(
    srcs: Sequence[jax.Array],
    btbl: jax.Array,        # (nruns, 8) int32 (see _splice_body)
    out_rows: int,
    max_occ: int,
    unbias_output: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Concatenate run prefixes element-exactly into a dense stream."""
    nplanes = len(srcs)
    nruns = int(btbl.shape[0])
    call = _splice_exe(
        srcs[0].shape[0], out_rows, nruns, max_occ, nplanes,
        unbias_output, interpret,
    )
    outs = call(btbl.reshape(-1), *srcs)
    return tuple(outs)
