"""Pallas TPU kernels for the MSD radix partition/sort engine.

Four kernels re-create the reference's hot paths with TPU-native mechanics
(reference: /root/reference/src/msb_64.c):

- ``tile_sort``    — bitonic-sorts fixed tiles in VMEM and emits per-tile
                     digit histograms.  Plays the role of the SIMD
                     classifier + local permute (``range_histogram``
                     :239-351 / ``partition_ip_buf`` :785-978): after it,
                     every tile is a concatenation of per-digit runs.
- ``distribute``   — moves each (tile, digit) run to its bucket slot with
                     chunked, dynamically-addressed DMA.  This is the
                     block-exchange engine (``range_partition_to_blocks``
                     :497-699 + the block permutation :2016-2103), with the
                     reference's atomic block claiming replaced by
                     deterministic precomputed cursors.
- ``ragged_sort``  — batched in-VMEM bitonic sort of size-classed buckets
                     (the ``local_radixsort`` terminal, :1007-1035).
- ``compact``      — streams the ragged valid prefixes of all buckets into
                     one dense output (the ``inject`` splice, :1278-1302).

Conventions: keys are bias-mapped int32 (msb_64.c:248-251 trick); element
order is C-order over (rows, 128) blocks; SENT_KEY/SENT_VAL sentinels pad
tiles and slots and always sort last ((key, val) lexicographic ties).
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

from .bitonic import bitonic_sort

LANES = 128
SENT_KEY = np.int32(0x7FFFFFFF)   # biased +inf
SENT_VAL = np.int32(0x7FFFFFFF)
MIN32 = np.int32(-0x80000000)


def _digits(keys: jax.Array, shift, bits: int) -> jax.Array:
    """Digit of the original (unbiased) key at ``shift``: monotone within a
    constant-higher-bits bucket."""
    orig_bits = keys ^ MIN32
    return lax.shift_right_logical(orig_bits, shift) & np.int32(
        (1 << bits) - 1
    )


# =========================================================== tile_sort

@functools.lru_cache(maxsize=None)
def _tile_sort_exe(rows: int, r: int, tile_rows: int, pairs: bool,
                   interpret: bool):
    ntiles = rows // tile_rows
    tile_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        tile_spec,
        tile_spec if pairs else pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES) if pairs else (1, LANES),
                             jnp.int32),
        jax.ShapeDtypeStruct((ntiles * 8, LANES), jnp.int32),
    ]
    out_specs = [
        tile_spec,
        tile_spec if pairs else pl.BlockSpec(
            (1, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]

    def _kernel(tbl_ref, key_ref, val_ref, ok_ref, ov_ref, cnt_ref,
                smem_tbl, smem_cnt, tbl_sem):
        t = pl.program_id(0)
        cp = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(8 * t, 8), :], smem_tbl, tbl_sem
        )
        cp.start()
        cp.wait()
        row_i = lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
        lane_i = lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
        flat = row_i * LANES + lane_i
        live = flat < smem_tbl[r // LANES, r % LANES]
        k = jnp.where(live, key_ref[:], SENT_KEY)
        v = (jnp.where(live, val_ref[:], SENT_VAL)) if pairs else None
        k, v = bitonic_sort(k, v)
        ok_ref[:] = k
        if pairs:
            ov_ref[:] = v
        else:
            ov_ref[0, :] = jnp.zeros((LANES,), jnp.int32)
        for dd in range(r):
            smem_cnt[dd // LANES, dd % LANES] = jnp.sum(
                jnp.where(k <= smem_tbl[dd // LANES, dd % LANES], 1, 0),
                dtype=jnp.int32,
            )
        ccp = pltpu.make_async_copy(
            smem_cnt, cnt_ref.at[pl.ds(8 * t, 8), :], tbl_sem
        )
        ccp.start()
        ccp.wait()

    call = pl.pallas_call(
        _kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((8, LANES), jnp.int32),
            pltpu.SMEM((8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def f(bounds, data_elems, keys, vals):
        tbl = jnp.concatenate(
            [bounds, data_elems.astype(jnp.int32).reshape(-1, 1)], axis=1
        )
        tbl = jnp.pad(tbl, ((0, 0), (0, 8 * LANES - tbl.shape[1])))
        tbl = tbl.reshape(ntiles * 8, LANES)
        ok, ov, cnt = call(tbl, keys, vals)
        cnt = cnt.reshape(ntiles, 8 * LANES)[:, :r]
        return ok, ov, cnt

    return jax.jit(f, donate_argnums=(2, 3) if pairs else (2,))


def tile_sort(
    keys: jax.Array,
    vals: Optional[jax.Array],
    bounds: jax.Array,
    data_elems: jax.Array,
    tile_rows: int,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Sort every (tile_rows, 128) tile of ``keys``; count range boundaries.

    keys: (rows, 128) int32 biased, rows % tile_rows == 0.
    bounds: (ntiles, R) int32 biased inclusive upper bounds of each tile's
        first R digit ranges (host-computed: bucket prefix | digit bound —
        the per-range delimiter table of msb_64.c:1545-1564 localized per
        tile).  Column R-1 is overridden by the caller's valid count.
    data_elems: (ntiles,) int32 — meaningful elements at the head of each
        tile; everything beyond is unwritten slack, masked to sentinels.
    Returns (sorted keys, sorted vals, cnt_leq (ntiles, R)).
    """
    pairs = vals is not None
    exe = _tile_sort_exe(
        keys.shape[0], bounds.shape[1], tile_rows, pairs, interpret
    )
    ok, ov, cnt = exe(
        bounds, data_elems,
        keys, vals if pairs else jnp.zeros((1,), jnp.int32),
    )
    return ok, (ov if pairs else None), cnt


# =========================================================== distribute

def _chunk_from(buf, base_row, phase, chr_rows):
    """(chr_rows,128) flat window of ``buf`` starting at element
    base_row*128 + phase (left-aligned)."""
    win = buf[pl.ds(base_row, chr_rows + 1), :]
    rolled = pltpu.roll(win, (LANES - phase) % LANES, axis=1)
    a = rolled[0:chr_rows, :]
    b = rolled[1 : chr_rows + 1, :]
    lane = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane < LANES - phase, a, b)


def _distribute_kernel(
    tbl_ref, key_ref, val_ref,
    out_key_ref, out_val_ref,
    smem_tbl, tbl_sem, tilebuf, vtilebuf, kbuf, vbuf, sems,
    *, num_ranges: int, tile_rows: int, chr_rows: int, pairs: bool
):
    t = pl.program_id(0)
    tcp = pltpu.make_async_copy(
        tbl_ref.at[pl.ds(8 * t, 8), :], smem_tbl, tbl_sem
    )
    tcp.start()
    # stage the tile with a sentinel apron so chunk windows never run off
    tilebuf[pl.ds(0, tile_rows), :] = key_ref[:]
    tilebuf[pl.ds(tile_rows, chr_rows + 1), :] = jnp.full(
        (chr_rows + 1, LANES), SENT_KEY, jnp.int32
    )
    if pairs:
        vtilebuf[pl.ds(0, tile_rows), :] = val_ref[:]
        vtilebuf[pl.ds(tile_rows, chr_rows + 1), :] = jnp.full(
            (chr_rows + 1, LANES), SENT_VAL, jnp.int32
        )

    def _wait(slot):
        pltpu.make_async_copy(
            kbuf.at[slot], out_key_ref.at[pl.ds(0, chr_rows), :],
            sems.at[0, slot],
        ).wait()
        if pairs:
            pltpu.make_async_copy(
                vbuf.at[slot], out_val_ref.at[pl.ds(0, chr_rows), :],
                sems.at[1, slot],
            ).wait()

    tcp.wait()
    g0 = jnp.int32(0)
    for d in range(num_ranges):
        j0, j1, j2 = d, num_ranges + d, 2 * num_ranges + d
        srow = smem_tbl[j0 // LANES, j0 % LANES]
        s = smem_tbl[j1 // LANES, j1 % LANES]
        ln = smem_tbl[j2 // LANES, j2 % LANES]
        base_row = lax.shift_right_logical(s, 7)
        phase = s & np.int32(LANES - 1)
        nch = lax.div(ln + np.int32(chr_rows * LANES - 1),
                      np.int32(chr_rows * LANES))

        def chunk_body(c, g, s=s, ln=ln, srow=srow, base_row=base_row,
                       phase=phase):
            slot = g % 2

            @pl.when(g >= 2)
            def _():
                _wait(slot)

            ck = _chunk_from(tilebuf, base_row + c * chr_rows, phase,
                             chr_rows)
            row_i = lax.broadcasted_iota(jnp.int32, ck.shape, 0)
            lane_i = lax.broadcasted_iota(jnp.int32, ck.shape, 1)
            flat = c * np.int32(chr_rows * LANES) + row_i * LANES + lane_i
            ck = jnp.where(flat < ln, ck, SENT_KEY)
            kbuf[slot] = ck
            pltpu.make_async_copy(
                kbuf.at[slot],
                out_key_ref.at[pl.ds(srow + c * chr_rows, chr_rows), :],
                sems.at[0, slot],
            ).start()
            if pairs:
                cv = _chunk_from(vtilebuf, base_row + c * chr_rows, phase,
                                 chr_rows)
                cv = jnp.where(flat < ln, cv, SENT_VAL)
                vbuf[slot] = cv
                pltpu.make_async_copy(
                    vbuf.at[slot],
                    out_val_ref.at[pl.ds(srow + c * chr_rows, chr_rows), :],
                    sems.at[1, slot],
                ).start()
            return g + 1

        g0 = lax.fori_loop(0, nch, chunk_body, g0)

    # drain: at most 2 outstanding DMA pairs
    @pl.when(g0 >= 1)
    def _():
        _wait((g0 - 1) % 2)

    @pl.when(g0 >= 2)
    def _():
        _wait(g0 % 2)


@functools.lru_cache(maxsize=None)
def _distribute_exe(rows: int, num_ranges: int, out_rows: int,
                    tile_rows: int, chr_rows: int, pairs: bool,
                    interpret: bool):
    ntiles = rows // tile_rows
    tile_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        tile_spec,
        tile_spec if pairs else pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((out_rows if pairs else 1, LANES), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.SMEM((8, LANES), jnp.int32),                         # tables
        pltpu.SemaphoreType.DMA(()),
        pltpu.VMEM((tile_rows + chr_rows + 1, LANES), jnp.int32),  # tilebuf
        pltpu.VMEM(
            ((tile_rows + chr_rows + 1) if pairs else 1, LANES), jnp.int32
        ),
        pltpu.VMEM((2, chr_rows, LANES), jnp.int32),               # kbuf
        pltpu.VMEM((2 if pairs else 1, chr_rows, LANES), jnp.int32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    kernel = functools.partial(
        _distribute_kernel,
        num_ranges=num_ranges,
        tile_rows=tile_rows,
        chr_rows=chr_rows,
        pairs=pairs,
    )
    call = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def f(slot_rows, run_starts, run_lens, keys, vals):
        tbl = jnp.concatenate(
            [slot_rows.astype(jnp.int32), run_starts.astype(jnp.int32),
             run_lens.astype(jnp.int32)], axis=1,
        )
        tbl = jnp.pad(tbl, ((0, 0), (0, 8 * LANES - tbl.shape[1])))
        tbl = tbl.reshape(ntiles * 8, LANES)
        return call(tbl, keys, vals)

    return jax.jit(f, donate_argnums=(3, 4) if pairs else (3,))


def distribute(
    keys: jax.Array,
    vals: Optional[jax.Array],
    slot_rows: jax.Array,    # (ntiles, R) destination row of each run
    run_starts: jax.Array,   # (ntiles, R) element offset of run in its tile
    run_lens: jax.Array,     # (ntiles, R) run length in elements
    out_rows: int,
    tile_rows: int,
    chr_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Scatter per-(tile,digit) runs into bucket slots (row-aligned)."""
    num_ranges = slot_rows.shape[1]
    assert 3 * num_ranges <= 8 * LANES, "num_ranges too large for table"
    pairs = vals is not None
    exe = _distribute_exe(
        keys.shape[0], num_ranges, out_rows, tile_rows, chr_rows, pairs,
        interpret,
    )
    ok, ov = exe(
        slot_rows, run_starts, run_lens,
        keys, vals if pairs else jnp.zeros((1,), jnp.int32),
    )
    return ok, (ov if pairs else None)


# =========================================================== ragged_sort

def _ragged_sort_kernel(
    start_ref, pad_ref, key_ref, val_ref, out_key_ref, out_val_ref,
    kbuf, vbuf, sems,
    *, class_rows: int, pairs: bool
):
    b = pl.program_id(0)
    srow = start_ref[b]
    cp_in = pltpu.make_async_copy(
        key_ref.at[pl.ds(srow, class_rows), :], kbuf, sems.at[0]
    )
    cp_in.start()
    if pairs:
        cv_in = pltpu.make_async_copy(
            val_ref.at[pl.ds(srow, class_rows), :], vbuf, sems.at[1]
        )
        cv_in.start()
        cv_in.wait()
    cp_in.wait()
    row_i = lax.broadcasted_iota(jnp.int32, (class_rows, LANES), 0)
    lane_i = lax.broadcasted_iota(jnp.int32, (class_rows, LANES), 1)
    live = (row_i * LANES + lane_i) < pad_ref[b]
    k, v = bitonic_sort(
        jnp.where(live, kbuf[:], SENT_KEY),
        jnp.where(live, vbuf[:], SENT_VAL) if pairs else None,
    )
    kbuf[:] = k
    if pairs:
        vbuf[:] = v
    cp_out = pltpu.make_async_copy(
        kbuf, out_key_ref.at[pl.ds(srow, class_rows), :], sems.at[0]
    )
    cp_out.start()
    if pairs:
        cv_out = pltpu.make_async_copy(
            vbuf, out_val_ref.at[pl.ds(srow, class_rows), :], sems.at[1]
        )
        cv_out.start()
        cv_out.wait()
    cp_out.wait()


@functools.lru_cache(maxsize=None)
def _ragged_sort_exe(rows: int, nb: int, class_rows: int, pairs: bool,
                     interpret: bool):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY) if pairs
        else pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES) if pairs else (1, LANES),
                             jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY) if pairs
        else pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _ragged_sort_kernel, class_rows=class_rows, pairs=pairs
    )
    aliases = {2: 0, 3: 1} if pairs else {2: 0}
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((class_rows, LANES), jnp.int32),
            pltpu.VMEM((class_rows if pairs else 1, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def f(starts, pads, keys, vals):
        return call(starts, pads, keys, vals)

    return jax.jit(f, donate_argnums=(2, 3) if pairs else (2,))


def ragged_sort(
    keys: jax.Array,
    vals: Optional[jax.Array],
    starts_row: jax.Array,   # (nb,) bucket start rows (each cap=class_rows)
    pad_elems: jax.Array,    # (nb,) meaningful elements at each bucket head
    class_rows: int,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Bitonic-sort ``nb`` buckets of exactly ``class_rows`` rows, in place
    (aliased input/output).  Elements beyond ``pad_elems`` are unwritten
    slack, masked to sentinels."""
    pairs = vals is not None
    exe = _ragged_sort_exe(
        keys.shape[0], starts_row.shape[0], class_rows, pairs, interpret
    )
    ok, ov = exe(
        starts_row.astype(jnp.int32), pad_elems.astype(jnp.int32),
        keys, vals if pairs else jnp.zeros((1,), jnp.int32),
    )
    return ok, (ov if pairs else None)


# =========================================================== compact

def _compact_kernel(
    start_ref, len_ref, key_ref, val_ref, out_key_ref, out_val_ref,
    kbuf, vbuf, carry, state, sems,
    *, chr_rows: int, pairs: bool
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        state[0] = 0   # out_row
        state[1] = 0   # phase
        carry[0, :] = jnp.full((LANES,), SENT_KEY, jnp.int32)
        if pairs:
            carry[1, :] = jnp.full((LANES,), SENT_VAL, jnp.int32)

    srow = start_ref[b]
    ln = len_ref[b]
    chunk_elems = np.int32(chr_rows * LANES)
    nch = lax.div(ln + chunk_elems - 1, chunk_elems)

    def chunk_body(c, _):
        out_row = state[0]
        phase = state[1]
        m = jnp.minimum(chunk_elems, ln - c * chunk_elems)
        # load chunk
        cp = pltpu.make_async_copy(
            key_ref.at[pl.ds(srow + c * chr_rows, chr_rows), :],
            kbuf.at[0], sems.at[0],
        )
        cp.start()
        if pairs:
            cv = pltpu.make_async_copy(
                val_ref.at[pl.ds(srow + c * chr_rows, chr_rows), :],
                vbuf.at[0], sems.at[1],
            )
            cv.start()
            cv.wait()
        cp.wait()

        def shifted(buf_row0, chunk):   # right-shift stream by phase
            cround = pltpu.roll(chunk, phase, axis=1)
            cdown = jnp.concatenate(
                [buf_row0.reshape(1, LANES), cround[: chr_rows - 1]], axis=0
            )
            lane = lax.broadcasted_iota(jnp.int32, cround.shape, 1)
            outr = jnp.where(lane >= phase, cround, cdown)
            last = jnp.where(
                lane[0:1] < phase, cround[chr_rows - 1 : chr_rows],
                SENT_KEY,
            )
            return outr, last

        outk, lastk = shifted(carry[0, :], kbuf[0])
        kbuf[1] = outk
        full = lax.shift_right_logical(phase + m, 7)
        # new carry = stream row `full` (ext = outk rows then last row);
        # dynamic row extract via masked row reduction (dynamic_slice on
        # values is not lowerable)
        ext = jnp.concatenate([outk, lastk], axis=0)
        rows_i = lax.broadcasted_iota(jnp.int32, ext.shape, 0)
        carry[0, :] = jnp.sum(
            jnp.where(rows_i == full, ext, 0), axis=0, dtype=jnp.int32
        )
        cpo = pltpu.make_async_copy(
            kbuf.at[1], out_key_ref.at[pl.ds(out_row, chr_rows), :],
            sems.at[0],
        )
        cpo.start()
        if pairs:
            outv, lastv = shifted(carry[1, :], vbuf[0])
            vbuf[1] = outv
            extv = jnp.concatenate([outv, lastv], axis=0)
            carry[1, :] = jnp.sum(
                jnp.where(rows_i == full, extv, 0), axis=0, dtype=jnp.int32
            )
            cvo = pltpu.make_async_copy(
                vbuf.at[1], out_val_ref.at[pl.ds(out_row, chr_rows), :],
                sems.at[1],
            )
            cvo.start()
            cvo.wait()
        cpo.wait()
        state[0] = out_row + full
        state[1] = (phase + m) & np.int32(LANES - 1)
        return 0

    lax.fori_loop(0, nch, chunk_body, 0)

    @pl.when(b == nb - 1)
    def _():
        out_row = state[0]
        lane = lax.broadcasted_iota(jnp.int32, (chr_rows, LANES), 1)
        row = lax.broadcasted_iota(jnp.int32, (chr_rows, LANES), 0)
        phase = state[1]
        flushk = jnp.where(
            (row == 0) & (lane < phase),
            jnp.broadcast_to(carry[0, :], (chr_rows, LANES)),
            SENT_KEY,
        )
        kbuf[1] = flushk
        cp = pltpu.make_async_copy(
            kbuf.at[1], out_key_ref.at[pl.ds(out_row, chr_rows), :],
            sems.at[0],
        )
        cp.start()
        if pairs:
            flushv = jnp.where(
                (row == 0) & (lane < phase),
                jnp.broadcast_to(carry[1, :], (chr_rows, LANES)),
                SENT_VAL,
            )
            vbuf[1] = flushv
            cv = pltpu.make_async_copy(
                vbuf.at[1], out_val_ref.at[pl.ds(out_row, chr_rows), :],
                sems.at[1],
            )
            cv.start()
            cv.wait()
        cp.wait()


@functools.lru_cache(maxsize=None)
def _compact_exe(rows: int, nseg: int, out_rows: int, chr_rows: int,
                 pairs: bool, interpret: bool):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY) if pairs
        else pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((out_rows if pairs else 1, LANES), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY) if pairs
        else pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _compact_kernel, chr_rows=chr_rows, pairs=pairs
    )
    call = pl.pallas_call(
        kernel,
        grid=(nseg,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, chr_rows, LANES), jnp.int32),   # kbuf in/out
            pltpu.VMEM((2 if pairs else 1, chr_rows, LANES), jnp.int32),
            pltpu.VMEM((2, LANES), jnp.int32),             # carry rows
            pltpu.SMEM((2,), jnp.int32),                   # out_row, phase
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )

    def f(starts, lens, keys, vals):
        return call(starts, lens, keys, vals)

    return jax.jit(f)


def compact(
    keys: jax.Array,
    vals: Optional[jax.Array],
    starts_row: jax.Array,   # (nb,) bucket start rows
    lens: jax.Array,         # (nb,) valid element counts
    out_rows: int,
    chr_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Concatenate the valid prefixes of all buckets densely (the inject
    splice).  out_rows must include chr_rows of slack."""
    pairs = vals is not None
    exe = _compact_exe(
        keys.shape[0], starts_row.shape[0], out_rows, chr_rows, pairs,
        interpret,
    )
    ok, ov = exe(
        starts_row.astype(jnp.int32), lens.astype(jnp.int32),
        keys, vals if pairs else jnp.zeros((1,), jnp.int32),
    )
    return ok, (ov if pairs else None)
