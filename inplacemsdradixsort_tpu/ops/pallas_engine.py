"""MSD sort engine: host-orchestrated recursion over the Pallas kernels.

The level structure mirrors the reference ``sort_thread`` pipeline
(/root/reference/src/msb_64.c:1477-2259) re-shaped for TPU:

  reference                         here
  ---------                        ----
  P4/P5 classify + block partition  tile_sort (bitonic tiles + range counts)
  P6-P8 combine/compact/balance     host: deterministic slot layout from the
                                    per-tile counts (replaces atomics/CAS)
  P9/P10 online/offline block swap  distribute (chunked dynamic DMA)
  P12 local radix sort              ragged_sort (in-VMEM bitonic buckets)
  P11 inject                        compact (dense splice of valid prefixes)

Skew is handled the way the reference's recursion handles it
(``schedule_passes``/``local_radixsort``): buckets that stay oversized are
split again on the next ``range_bits`` of the key; buckets that exhaust all
32 bits are all-equal and terminate (msb_64.c:1028 ``shift_bits == 0``).

Pairs mode sorts lexicographically by (key, rid); with rid = original index
that is exactly a stable sort.  Keys-only mode is exact for every input
including keys equal to 0xFFFFFFFF (sentinel-valued keys are accounted for by
host-side valid-count bookkeeping, never by in-kernel value tests).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SortConfig
from ..utils.timing import PhaseTimer
from . import pallas_kernels as pk
from .bitonic import bias_u32, unbias_u32

LANES = 128


@dataclasses.dataclass
class _Bucket:
    start_row: int          # row offset in the current arena
    cap_rows: int           # region size in rows (multiple of tile rows)
    valid: int              # true element count (non-sentinel)
    prefix: int             # key-range prefix (original uint32 domain)
    bits_left: int          # unsorted low bits
    kind: str               # 'split' | 'terminal' | 'done'
    slot_lens: np.ndarray   # element counts of its row-aligned slots


def _rows_per(lens: np.ndarray) -> np.ndarray:
    return (lens + LANES - 1) // LANES


def _row_valid(slot_lens: np.ndarray, cap_rows: int) -> np.ndarray:
    """Per-row valid-element counts of a bucket region."""
    lens = np.asarray(slot_lens, np.int64)
    rows = _rows_per(lens)
    starts = np.concatenate([[0], np.cumsum(rows)[:-1]]).astype(np.int64)
    used = int(rows.sum())
    rv = np.zeros(cap_rows, np.int32)
    rv[:used] = LANES
    rem = lens % LANES
    has_part = rem > 0
    last = (starts + rows - 1)[has_part]
    rv[last] = rem[has_part]
    return rv


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shape_class_rows(rows: int, tr: int) -> int:
    """Round arena row counts to a coarse class to bound recompilation."""
    rows = max(rows, tr)
    p = 1 << max(0, math.ceil(math.log2(rows)))
    if p // 2 >= rows:
        p //= 2
    if rows <= p // 4 * 3:
        p = p // 4 * 3
    return _round_up(p, tr)


def msd_sort(
    keys: jax.Array,
    rids: Optional[jax.Array],
    cfg: SortConfig,
    timer: Optional[PhaseTimer] = None,
    return_meta: bool = False,
):
    """Sort uint32 keys (and optional uint32 rids) on one chip.

    With ``return_meta``, also returns the output extents of 'done'
    buckets (all key bits equal; used by the u64 path to finish the low
    words, the ``shift_bits == 0`` recursion floor of msb_64.c:1028).
    """
    timer = timer or PhaseTimer(enabled=False)
    n = int(keys.shape[0])
    if n == 0:
        return (keys, rids, []) if return_meta else (keys, rids)
    pairs = rids is not None
    tr = cfg.tile_rows                     # tile rows
    t_elems = tr * LANES
    chr_rows = cfg.block_rows
    # largest in-VMEM sorted bucket: 8 tiles (2^18 elems at the default tile
    # size) keys-only; halved for pairs to fit the value buffers in VMEM
    vmax_rows = (8 if rids is None else 4) * tr
    rb_cfg = cfg.range_bits
    interp = cfg.interpret

    kb = bias_u32(jnp.asarray(keys))
    vb = (
        bias_u32(jnp.asarray(rids).astype(jnp.uint32)) if pairs else None
    )

    # ---------------- arena 0: one root bucket, sentinel padded
    data_rows = -(-n // LANES)
    root_cap = _round_up(data_rows + chr_rows, tr)
    if root_cap <= vmax_rows:
        root_cap = _terminal_cap(data_rows, chr_rows, tr, vmax_rows)
    arena_rows = _shape_class_rows(root_cap + vmax_rows + chr_rows, tr)
    pad = arena_rows * LANES - n
    kb = jnp.concatenate(
        [kb, jnp.full((pad,), pk.SENT_KEY, jnp.int32)]
    ).reshape(arena_rows, LANES)
    if pairs:
        vb = jnp.concatenate(
            [vb, jnp.full((pad,), pk.SENT_VAL, jnp.int32)]
        ).reshape(arena_rows, LANES)

    root_kind = "terminal" if root_cap <= vmax_rows else "split"
    buckets: List[_Bucket] = [
        _Bucket(
            start_row=0,
            cap_rows=root_cap,
            valid=n,
            prefix=0,
            bits_left=32,
            kind=root_kind,
            slot_lens=np.array([n], np.int64),
        )
    ]

    # ---------------- level loop
    # per-level fan-out is capped: every (tile, range) run costs one DMA
    # descriptor in the distribute kernel, so wide fan-outs are DMA-issue
    # bound while narrow ones add whole bitonic passes.  6 bits/level
    # balances the two on v5e; bits are spread evenly across the levels a
    # bucket still needs (the reference's 2/3-way pass splits,
    # msb_64.c:1367-1380).
    rb_dma_cap = min(rb_cfg, 6)

    def _split_bits(b: _Bucket) -> int:
        """Bits this level: land children near vmax/2 (the schedule_passes
        sizing rule, msb_64.c:1387-1395), evenly over remaining levels."""
        pad_rows = int(_rows_per(b.slot_lens).sum())
        need = max(1, math.ceil(math.log2(max(
            2.0, pad_rows / (vmax_rows // 2)
        ))))
        need = min(need, b.bits_left)
        levels = math.ceil(need / rb_dma_cap)
        return min(rb_cfg, b.bits_left, math.ceil(need / levels))

    while any(b.kind == "split" for b in buckets):
        r = 1 << rb_cfg                     # table width (fixed per config)
        ntiles = arena_rows // tr

        # --- host: per-tile bounds + valid/data counts
        bounds = np.zeros((ntiles, r), np.uint32)
        tile_valid = np.zeros(ntiles, np.int64)
        tile_data = np.zeros(ntiles, np.int64)
        for b in buckets:
            t0 = b.start_row // tr
            nt = b.cap_rows // tr
            rv = _row_valid(b.slot_lens, b.cap_rows)
            tile_valid[t0 : t0 + nt] = rv.reshape(nt, tr).sum(1)
            used = int(_rows_per(b.slot_lens).sum()) * LANES
            tile_data[t0 : t0 + nt] = np.clip(
                used - np.arange(nt) * (tr * LANES), 0, tr * LANES
            )
            if b.kind == "split":
                rbl = _split_bits(b)
                shift = b.bits_left - rbl
                d = np.arange(1, (1 << rbl) + 1, dtype=np.uint64)
                bb = np.uint64(b.prefix) + (d << np.uint64(shift)) - 1
                bounds[t0 : t0 + nt, : (1 << rbl)] = bb.astype(np.uint32)
        bounds_biased = jnp.asarray(
            (bounds ^ np.uint32(0x80000000)).view(np.int32)
        )

        # --- device: tile sort + range counts
        with timer.phase("part_blocks"):
            kb, vb, cnt = pk.tile_sort(
                kb, vb, bounds_biased, jnp.asarray(tile_data, jnp.int32),
                tr, interpret=interp,
            )
            timer.sync(cnt)
        cnt_np = np.asarray(jax.device_get(cnt)).astype(np.int64)

        # --- host: child layout (the combine/compact/balance analog)
        with timer.phase("combine"):
            slot_rows = np.zeros((ntiles, r), np.int64)
            run_starts = np.zeros((ntiles, r), np.int64)
            run_lens = np.zeros((ntiles, r), np.int64)
            new_buckets: List[_Bucket] = []
            cursor = 0  # output rows allocated so far

            for b in buckets:
                t0 = b.start_row // tr
                nt = b.cap_rows // tr
                tv = tile_valid[t0 : t0 + nt]
                if b.kind == "split":
                    rbl = _split_bits(b)
                    nr = 1 << rbl
                    c = cnt_np[t0 : t0 + nt, :nr].copy()
                    c[:, nr - 1] = tv               # host-exact last column
                    hist = np.diff(
                        np.concatenate(
                            [np.zeros((nt, 1), np.int64), c], axis=1
                        ),
                        axis=1,
                    )
                    hist = np.maximum(hist, 0)
                    starts_in_tile = np.concatenate(
                        [np.zeros((nt, 1), np.int64), c[:, :-1]], axis=1
                    )
                    srows = _rows_per(hist)
                    within = np.cumsum(srows, axis=0) - srows
                    for d in range(nr):
                        valid_d = int(hist[:, d].sum())
                        if valid_d == 0:
                            continue
                        pad_rows = int(srows[:, d].sum())
                        kind, cap = _child_kind_cap(
                            pad_rows, chr_rows, tr, vmax_rows,
                            b.bits_left - rbl,
                        )
                        slot_rows[t0 : t0 + nt, d] = cursor + within[:, d]
                        run_starts[t0 : t0 + nt, d] = starts_in_tile[:, d]
                        run_lens[t0 : t0 + nt, d] = hist[:, d]
                        new_buckets.append(_Bucket(
                            start_row=cursor,
                            cap_rows=cap,
                            valid=valid_d,
                            prefix=int(
                                (np.uint64(b.prefix)
                                 + (np.uint64(d)
                                    << np.uint64(b.bits_left - rbl)))
                            ),
                            bits_left=b.bits_left - rbl,
                            kind=kind,
                            slot_lens=hist[:, d].copy(),
                        ))
                        cursor += cap
                else:
                    # forward: repack the bucket (one run per tile)
                    pad_rows = int(_rows_per(tv).sum())
                    kind, cap = _child_kind_cap(
                        pad_rows, chr_rows, tr, vmax_rows, b.bits_left
                    )
                    if b.kind == "done":
                        kind = "done" if kind == "split" else kind
                    srows = _rows_per(tv)
                    within = np.cumsum(srows) - srows
                    slot_rows[t0 : t0 + nt, 0] = cursor + within
                    run_starts[t0 : t0 + nt, 0] = 0
                    run_lens[t0 : t0 + nt, 0] = tv
                    new_buckets.append(_Bucket(
                        start_row=cursor, cap_rows=cap, valid=b.valid,
                        prefix=b.prefix, bits_left=b.bits_left, kind=kind,
                        slot_lens=tv.copy(),
                    ))
                    cursor += cap

            out_rows = _shape_class_rows(
                cursor + vmax_rows + chr_rows, tr
            )

        # --- device: distribute runs to slots
        with timer.phase("swap_online"):
            kb, vb = pk.distribute(
                kb, vb,
                jnp.asarray(slot_rows, jnp.int32),
                jnp.asarray(run_starts, jnp.int32),
                jnp.asarray(run_lens, jnp.int32),
                out_rows, tr, chr_rows, interpret=interp,
            )
            timer.sync(kb)
        buckets = new_buckets
        arena_rows = out_rows

    # ---------------- terminal: batched in-VMEM sorts per size class
    with timer.phase("local_sort"):
        classes = {}
        for b in buckets:
            if b.kind == "terminal":
                classes.setdefault(b.cap_rows, []).append(b)
        slack_start = max(
            (b.start_row + b.cap_rows for b in buckets), default=0
        )
        for crows, bs in sorted(classes.items()):
            starts = np.array([b.start_row for b in bs], np.int64)
            pads = np.array(
                [int(_rows_per(b.slot_lens).sum()) * LANES for b in bs],
                np.int64,
            )
            nb = 1 << max(0, math.ceil(math.log2(len(starts))))
            if nb > len(starts):  # pad grid with slack-region dummies
                starts = np.concatenate([
                    starts,
                    np.full(nb - len(starts), slack_start, np.int64),
                ])
                pads = np.concatenate(
                    [pads, np.zeros(nb - len(pads), np.int64)]
                )
            kb, vb = pk.ragged_sort(
                kb, vb, jnp.asarray(starts, jnp.int32),
                jnp.asarray(pads, jnp.int32), crows, interpret=interp,
            )
            for b in bs:
                b.slot_lens = np.array([b.valid], np.int64)  # dense now
        timer.sync(kb)

    # ---------------- compact the valid prefixes in bucket order
    with timer.phase("inject"):
        seg_starts, seg_lens = [], []
        done_segs = []          # (output offset, length) of 'done' buckets
        out_off = 0
        for b in buckets:
            if b.kind == "terminal":
                seg_starts.append(b.start_row)
                seg_lens.append(b.valid)
            else:  # 'done' (all-equal, oversized): one segment per slot
                done_segs.append((out_off, b.valid))
                rows = _rows_per(b.slot_lens)
                offs = b.start_row + np.cumsum(rows) - rows
                for o, ln in zip(offs, b.slot_lens):
                    if ln > 0:
                        seg_starts.append(int(o))
                        seg_lens.append(int(ln))
            out_off += b.valid
        if len(seg_starts) == 1 and seg_starts[0] == 0:
            out_k, out_v = kb, vb            # already dense at row 0
        else:
            cchr = 4 * chr_rows              # compact DMAs serialize; go big
            out_rows = -(-n // LANES) + cchr + 1
            out_k, out_v = pk.compact(
                kb, vb,
                jnp.asarray(np.array(seg_starts), jnp.int32),
                jnp.asarray(np.array(seg_lens), jnp.int32),
                out_rows, cchr, interpret=interp,
            )
        timer.sync(out_k)

    final_k = unbias_u32(out_k.reshape(-1)[:n])
    final_v = unbias_u32(out_v.reshape(-1)[:n]) if pairs else None
    if return_meta:
        return final_k, final_v, done_segs
    return final_k, final_v


def msd_sort_u64(
    keys_u64_hi: jax.Array,
    keys_u64_lo: jax.Array,
    cfg: SortConfig,
    timer: Optional[PhaseTimer] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sort uint64 keys given as (hi, lo) uint32 words, on one chip.

    The engine's (key, val) lexicographic comparator sorts (hi, lo) pairs
    directly; oversized all-equal-hi buckets (bits exhausted in the high
    word) get their low words finished by a recursive keys-only pass —
    the reference's native uint64 capability (msb_64.h:37) without 64-bit
    vector arithmetic on the chip.
    """
    n = keys_u64_hi.shape[0]
    # the all-ones u64 key coincides with the sentinel pair; count and
    # re-append (it is the maximum, so the tail positions are its home)
    maxu = np.uint32(0xFFFFFFFF)
    nmax = int(jnp.sum(
        (keys_u64_hi == maxu) & (keys_u64_lo == maxu), dtype=jnp.int32
    ))
    hi, lo, done = msd_sort(
        keys_u64_hi, keys_u64_lo, cfg, timer=timer, return_meta=True
    )
    for off, ln in done:
        seg_sorted, _ = msd_sort(
            jax.lax.dynamic_slice_in_dim(lo, off, ln), None, cfg
        )
        lo = jax.lax.dynamic_update_slice_in_dim(lo, seg_sorted, off, 0)
    if nmax:
        idx = jnp.arange(n)
        hi = jnp.where(idx >= n - nmax, maxu, hi)
        lo = jnp.where(idx >= n - nmax, maxu, lo)
    return hi, lo


def sort_vmem(keys: jax.Array, tile_rows: int = 256,
              interpret: Optional[bool] = None) -> jax.Array:
    """Fully-jittable single-kernel sort for VMEM-sized inputs.

    The in-cache fast path (reference ``partition_ip``/``insertsort`` tier):
    pad to a power-of-two tile class, one ragged_sort launch, slice.  Used
    as the compile-check entry point and by callers that want a traceable
    sort without the host-orchestrated MSD recursion.
    """
    if interpret is None:  # pallas compiles on TPU only
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    n = keys.shape[0]
    kb = bias_u32(keys)
    rows = max(tile_rows, -(-n // LANES))
    cap = 1 << math.ceil(math.log2(rows))
    kb = jnp.concatenate(
        [kb, jnp.full((cap * LANES - n,), pk.SENT_KEY, jnp.int32)]
    ).reshape(cap, LANES)
    ok, _ = pk.ragged_sort(
        kb, None,
        jnp.zeros((1,), jnp.int32),
        jnp.full((1,), n, jnp.int32),
        cap,
        interpret=interpret,
    )
    return unbias_u32(ok.reshape(-1)[:n])


def _terminal_cap(pad_rows: int, chr_rows: int, tr: int,
                  vmax_rows: int) -> int:
    need = pad_rows + chr_rows
    cap = tr
    while cap < need:
        cap *= 2
    return cap


def _child_kind_cap(
    pad_rows: int, chr_rows: int, tr: int, vmax_rows: int, bits_left: int
) -> Tuple[str, int]:
    if pad_rows + chr_rows <= vmax_rows:
        return "terminal", _terminal_cap(pad_rows, chr_rows, tr, vmax_rows)
    if bits_left <= 0:
        return "done", _round_up(pad_rows + chr_rows, tr)
    return "split", _round_up(pad_rows + chr_rows, tr)
