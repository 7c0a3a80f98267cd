"""Distributed range-partitioned sort over a device mesh.

This is the TPU-native re-creation of the reference's cross-NUMA pipeline
(/root/reference/src/msb_64.c): sample (P1-P3), range partition + block
exchange (P4-P11), local sort (P12) — with the shared-memory machinery
replaced by SPMD collectives:

  reference (NUMA × threads)          here (mesh of chips)
  --------------------------          --------------------
  sample + parallel sample sort       per-shard sample -> all_gather ->
    (partition_keys :1037-1142)         replicated jnp.sort
  splitters + numa_dest (:1545-1613)  equal-depth shard bounds from the
                                        sorted sample (splitters module)
  block exchange via atomics +        exact count-sized all_to_all: the
    remote memcpy (:1672-2158)          (src, dst) count matrix is
                                        computed and fetched first, so
                                        buffers are allocated to the
                                        exact class — no fudge, no
                                        overflow, no retry
  20 pthread barriers                 implicit XLA program order
  two-level NUMA x threads topology   two-level hosts x chips mesh: all
    (schedule_threads :206-237)         collectives run over the combined
                                        (host, chip) axes so XLA routes
                                        DCN across hosts and ICI inside
  local MSD radix sort (P12)          the v4 engine under shard_map: one
                                        shared static geometry, per-shard
                                        bound tables planned ON DEVICE
                                        (engine_v4._plan_tables_dev) — no
                                        host fetch, fully SPMD

Output: per-shard sorted runs in shard order (shard i holds keys <= shard
i+1's), the reference's per-NUMA-node output contract (msb_64.h:37).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DEFAULT_CONFIG, SortConfig
from ..ops import splitters as sp
from ..utils.timing import PhaseTimer

SENT32 = np.uint32(0xFFFFFFFF)
LANES = 128


class DSortResult(NamedTuple):
    keys: jax.Array        # (S, cap) sharded; row i = shard i's sorted run
    rids: Optional[jax.Array]
    counts: jax.Array      # (S,) valid elements per shard
    overflow: jax.Array    # () bool — kept for API compat; always False
    times: list


def _axes(mesh: Mesh):
    """Collective axis spec: the combined tuple of all mesh axes — XLA
    lowers the collective hierarchically (ICI inside a host axis, DCN
    across), the two-level NUMAxthread analog (msb_64.c:206-237)."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def _my_shard(mesh: Mesh):
    """Combined shard index in axis-major order (matches all_gather's
    stacking order over the axis tuple)."""
    names = tuple(mesh.axis_names)
    idx = lax.axis_index(names[0])
    for a in names[1:]:
        idx = idx * mesh.shape[a] + lax.axis_index(a)
    return idx


def _data_spec(mesh: Mesh):
    return P(tuple(mesh.axis_names))


def _sample_bounds(keys, mesh, num_shards: int, sample_per_shard: int,
                   seed):
    """P1-P3: per-shard sample -> all_gather -> replicated sort ->
    equal-depth, duplicate-aware shard boundary splitters.  Also
    returns the sorted global sample itself: the overlapped path plans
    each shard's LOCAL bounds from its window of it (_window_stats)."""
    axis = _axes(mesh)
    me = _my_shard(mesh)
    k = jax.random.fold_in(jax.random.key(seed), me)
    idx = jax.random.randint(
        k, (sample_per_shard,), 0, keys.shape[0], dtype=jnp.int32
    )
    local = jnp.take(keys, idx)
    sample = lax.all_gather(local, axis).reshape(-1)
    sample = jnp.sort(sample)
    return sp.extract_delimiters(sample, num_shards - 1), sample


def _count_matrix(keys, bounds, mesh):
    """The (src, dst) segment-size matrix, known on every shard — the
    histogram exchange that replaces atomic block claiming
    (msb_64.c:2027,2056)."""
    num_shards = bounds.shape[0] + 1
    dest = jnp.searchsorted(bounds, keys, side="left").astype(jnp.int32)
    send_counts = jnp.sum(
        dest[:, None] == jnp.arange(num_shards)[None, :], axis=0,
        dtype=jnp.int32,
    )
    return lax.all_gather(send_counts, _axes(mesh))       # (S, S)


def _exchange(keys, rids, bounds, send_cap: int, recv_cap: int, mesh,
              ragged_caps=None):
    """P4-P11: classify, group, exchange, compact received segments.

    With ``ragged_caps`` (a per-round static cap tuple from the fetched
    count matrix): segment-packed round-robin exchange — round r moves
    every shard's segment for destination (me+r) % S via ``ppermute``,
    padded only to THAT round's worst segment, and lands it at its
    exact receiver offset (read-modify-write).  Wire bytes = sum of
    per-round caps ~= the exact segment bytes under skew, vs the dense
    path's S x max-segment padding (the reference's block exchange
    without its 4096-tuple padding, msb_64.c:1672-2158).  ppermute
    rides ICI neighbor links; XLA:CPU supports it, so the same path is
    testable on the virtual mesh (the native ragged-all-to-all HLO is
    TPU-only in this toolchain).

    ``ragged_caps=None`` keeps the dense exact-cap all_to_all fallback.
    ``send_cap``/``recv_cap`` are exact upper bounds fetched from the
    count matrix — no overflow is possible on either path."""
    axis = _axes(mesh)
    num_shards = bounds.shape[0] + 1
    n_local = keys.shape[0]
    dest = jnp.searchsorted(bounds, keys, side="left").astype(jnp.int32)

    # deterministic send layout: group local keys by destination
    if rids is None:
        _, sorted_keys = lax.sort((dest, keys), num_keys=1,
                                  is_stable=True)
        sorted_rids = None
    else:
        _, sorted_keys, sorted_rids = lax.sort(
            (dest, keys, rids), num_keys=1, is_stable=True
        )
    send_counts = jnp.sum(
        dest[:, None] == jnp.arange(num_shards)[None, :], axis=0,
        dtype=jnp.int32,
    )
    send_starts = jnp.cumsum(send_counts) - send_counts
    all_counts = lax.all_gather(send_counts, axis)        # (S, S)
    me = _my_shard(mesh)
    recv_counts = all_counts[:, me]                       # (S,)
    total_recv = jnp.sum(recv_counts)

    if ragged_caps is not None:
        S = num_shards
        cap_max = max(max(ragged_caps), 1)
        recv_starts = jnp.cumsum(recv_counts) - recv_counts

        def ship(x, fill):
            fillv = jnp.asarray(fill, x.dtype)
            src_pad = jnp.concatenate(
                [x, jnp.full((cap_max,), fillv, x.dtype)])
            out_pad = jnp.full((recv_cap + cap_max,), fillv, x.dtype)
            for r in range(S):
                cap_r = int(ragged_caps[r])
                if cap_r == 0:
                    continue
                dst = lax.rem(me + r, S)
                src_sh = lax.rem(me - r + S, S)
                seg = lax.dynamic_slice(
                    src_pad, (jnp.take(send_starts, dst),), (cap_r,))
                if r:
                    perm = [(i, (i + r) % S) for i in range(S)]
                    seg = lax.ppermute(seg, axis, perm)
                cnt_f = jnp.take(recv_counts, src_sh)
                rs = jnp.take(recv_starts, src_sh)
                cur = lax.dynamic_slice(out_pad, (rs,), (cap_r,))
                j = jnp.arange(cap_r)
                out_pad = lax.dynamic_update_slice(
                    out_pad, jnp.where(j < cnt_f, seg, cur), (rs,))
            return out_pad[:recv_cap]

        rk = ship(sorted_keys, SENT32)
        rr = None
        if rids is not None:
            rr = ship(sorted_rids, SENT32)
        return rk, rr, total_recv

    def pack(x, fill):
        j = jnp.arange(send_cap)[None, :]
        idx = jnp.clip(send_starts[:, None] + j, 0, n_local - 1)
        seg = jnp.take(x, idx)                            # (S, send_cap)
        return jnp.where(j < send_counts[:, None], seg, fill)

    sendbuf = pack(sorted_keys, jnp.asarray(SENT32, keys.dtype))
    recvbuf = lax.all_to_all(
        sendbuf, axis, split_axis=0, concat_axis=0, tiled=False
    )
    if rids is not None:
        recv_rids = lax.all_to_all(
            pack(sorted_rids, jnp.asarray(SENT32, rids.dtype)),
            axis, split_axis=0, concat_axis=0, tiled=False,
        )

    # compact: received segment s lands at [recv_starts[s], +counts[s])
    recv_starts = jnp.cumsum(recv_counts) - recv_counts
    out_idx = jnp.arange(recv_cap)
    src = jnp.searchsorted(
        jnp.cumsum(recv_counts), out_idx, side="right"
    ).astype(jnp.int32)
    src = jnp.clip(src, 0, num_shards - 1)
    pos = out_idx - jnp.take(recv_starts, src)
    valid = out_idx < total_recv
    flat = src * send_cap + jnp.clip(pos, 0, send_cap - 1)
    rk = jnp.where(
        valid, jnp.take(recvbuf.reshape(-1), flat),
        jnp.asarray(SENT32, keys.dtype),
    )
    rr = None
    if rids is not None:
        rr = jnp.where(
            valid, jnp.take(recv_rids.reshape(-1), flat),
            jnp.asarray(SENT32, rids.dtype),
        )
    return rk, rr, total_recv


def _window_stats(sample, bounds, me, nbq):
    """Quantile stats for MY shard's window of the replicated sorted
    global sample — the overlapped path's replacement for re-sampling
    the received keys: shard d's post-exchange keys lie in
    (bounds[d-1], bounds[d]], and the global sample restricted to that
    range IS a sample of them.  Output matches the
    engine_v4._sample_stats contract: rows (picks_i32, left, right),
    plus the traced window size for the planner's thresholds."""
    total = sample.shape[0]
    num_shards = bounds.shape[0] + 1
    lo = jnp.where(
        me == 0, 0,
        jnp.searchsorted(
            sample, jnp.take(bounds, jnp.maximum(me - 1, 0)),
            side="right").astype(jnp.int32))
    hi = jnp.where(
        me == num_shards - 1, total,
        jnp.searchsorted(
            sample, jnp.take(bounds, jnp.minimum(me, num_shards - 2)),
            side="right").astype(jnp.int32))
    W = jnp.maximum(hi - lo, 0)
    pad = jnp.full((total,), SENT32, sample.dtype)
    win = lax.dynamic_slice(
        jnp.concatenate([sample, pad]), (lo,), (total,))
    win = jnp.where(jnp.arange(total) < W, win, SENT32)
    # pos = (i+1)*W // nbq - 1 without int32 overflow (i*W can pass
    # 2^31 at full sample size): split W into quotient/remainder by nbq
    i1 = jnp.arange(1, nbq + 1, dtype=jnp.int32)
    pos = jnp.clip(
        i1 * (W // nbq) + (i1 * (W % nbq)) // nbq - 1,
        0, jnp.maximum(W - 1, 0)).astype(jnp.int32)
    picks = jnp.take(win, pos)
    picks = picks.at[-1].set(jnp.uint32(0xFFFFFFFF))
    left = jnp.minimum(
        jnp.searchsorted(win, picks, side="left").astype(jnp.int32), W)
    right = jnp.minimum(
        jnp.searchsorted(win, picks, side="right").astype(jnp.int32), W)
    picks_i = jax.lax.bitcast_convert_type(picks, jnp.int32)
    return jnp.stack([picks_i, left, right]), W


def _exchange_overlap(keys, rids, bounds, sample, recv_cap, mesh,
                      ragged_caps, g, cfg):
    """Ragged exchange with the local L1 histogram accumulated PER
    ROUND: as each ppermute segment lands, its exact (tile, range)
    contribution is added while the next round's collective is in
    flight (SURVEY §2.6 item 4 / §5.8 — exchange overlapped with local
    partition work; the reference interleaves its block exchange with
    local passes via work stealing, msb_64.c:1672-2158).  The bound
    tables come from the pre-exchange global sample (_window_stats), so
    NOTHING about the local plan waits for the exchange; the L1 sweep
    of the local sort is fully absorbed here.

    Returns (recv_keys, recv_rids|None, tb, hist1, total_recv)."""
    from ..ops import engine_v4 as e4

    axis = _axes(mesh)
    S = bounds.shape[0] + 1
    me = _my_shard(mesh)
    n_local = keys.shape[0]
    pairs = rids is not None

    stats, W = _window_stats(sample, bounds, me, g.nbq)
    tb = e4._tables_from_stats(stats, g, S_dyn=W)

    dest = jnp.searchsorted(bounds, keys, side="left").astype(jnp.int32)
    if pairs:
        _, sorted_keys, sorted_rids = lax.sort(
            (dest, keys, rids), num_keys=1, is_stable=True)
    else:
        _, sorted_keys = lax.sort((dest, keys), num_keys=1,
                                  is_stable=True)
        sorted_rids = None
    send_counts = jnp.sum(
        dest[:, None] == jnp.arange(S)[None, :], axis=0,
        dtype=jnp.int32)
    send_starts = jnp.cumsum(send_counts) - send_counts
    all_counts = lax.all_gather(send_counts, axis)
    recv_counts = all_counts[:, me]
    recv_starts = jnp.cumsum(recv_counts) - recv_counts
    total_recv = jnp.sum(recv_counts)

    cap_max = max(max(ragged_caps), 1)
    TE = g.pitch * LANES
    rmax = g.rmax
    l1b = tb["l1_bounds"]                     # biased i32 ascending
    BIAS_I = e4.BIAS_I

    def pad_src(x):
        return jnp.concatenate(
            [x, jnp.full((cap_max,), SENT32, x.dtype)])

    src_k = pad_src(sorted_keys)
    src_r = pad_src(sorted_rids) if pairs else None
    out_k = jnp.full((recv_cap + cap_max,), SENT32, keys.dtype)
    out_r = (jnp.full((recv_cap + cap_max,), SENT32, rids.dtype)
             if pairs else None)
    hist = jnp.zeros((g.ntiles1 * rmax,), jnp.int32)

    for r in range(S):
        cap_r = int(ragged_caps[r])
        if cap_r == 0:
            continue
        dst = lax.rem(me + r, S)
        src_sh = lax.rem(me - r + S, S)
        st = jnp.take(send_starts, dst)
        seg_k = lax.dynamic_slice(src_k, (st,), (cap_r,))
        seg_r = (lax.dynamic_slice(src_r, (st,), (cap_r,))
                 if pairs else None)
        if r:
            perm = [(i, (i + r) % S) for i in range(S)]
            seg_k = lax.ppermute(seg_k, axis, perm)
            if pairs:
                seg_r = lax.ppermute(seg_r, axis, perm)
        cnt_f = jnp.take(recv_counts, src_sh)
        rs = jnp.take(recv_starts, src_sh)
        j = jnp.arange(cap_r)
        live = j < cnt_f
        cur = lax.dynamic_slice(out_k, (rs,), (cap_r,))
        out_k = lax.dynamic_update_slice(
            out_k, jnp.where(live, seg_k, cur), (rs,))
        if pairs:
            cur_r = lax.dynamic_slice(out_r, (rs,), (cap_r,))
            out_r = lax.dynamic_update_slice(
                out_r, jnp.where(live, seg_r, cur_r), (rs,))
        # exact (tile, range) contribution of this landed segment —
        # overlaps the next round's ppermute
        kb = jax.lax.bitcast_convert_type(seg_k, jnp.int32) ^ BIAS_I
        rid_of = jnp.sum(
            (kb[:, None] > l1b[None, :]).astype(jnp.int32), axis=1)
        rid_of = jnp.minimum(rid_of, rmax - 1)
        tile = (rs + j) // TE
        hist = hist.at[tile * rmax + rid_of].add(
            live.astype(jnp.int32))

    # the SENT slack past total_recv stays OUT of the local sort: the
    # pipeline gets a DYNAMIC tile meta covering exactly total_recv
    # elements (pads would otherwise overflow a terminal bucket — the
    # global sample never sees them), so hist needs no pad correction
    return (out_k[:recv_cap], out_r[:recv_cap] if pairs else None,
            tb, hist.reshape(g.ntiles1, rmax), total_recv)


def _build_overlap_step(mesh: Mesh, cfg: SortConfig, pairs: bool,
                        recv_cap: int, ragged_caps, depth: int):
    """ONE fused SPMD program: ragged exchange + per-round L1 hist +
    the full v4 local pipeline with the hist injected — 1 dispatch
    where the baseline path uses 2 (exchange, local), and the local
    sort runs no sample pass and no L1 sweep at all."""
    from ..ops import engine_v4 as e4

    nplanes = 2 if pairs else 1
    data_spec = _data_spec(mesh)
    rid_spec = data_spec if pairs else P()
    cfg_d = dataclasses.replace(
        cfg, v3_rmax=cfg.v3_rmax or (8 if cfg.interpret else 32))
    g = e4._dev_geometry(recv_cap, nplanes, cfg_d, 2.0 ** depth)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(data_spec, rid_spec, P(None), P(None)),
        out_specs=(data_spec, rid_spec if pairs else P(None), P(None),
                   data_spec),
        check_vma=False,
    )
    def step(keys, rids, bounds, sample):
        rk, rr, tb, hist1, total = _exchange_overlap(
            keys, rids if pairs else None, bounds, sample, recv_cap,
            mesh, ragged_caps, g, cfg)
        # DYNAMIC tile meta: tiles cover exactly the total_recv real
        # elements, so the receive buffer's SENT slack never enters the
        # sort (it would overflow a terminal bucket: the global sample
        # cannot plan for it)
        TE = g.pitch * LANES
        tidx = jnp.arange(g.ntiles1, dtype=jnp.int32)
        nel = jnp.clip(total - tidx * TE, 0, TE)
        meta = jnp.concatenate([
            jnp.stack([jnp.zeros_like(tidx), tidx * g.pitch, nel],
                      axis=1).reshape(-1),
            jnp.zeros((3,), jnp.int32),
        ])
        tb["l1_meta"] = meta
        tb["hist1"] = hist1
        planes = (rk,) + ((rr,) if pairs else ())
        final, over, _ = e4._pipeline_core(
            planes, tb, n=g.n, nplanes=g.nplanes, nlex=nplanes - 1,
            rmax=g.rmax, pitch=g.pitch, cap_rows=g.cap_rows,
            ntiles1=g.ntiles1, t2max=g.t2max,
            arena1_rows=g.arena1_rows, arena2_rows=g.arena2_rows,
            out_rows=g.out_rows, two_level=g.two_level,
            interpret=cfg.interpret, nclasses=cfg.term_classes,
        )
        over = lax.pmax(over, _axes(mesh))
        if not pairs:
            return (final[0], jnp.zeros((1,), jnp.uint32),
                    over.reshape(1), total.reshape(1))
        return final[0], final[1], over.reshape(1), total.reshape(1)

    return jax.jit(step)


def _build_steps(mesh: Mesh, cfg: SortConfig, n_local: int, pairs: bool,
                 send_cap: int, recv_cap: int, sample_per_shard: int,
                 seed: int, ragged_caps=None):
    S = mesh.devices.size
    data_spec = _data_spec(mesh)
    rid_spec = data_spec if pairs else P()

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(data_spec,),
        out_specs=(P(None), P(None)), check_vma=False,
    )
    def plan(keys):
        return _sample_bounds(keys, mesh, S, sample_per_shard, seed)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(data_spec, P(None)),
        out_specs=P(None), check_vma=False,
    )
    def counts(keys, bounds):
        return _count_matrix(keys, bounds, mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(data_spec, rid_spec, P(None)),
        out_specs=(data_spec, rid_spec if pairs else P(None), data_spec),
        check_vma=False,
    )
    def exchange(keys, rids, bounds):
        rk, rr, total = _exchange(
            keys, rids if pairs else None, bounds, send_cap, recv_cap,
            mesh, ragged_caps=ragged_caps,
        )
        if rr is None:
            rr = jnp.zeros((1,), jnp.uint32)
        return rk, rr, total.reshape(1)

    return jax.jit(plan), jax.jit(counts), jax.jit(exchange)


def _shape_cap(x: int) -> int:
    """Round a buffer size up to a coarse class (1/8th steps of the next
    power of two) to bound program re-specialization across runs."""
    if x <= LANES:
        return LANES
    p = 1 << (int(x - 1).bit_length())
    step = max(p // 8, LANES)
    return -(-x // step) * step


# ---------------------------------------------------------------- local

def _local_sort_v4(rk, rr, mesh, cfg: SortConfig, recv_cap: int,
                   pairs: bool, timer: PhaseTimer):
    """P12 with the production engine, fully SPMD: every shard plans its
    OWN bound tables on device (engine_v4._plan_tables_dev) inside one
    shard_mapped program — identical static geometry across shards by
    construction, no host stats fetch, no cross-shard shape pinning."""
    from ..ops import engine_v4 as e4

    nplanes = 2 if pairs else 1
    data_spec = _data_spec(mesh)
    rid_spec = data_spec if pairs else P()
    cfg_d = dataclasses.replace(
        cfg, v3_rmax=cfg.v3_rmax or (8 if cfg.interpret else 32)
    )

    for depth in range(3):
        g = e4._dev_geometry(recv_cap, nplanes, cfg_d, 2.0 ** depth)
        meta = jnp.asarray(e4._l1_meta_np(g))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(data_spec, rid_spec),
            out_specs=(data_spec, rid_spec if pairs else P(None),
                       P(None)),
            check_vma=False,
        )
        def local(keys, rids):
            planes = (keys,) + ((rids,) if pairs else ())
            tb = e4._plan_tables_dev(planes[0], g, depth)
            tb["l1_meta"] = meta
            final, over, _ = e4._pipeline_core(
                planes, tb, n=g.n, nplanes=g.nplanes,
                nlex=nplanes - 1, rmax=g.rmax, pitch=g.pitch,
                cap_rows=g.cap_rows, ntiles1=g.ntiles1, t2max=g.t2max,
                arena1_rows=g.arena1_rows, arena2_rows=g.arena2_rows,
                out_rows=g.out_rows, two_level=g.two_level,
                interpret=cfg.interpret, nclasses=cfg.term_classes,
            )
            over = lax.pmax(over, _axes(mesh))
            if not pairs:
                return final[0], jnp.zeros((1,), jnp.uint32), \
                    over.reshape(1)
            return final[0], final[1], over.reshape(1)

        sk, sr, over = jax.jit(local)(rk, rr)
        if not int(jax.device_get(over)[0]):
            return sk, sr
        # terminal capacity overflow on some shard: retry with a finer
        # bucket topology and a fresh sample (salt=depth)

    # engine could not fit the topology — XLA local sort fallback
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(data_spec, rid_spec),
        out_specs=(data_spec, rid_spec if pairs else P(None)),
        check_vma=False,
    )
    def local_xla(keys, rids):
        if pairs:
            k, r = lax.sort((keys, rids), num_keys=2, is_stable=True)
            return k, r
        return jnp.sort(keys), jnp.zeros((1,), jnp.uint32)

    return jax.jit(local_xla)(rk, rr)


def distributed_sort(
    keys: jax.Array,
    rids: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    config: SortConfig = DEFAULT_CONFIG,
    timing: bool = False,
    seed: int = 0,
    local_engine: str = "auto",
) -> DSortResult:
    """Sort ``keys`` (globally) across the mesh.

    keys: (N,) uint32, N divisible by the shard count (pad with 0xFF..
    sentinels otherwise; they sort to the last shard's tail).  The mesh
    may be 1-D (chips) or 2-D (hosts, chips); collectives run over the
    combined axes.  Returns per-shard sorted runs + valid counts (the
    reference's per-NUMA-node arrays + sizes, msb_64.h:37).

    local_engine: "v4" (production engine under shard_map), "xla", or
    "auto" (v4 when shards are large enough to profit).
    """
    from .mesh import make_sort_mesh
    if mesh is None:
        mesh = make_sort_mesh()
    S = mesh.devices.size
    n = keys.shape[0]
    assert n % S == 0, "pad N to a multiple of the shard count"
    n_local = n // S
    pairs = rids is not None
    timer = PhaseTimer(enabled=timing)

    sample_per_shard = max(
        1, min(int(config.sample_cap), int(config.sample_rate * n)) // S
    )

    keys = jax.device_put(keys, NamedSharding(mesh, _data_spec(mesh)))
    if pairs:
        rids = jax.device_put(rids, NamedSharding(mesh, _data_spec(mesh)))
    dummy = jnp.zeros((1,), jnp.uint32)

    # P1-P3 sample/splitters + the count matrix (one tiny fetch): exact
    # buffer classes for the exchange — no fudge, no overflow, no retry
    plan, counts, _ = _build_steps(
        mesh, config, n_local, pairs, 1, 1, sample_per_shard, seed,
    )
    with timer.phase("sample"):
        bounds, sample = plan(keys)
        cnt = np.asarray(jax.device_get(counts(keys, bounds)))
        send_cap = _shape_cap(int(cnt.max()))
        recv_cap = _shape_cap(int(cnt.sum(axis=0).max()))
        recv_cap = max(recv_cap, LANES)
        ragged_caps = None
        if config.ragged_exchange:
            # per-round exact caps: round r moves segment (i -> (i+r)%S)
            ragged_caps = tuple(
                _shape_cap(int(max(
                    cnt[i, (i + r) % S] for i in range(S)
                ))) if max(cnt[i, (i + r) % S] for i in range(S)) else 0
                for r in range(S)
            )

    # ---- overlapped path: ONE fused program = ragged exchange +
    # per-round L1 hist + v4 local pipeline (bounds from the global
    # sample; no post-exchange sampling, no separate L1 sweep).
    # 3 dispatches total (plan, counts, fused) vs the baseline's 4
    # (plan, counts, exchange, local[xN retries]).
    if (config.overlap_exchange and ragged_caps is not None
            and max(ragged_caps)):
        with timer.phase("balance"):
            for depth in range(3):
                step = _build_overlap_step(
                    mesh, config, pairs, recv_cap, ragged_caps, depth)
                sk, sr, over, totals = step(
                    keys, rids if pairs else dummy, bounds, sample)
                if not int(jax.device_get(over)[0]):
                    break
            else:
                sk = None       # capacity exhausted: sequential path
            timer.sync(sk if sk is not None else bounds)
        if sk is not None:
            return DSortResult(
                keys=sk.reshape(S, -1),
                rids=sr.reshape(S, -1) if pairs else None,
                counts=totals.reshape(S),
                overflow=jnp.zeros((), jnp.bool_),
                times=timer.report(),
            )

    _, _, exchange = _build_steps(
        mesh, config, n_local, pairs, send_cap, recv_cap,
        sample_per_shard, seed, ragged_caps,
    )
    with timer.phase("balance"):
        rk, rr, totals = exchange(keys, rids if pairs else dummy, bounds)
        timer.sync(rk)

    with timer.phase("local_sort"):
        use_v4 = local_engine == "v4" or (
            local_engine == "auto"
            and (recv_cap >= (1 << 16) or config.interpret)
        )
        if use_v4:
            sk, sr = _local_sort_v4(
                rk, rr if pairs else dummy, mesh, config, recv_cap,
                pairs, timer,
            )
        else:
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(_data_spec(mesh),
                          _data_spec(mesh) if pairs else P()),
                out_specs=(_data_spec(mesh),
                           _data_spec(mesh) if pairs else P(None)),
                check_vma=False,
            )
            def local_xla(k, r):
                if pairs:
                    a, b = lax.sort((k, r), num_keys=2, is_stable=True)
                    return a, b
                return jnp.sort(k), jnp.zeros((1,), jnp.uint32)

            sk, sr = jax.jit(local_xla)(rk, rr if pairs else dummy)
        timer.sync(sk)

    return DSortResult(
        keys=sk.reshape(S, -1),
        rids=sr.reshape(S, -1) if pairs else None,
        counts=totals.reshape(S),
        overflow=jnp.zeros((), jnp.bool_),
        times=timer.report(),
    )


def gather_sorted(res: DSortResult) -> np.ndarray:
    """Materialize the global sorted sequence on host (tests/verification)."""
    ks = np.asarray(jax.device_get(res.keys))
    cnt = np.asarray(jax.device_get(res.counts))
    return np.concatenate([ks[i, : cnt[i]] for i in range(ks.shape[0])])


def gather_rids(res: DSortResult) -> np.ndarray:
    rs = np.asarray(jax.device_get(res.rids))
    cnt = np.asarray(jax.device_get(res.counts))
    return np.concatenate([rs[i, : cnt[i]] for i in range(rs.shape[0])])


def check_distributed(res: DSortResult) -> int:
    """Distributed check() analog: per-shard ascending, cross-shard
    boundary order (msb_64.c:2493-2494), returns the checksum."""
    ks = np.asarray(jax.device_get(res.keys))
    cnt = np.asarray(jax.device_get(res.counts))
    total = 0
    prev = None
    for i in range(ks.shape[0]):
        row = ks[i, : cnt[i]]
        if row.size:
            if not np.all(np.diff(row.astype(np.int64)) >= 0):
                raise AssertionError(f"shard {i} not sorted")
            if prev is not None and row[0] < prev:
                raise AssertionError(f"shard boundary {i} out of order")
            prev = row[-1]
            total = (total + int(row.astype(np.uint64).sum())) % (1 << 64)
    return total
