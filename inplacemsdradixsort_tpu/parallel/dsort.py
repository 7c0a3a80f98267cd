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
  block exchange via atomics +        padded ragged all_to_all with
    remote memcpy (:1672-2158)          deterministic counts from an
                                        all-gathered histogram
  20 pthread barriers                 implicit XLA program order
  fudge over-allocation (:1574)       exchange_fudge padded slots +
                                        overflow flag -> driver retry

The exchange is exact: send counts are all-gathered, so every shard knows
every (src, dst) segment size — the deterministic replacement for the
reference's atomic block claiming.

Output: per-shard sorted runs in shard order (shard i holds keys <= shard
i+1's), the reference's per-NUMA-node output contract (msb_64.h:37).
"""

from __future__ import annotations

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


class DSortResult(NamedTuple):
    keys: jax.Array        # (S, cap) sharded; row i = shard i's sorted run
    rids: Optional[jax.Array]
    counts: jax.Array      # (S,) valid elements per shard
    overflow: jax.Array    # () bool — capacity exceeded, result invalid
    times: list


def _sample_bounds(keys, num_shards: int, sample_per_shard: int, seed,
                   axis: str):
    """P1-P3: per-shard sample -> all_gather -> replicated sort ->
    equal-depth shard boundary splitters."""
    me = lax.axis_index(axis)
    k = jax.random.fold_in(jax.random.key(seed), me)
    idx = jax.random.randint(
        k, (sample_per_shard,), 0, keys.shape[0], dtype=jnp.int32
    )
    local = jnp.take(keys, idx)
    sample = lax.all_gather(local, axis).reshape(-1)
    sample = jnp.sort(sample)
    return sp.extract_delimiters(sample, num_shards - 1)


def _exchange(keys, rids, bounds, send_cap: int, recv_cap: int, axis: str):
    """P4-P11: classify, count, all-gather counts, padded all_to_all,
    compact received segments."""
    num_shards = bounds.shape[0] + 1
    n_local = keys.shape[0]
    dest = jnp.searchsorted(bounds, keys, side="left").astype(jnp.int32)

    # deterministic send layout: group local keys by destination
    order_key = dest
    if rids is None:
        sorted_dest, sorted_keys = lax.sort(
            (order_key, keys), num_keys=1, is_stable=True
        )
        sorted_rids = None
    else:
        sorted_dest, sorted_keys, sorted_rids = lax.sort(
            (order_key, keys, rids), num_keys=1, is_stable=True
        )
    send_counts = jnp.sum(
        dest[:, None] == jnp.arange(num_shards)[None, :], axis=0,
        dtype=jnp.int32,
    )
    send_starts = jnp.cumsum(send_counts) - send_counts

    # every shard learns the full (src, dst) count matrix — the histogram
    # exchange that replaces atomic block claiming
    all_counts = lax.all_gather(send_counts, axis)        # (S, S)
    recv_counts = all_counts[:, lax.axis_index(axis)]     # (S,)
    total_recv = jnp.sum(recv_counts)
    overflow = (jnp.max(send_counts) > send_cap) | (total_recv > recv_cap)

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

    # compact: received segment s occupies [recv_starts[s], +recv_counts[s])
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
    return rk, rr, total_recv, overflow


def _build_steps(mesh: Mesh, cfg: SortConfig, n_local: int, pairs: bool,
                 send_cap: int, recv_cap: int, sample_per_shard: int,
                 seed: int):
    axis = mesh.axis_names[0]
    S = mesh.devices.size
    data_spec = P(axis)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(data_spec,),
        out_specs=P(None), check_vma=False,
    )
    def plan(keys):
        return _sample_bounds(keys, S, sample_per_shard, seed, axis)

    rid_spec = data_spec if pairs else P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(data_spec, rid_spec, P(None)),
        out_specs=(data_spec, rid_spec if pairs else P(None), data_spec,
                   P(None)),
        check_vma=False,
    )
    def exchange(keys, rids, bounds):
        rk, rr, total, ovf = _exchange(
            keys, rids if pairs else None, bounds, send_cap, recv_cap, axis
        )
        if rr is None:
            rr = jnp.zeros((1,), jnp.uint32)
        return rk, rr, total.reshape(1), lax.pmax(ovf, axis).reshape(1)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(data_spec, rid_spec),
        out_specs=(data_spec, rid_spec if pairs else P(None)),
        check_vma=False,
    )
    def local_sort(keys, rids):
        if pairs:
            k, r = lax.sort((keys, rids), num_keys=1, is_stable=True)
            return k, r
        return jnp.sort(keys), jnp.zeros((1,), jnp.uint32)

    return jax.jit(plan), jax.jit(exchange), jax.jit(local_sort)


def distributed_sort(
    keys: jax.Array,
    rids: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    config: SortConfig = DEFAULT_CONFIG,
    timing: bool = False,
    seed: int = 0,
) -> DSortResult:
    """Sort ``keys`` (globally) across the mesh.

    keys: (N,) uint32/uint64, N divisible by the shard count (pad with
    0xFF.. sentinels otherwise; they sort to the last shard's tail).
    Returns per-shard sorted runs + valid counts (the reference's
    per-NUMA-node arrays + sizes, msb_64.h:37).
    """
    from .mesh import make_sort_mesh
    if mesh is None:
        mesh = make_sort_mesh()
    S = mesh.devices.size
    axis = mesh.axis_names[0]
    n = keys.shape[0]
    assert n % S == 0, "pad N to a multiple of the shard count"
    n_local = n // S
    pairs = rids is not None
    timer = PhaseTimer(enabled=timing)

    sample_per_shard = max(
        1, min(int(config.sample_cap), int(config.sample_rate * n)) // S
    )
    send_cap = min(
        n_local,
        -(-int(config.exchange_fudge * n_local) // S),
    )
    recv_cap = min(n, int(config.exchange_fudge * n_local))

    keys = jax.device_put(keys, NamedSharding(mesh, P(axis)))
    if pairs:
        rids = jax.device_put(rids, NamedSharding(mesh, P(axis)))
    dummy = jnp.zeros((1,), jnp.uint32)

    for attempt in range(2):
        plan, exchange, local = _build_steps(
            mesh, config, n_local, pairs, send_cap, recv_cap,
            sample_per_shard, seed,
        )
        with timer.phase("sample"):
            bounds = plan(keys)
            timer.sync(bounds)
        with timer.phase("balance"):
            rk, rr, totals, ovf = exchange(
                keys, rids if pairs else dummy, bounds
            )
            timer.sync(rk)
        if not bool(jax.device_get(ovf)):
            break
        # capacity overflow (the reference aborts on fudge overflow,
        # README.md:27-29; we retry with exact-safe capacities)
        send_cap, recv_cap = n_local, n
    else:
        raise RuntimeError("exchange overflow even at full capacity")

    with timer.phase("local_sort"):
        sk, sr = local(rk, rr if pairs else dummy)
        timer.sync(sk)

    counts = totals.reshape(S)
    return DSortResult(
        keys=sk.reshape(S, -1),
        rids=sr.reshape(S, -1) if pairs else None,
        counts=counts,
        overflow=ovf,
        times=timer.report(),
    )


def gather_sorted(res: DSortResult) -> np.ndarray:
    """Materialize the global sorted sequence on host (tests/verification)."""
    ks = np.asarray(jax.device_get(res.keys))
    cnt = np.asarray(jax.device_get(res.counts))
    return np.concatenate([ks[i, : cnt[i]] for i in range(ks.shape[0])])


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
