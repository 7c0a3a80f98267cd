"""Public API — the TPU analog of the reference library entry points.

Reference surface (/root/reference/include/msb_64.h:37-41):

    void sort(uint64_t **keys, uint64_t **rids, uint64_t *size,
              int threads, int numa, double fudge,
              char **description, uint64_t *times);
    uint64_t check(uint64_t **keys, uint64_t **rids, uint64_t *size,
                   int numa, int same);
    void *mamalloc(size_t size);

Here:

    sort(keys, rids=None, config=..., timing=False)
        -> SortResult(keys, rids, times)           # single chip
    check(keys, rids=None, same=False)  -> checksum  (utils.checking)
    mamalloc(n, dtype, fudge)           -> padded device buffer

``threads``/``numa`` have no meaning on a single chip; their role (the
two-level parallel topology) is played by the device mesh in
``parallel.dsort.distributed_sort``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DEFAULT_CONFIG, SortConfig
from .ops import xla_engine
from .utils.checking import check  # re-exported
from .utils.timing import PhaseTimer, PHASE_LABELS


@dataclasses.dataclass
class SortResult:
    keys: jax.Array
    rids: Optional[jax.Array]
    times: List[Tuple[str, float]]          # the 10-row phase report
    # True when the engine already synchronized on the result (the v4
    # driver's overflow-flag fetch doubles as the completion barrier):
    # callers need no further block_until_ready/device_get to time it
    synced: bool = False

    def pretty_times(self) -> str:
        out = [f"{'phase':<14}{'seconds':>12}"]
        for lbl, t in self.times:
            out.append(f"{lbl:<14}{t:>12.6f}")
        return "\n".join(out)


def mamalloc(n: int, dtype=jnp.uint32, fudge: float = 1.0) -> jax.Array:
    """Padded, lane-aligned device buffer (reference mamalloc analog,
    msb_64.c:111-115 — 64-byte alignment becomes 128-lane row alignment)."""
    lanes = DEFAULT_CONFIG.lanes
    cap = int(np.ceil(n * fudge / lanes)) * lanes
    return jnp.zeros((cap,), dtype=dtype)


def _select_engine(cfg: SortConfig) -> str:
    if cfg.engine != "auto":
        return cfg.engine
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "v4" if platform == "tpu" else "xla"


def _rid_planes(rids) -> Tuple[jax.Array, ...]:
    """Payload planes for an arbitrary-width integer rid array: one u32
    plane, or (hi, lo) for 64-bit rids — values >= 2^32 round-trip
    exactly (the reference's 64-bit rids, msb_64.h:37)."""
    if rids.dtype.itemsize <= 4:
        return (rids.astype(jnp.uint32),)
    from .ops import keycodec
    return keycodec.split_u64(rids.astype(jnp.uint64))


def _join_rids(planes: Tuple[jax.Array, ...], dtype) -> jax.Array:
    if len(planes) == 1:
        return planes[0].astype(dtype)
    from .ops import keycodec
    return keycodec.join_u64(*planes).astype(dtype)


def sort(
    keys: jax.Array,
    rids: Optional[jax.Array] = None,
    config: SortConfig = DEFAULT_CONFIG,
    timing: bool = False,
) -> SortResult:
    """Sort ``keys`` (optionally permuting ``rids`` along) on one chip.

    - dtype uint32 or uint64 (the reference's key type, msb_64.h:37)
    - ``rids`` any integer payload of the same length; sorted stably.
    - ``timing=True`` runs phases as separate device calls and fills the
      10-row report (msb_64.c:2384-2412 contract).
    """
    keys = jnp.asarray(keys)
    n = keys.shape[0]
    if rids is not None:
        rids = jnp.asarray(rids)
        assert rids.shape[0] == n
    timer = PhaseTimer(enabled=timing)
    engine = _select_engine(config)
    if engine == "v4" and config.engine == "auto":
        # size-aware tier: v4's out-of-place working set is ~4.3 x the
        # plane bytes (input + two packed arenas + output); when that
        # exceeds ~75% of HBM, the in-place v5 (~2.3 x incl. the caller
        # input; msb_64.c:497-699) is the engine that still fits
        nplanes = (2 if keys.dtype.itemsize == 8 else 1) + (
            0 if rids is None else (2 if rids.dtype.itemsize == 8 else 1)
        )
        try:
            hbm = jax.devices()[0].memory_stats()["bytes_limit"]
        except Exception:
            hbm = 16 << 30
        if 4.3 * nplanes * 4 * int(n) > 0.75 * hbm:
            engine = "v5"

    if engine in ("v4", "v5", "lsb"):
        # flagship engine (v4: exact-histogram MSD), the in-place v5
        # (the reference's defining feature, msb_64.c:497-699,
        # 2016-2158: engine working set ~(1+frac) x N; feeding it whole
        # arrays adds the input itself — use sort_v5_from_chunks for
        # the resident >half-HBM path), or the
        # LSB ping-pong variant (the reference suite's lsb_32/lsb_64,
        # Makefile:8-24); all take multi-plane payloads (u64 keys and/or
        # u64 rids as extra u32 planes); i32/i64/f32 go through the
        # order-preserving keycodec bijections (README.md:19-33)
        from .ops import engine_v4, keycodec
        if keys.dtype == jnp.uint32:
            kplanes: Tuple[jax.Array, ...] = (keys,)
        elif keys.dtype == jnp.int32:
            kplanes = (keycodec.encode_i32(keys),)
        elif keys.dtype == jnp.float32:
            kplanes = (keycodec.encode_f32(keys),)
        elif keys.dtype == jnp.uint64:
            kplanes = keycodec.split_u64(keys)
        elif keys.dtype == jnp.int64:
            kplanes = keycodec.split_u64(
                jax.lax.bitcast_convert_type(keys, jnp.uint64)
                ^ jnp.uint64(1 << 63)
            )
        else:
            raise TypeError(f"unsupported key dtype {keys.dtype}")
        vplanes = _rid_planes(rids) if rids is not None else ()
        if engine == "lsb":
            from .ops import engine_lsb
            outs, vouts = engine_lsb.sort_lsb(
                kplanes[0], kplanes[1:] + vplanes, config, timer=timer,
                nkey=len(kplanes),
            )
        elif engine == "v5":
            from .ops import engine_v5
            outs, vouts = engine_v5.sort_v5(
                kplanes[0], kplanes[1:] + vplanes, config, timer=timer
            )
        else:
            outs, vouts = engine_v4.sort_v4(
                kplanes[0], kplanes[1:] + vplanes, config, timer=timer
            )
        outs = (outs,) + vouts[: len(kplanes) - 1]
        vouts = vouts[len(kplanes) - 1:]
        if keys.dtype == jnp.uint32:
            out_k = outs[0]
        elif keys.dtype == jnp.int32:
            out_k = keycodec.decode_i32(outs[0])
        elif keys.dtype == jnp.float32:
            out_k = keycodec.decode_f32(outs[0])
        elif keys.dtype == jnp.uint64:
            out_k = keycodec.join_u64(*outs)
        else:  # int64
            out_k = jax.lax.bitcast_convert_type(
                keycodec.join_u64(*outs) ^ jnp.uint64(1 << 63), jnp.int64
            )
        out_r = _join_rids(vouts, rids.dtype) if rids is not None else None
    elif engine == "v3" and keys.dtype == jnp.uint32:
        from .ops import engine_v3
        rr = rids.astype(jnp.uint32) if rids is not None else None
        out_k, out_r = engine_v3.sort_v3(keys, rr, config, timer=timer)
        if out_r is not None and rids is not None:
            out_r = out_r.astype(rids.dtype)
    elif engine == "v3" and keys.dtype == jnp.uint64 and rids is None:
        # (hi, lo) through the lexicographic pairs path: a full uint64
        # sort in one pipeline (the reference's native key type,
        # msb_64.h:37)
        from .ops import engine_v3, keycodec
        hi, lo = keycodec.split_u64(keys)
        shi, slo = engine_v3.sort_v3(hi, lo, config, timer=timer)
        out_k, out_r = keycodec.join_u64(shi, slo), None
    elif engine == "pallas" and keys.dtype == jnp.uint32:
        from .ops import pallas_engine
        out_k, out_r = pallas_engine.msd_sort(
            keys, rids, config, timer=timer
        )
    elif engine == "pallas" and keys.dtype == jnp.uint64 and rids is None:
        from .ops import keycodec, pallas_engine
        hi, lo = keycodec.split_u64(keys)
        shi, slo = pallas_engine.msd_sort_u64(hi, lo, config, timer=timer)
        out_k, out_r = keycodec.join_u64(shi, slo), None
    else:
        with timer.phase("local_sort"):
            if rids is None:
                out_k, out_r = xla_engine.sort_keys(keys), None
            else:
                out_k, out_r = xla_engine.sort_pairs(keys, rids)
            timer.sync(out_k)

    # engines that fetch a flag/tail with the result already synchronized
    # on it (v4/v5 overflow fetch; lsb is one device program but performs
    # no result-side fetch; xla/v3/pallas return async values)
    return SortResult(keys=out_k, rids=out_r, times=timer.report(),
                      synced=engine in ("v4", "v5"))


def sort_with_indices(
    keys: jax.Array, config: SortConfig = DEFAULT_CONFIG
) -> Tuple[jax.Array, jax.Array]:
    """Sorted keys + the stable sorting permutation (uint32 row ids).

    The reference carries explicit rowid payloads (rids); generating the
    identity payload here mirrors its benchmark setup where rids start as a
    permutation to be dragged along.
    """
    idx = jnp.arange(keys.shape[0], dtype=jnp.uint32)
    res = sort(keys, idx, config=config)
    return res.keys, res.rids
