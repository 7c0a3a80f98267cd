"""v5 in-place engine tests (interpret mode on CPU).

Covers the reference's in-place machinery re-created by v5:
``range_partition_to_blocks`` (msb_64.c:497-699) -> seqroute_level,
the online/offline block swaps (:2016-2158) -> permute_schedule +
block_permute, and the end-to-end in-place sort against the numpy
oracle over the distribution matrix (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops import engine_v5
from inplacemsdradixsort_tpu.ops.engine_v5 import permute_schedule, sort_v5
from inplacemsdradixsort_tpu.ops.kernels_v5 import (
    BLK, BLKROWS, block_permute, seqroute_level)

LANES = 128

CFG = SortConfig(
    interpret=True,
    min_engine_n=1,
    v5_pitch_rows=64,       # 8192-element L1 tiles
    v3_sort_rows=512,       # L2 tiles: pitch2 = 512 - rmax
    v3_rmax=8,
    v3_cap_rows=32,         # tiny terminal caps exercise the XL class
)


def _dist(name, n, rng):
    if name == "uniform":
        return rng.integers(0, 2**32, n, dtype=np.uint32)
    if name == "zipf":
        return rng.zipf(1.3, n).astype(np.uint32)
    if name == "dup8":
        return rng.integers(0, 8, n, dtype=np.uint32)
    if name == "sorted":
        return np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
    if name == "reverse":
        return np.sort(
            rng.integers(0, 2**32, n, dtype=np.uint32))[::-1].copy()
    if name == "allequal":
        return np.full(n, 0xCAFEBABE, np.uint32)
    if name == "maxheavy":
        x = np.where(rng.random(n) < 0.3, 0xFFFFFFFF,
                     rng.integers(0, 2**32, n, dtype=np.uint32))
        return x.astype(np.uint32)
    raise KeyError(name)


# ===================================================== block_permute

def test_permute_schedule_applies_any_permutation(rng):
    nslots = 37
    data = rng.integers(0, 2**31, (nslots * BLKROWS, LANES),
                        dtype=np.int32)
    perm = rng.permutation(nslots)          # src_of_final
    sched = permute_schedule(perm)
    (out,) = block_permute((jnp.asarray(data),), jnp.asarray(sched),
                           interpret=True)
    out = np.asarray(out).reshape(nslots, BLKROWS, LANES)
    ref = data.reshape(nslots, BLKROWS, LANES)[perm]
    np.testing.assert_array_equal(out, ref)


def test_permute_schedule_short_cycles(rng):
    # many 2-cycles back to back: the stage-rotation deadlock regression
    nslots = 24
    perm = np.arange(nslots)
    perm[::2], perm[1::2] = (np.arange(nslots)[1::2].copy(),
                             np.arange(nslots)[::2].copy())
    data = rng.integers(0, 2**31, (nslots * BLKROWS, LANES),
                        dtype=np.int32)
    sched = permute_schedule(perm)
    (out,) = block_permute((jnp.asarray(data),), jnp.asarray(sched),
                           interpret=True)
    ref = data.reshape(nslots, BLKROWS, LANES)[perm]
    np.testing.assert_array_equal(
        np.asarray(out).reshape(nslots, BLKROWS, LANES), ref)


def test_permute_multi_plane(rng):
    nslots = 9
    perm = rng.permutation(nslots)
    planes = tuple(
        jnp.asarray(rng.integers(0, 2**31, (nslots * BLKROWS, LANES),
                                 dtype=np.int32))
        for _ in range(2)
    )
    outs = block_permute(planes, jnp.asarray(permute_schedule(perm)),
                         interpret=True)
    for p, o in zip(planes, outs):
        ref = np.asarray(p).reshape(nslots, BLKROWS, LANES)[perm]
        np.testing.assert_array_equal(
            np.asarray(o).reshape(nslots, BLKROWS, LANES), ref)


# ===================================================== seqroute_level

def _seqroute_oracle(keys_u32, bounds_u, pitch, rmax):
    """Model the in-place partition: per tile (sorted), append each
    range's run to its stream; full blocks flush in (tile, range, block)
    order to sequential slots; drains (padded with the range bound) land
    at slots nfull + d."""
    n = len(keys_u32)
    rows_in = -(-n // LANES)
    ntiles = -(-rows_in // pitch)
    streams = [[] for _ in range(rmax)]
    h = np.zeros((ntiles, rmax), np.int64)
    for t in range(ntiles):
        lo = t * pitch * LANES
        hi = min(n, (t + 1) * pitch * LANES)
        tile = np.sort(keys_u32[lo:hi])
        ids = np.searchsorted(bounds_u, tile.astype(np.uint64),
                              side="left")
        for d in range(rmax):
            sel = tile[ids == d]
            streams[d].append(sel)
            h[t, d] = len(sel)
    slots = {}
    s = 0
    C = np.zeros(rmax, np.int64)
    for t in range(ntiles):
        for d in range(rmax):
            for k in range(C[d] // BLK, (C[d] + h[t, d]) // BLK):
                slots[(d, k)] = s
                s += 1
            C[d] += h[t, d]
    nfull = s
    out = {}
    for d in range(rmax):
        stream = (np.concatenate(streams[d]) if streams[d]
                  else np.zeros(0, np.uint32))
        nb = len(stream) // BLK
        for k in range(nb):
            out[slots[(d, k)]] = stream[k * BLK:(k + 1) * BLK]
        tail = stream[nb * BLK:]
        pad = np.full(BLK - len(tail), bounds_u[d], np.uint32)
        out[nfull + d] = np.concatenate([tail, pad])
    return out, h


@pytest.mark.parametrize("dist", ["uniform", "zipf", "dup8"])
def test_seqroute_matches_oracle(rng, dist):
    n = 6 * BLK + 777          # several blocks + ragged tail
    rmax, pitch = 8, 64
    keys = _dist(dist, n, rng)
    qs = np.quantile(keys.astype(np.float64),
                     np.linspace(0, 1, rmax))
    bounds_u = np.unique(np.concatenate(
        [qs.astype(np.uint64)[1:-1], [np.uint64(0xFFFFFFFF)]]))
    bounds_u = np.sort(np.pad(
        bounds_u, (0, rmax - len(bounds_u)),
        constant_values=np.uint64(0xFFFFFFFF)))

    oracle, h = _seqroute_oracle(keys, bounds_u, pitch, rmax)

    rows_in = -(-n // LANES)
    g = engine_v5._GeomV5(
        n=n, nplanes=1, rmax=rmax, pitch1=pitch, sort_rows2=512,
        pitch2=512 - rmax, cap_rows=32, rows_in=rows_in,
        nblocks=-(-n // BLK), ntiles1=-(-rows_in // pitch),
        w_rows=(-(-n // BLK) + rmax) * BLKROWS + 512 + 64,
        ssz=4096, nbq=64, nb_want=16,
    )
    plan = engine_v5._PlanV5(
        ng=rmax, l1_bounds_u=bounds_u,
        l2_bounds_u=np.tile(bounds_u[:, None], (1, rmax)),
        glen=np.ones(rmax, np.int64), heavy1=np.zeros(rmax, bool),
        drop2=np.zeros((rmax, rmax), np.int32),
    )
    (meta5, cnt_tbl, base_tbl, slot_tbl, padv_tbl, cnt, nblk, Fbase,
     src) = engine_v5._seqroute_tables(h, g, plan)
    np.testing.assert_array_equal(cnt, h.sum(0))

    w = np.zeros(g.w_rows * LANES, np.uint32)
    w[:n] = keys
    w = jnp.asarray(w.view(np.int32).reshape(g.w_rows, LANES))
    (out,) = seqroute_level(
        (w,), jnp.asarray(meta5), jnp.asarray(cnt_tbl),
        jnp.asarray(base_tbl), jnp.asarray(slot_tbl),
        jnp.asarray(padv_tbl), g.ntiles1 + 1, pitch, rmax,
        bias_input=True, interpret=True,
    )
    out = np.asarray(out)
    for slot, want in oracle.items():
        got = (out[slot * BLKROWS:(slot + 1) * BLKROWS].reshape(-1)
               .view(np.uint32) ^ np.uint32(0x80000000))
        np.testing.assert_array_equal(
            got, want, err_msg=f"slot {slot} mismatch")


# ===================================================== end to end

DISTS = ["uniform", "zipf", "dup8", "sorted", "reverse", "allequal",
         "maxheavy"]


@pytest.mark.parametrize("dist", DISTS)
def test_v5_keys_only_distributions(rng, dist):
    n = 5 * BLK + 321
    keys = _dist(dist, n, rng)
    want = np.sort(keys)
    out, _ = sort_v5(jnp.asarray(keys), (), CFG)
    np.testing.assert_array_equal(np.asarray(out), want)


def test_v5_pairs_lexicographic(rng):
    # moderate duplicates: the engine path (dup8 in pairs mode would
    # overflow the terminal caps and divert to the fallback, which
    # test_v5_retry_is_lossless covers)
    n = 3 * BLK + 99
    keys = rng.integers(0, 50_000, n, dtype=np.uint32)
    rids = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    order = np.lexsort((rids, keys))
    out_k, out_v = sort_v5(jnp.asarray(keys), (jnp.asarray(rids),), CFG)
    np.testing.assert_array_equal(np.asarray(out_k), keys[order])
    np.testing.assert_array_equal(np.asarray(out_v[0]), rids[order])


def test_v5_u64_two_planes(rng):
    # split/join in numpy: the jax-side codec truncates without x64
    n = 3 * BLK + 11
    keys = rng.integers(0, 2**64, n, dtype=np.uint64)
    hi = (keys >> 32).astype(np.uint32)
    lo = (keys & 0xFFFFFFFF).astype(np.uint32)
    out_hi, rest = sort_v5(jnp.asarray(hi), (jnp.asarray(lo),), CFG)
    got = (np.asarray(out_hi).astype(np.uint64) << 32) | np.asarray(
        rest[0])
    np.testing.assert_array_equal(got, np.sort(keys))


def test_v5_retry_is_lossless(rng):
    # adversarial: a heavy key value in PAIRS mode cannot be isolated
    # (payload must ride), so its terminal bucket overflows every retry
    # — exercising the lossless compact-retry path (post-L1 W is
    # re-extracted, nothing dropped) and, since r5, the deep-key tier
    # (ops/deep.py) instead of a whole-array XLA fallback
    from inplacemsdradixsort_tpu.ops import engine_v4 as e4
    n = 4 * BLK
    keys = np.concatenate([
        np.full(n // 2, 7, np.uint32),
        _dist("uniform", n - n // 2, rng),
    ])
    rng.shuffle(keys)
    rids = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    order = np.lexsort((rids, keys))
    e4.reset_fallback_stats()
    out_k, out_v = sort_v5(jnp.asarray(keys), (jnp.asarray(rids),), CFG)
    np.testing.assert_array_equal(np.asarray(out_k), keys[order])
    np.testing.assert_array_equal(np.asarray(out_v[0]), rids[order])
    assert e4.FALLBACK_STATS["overflow"] == 0


def test_v5_from_chunks_exact_and_raw(rng):
    """The resident >half-HBM delivery path (sort_v5_from_chunks): W is
    assembled chunk by chunk; raw=True must return the sorted planes in
    2D (w_rows, 128) uint32 form whose row-major prefix of n elements
    equals the exact extraction (the 2^31 zero-copy contract — a 1D
    reshape would retile + copy, engine_v5._step_extract_raw)."""
    n = 3 * BLK + 640
    csz = BLK
    chunks = [rng.integers(0, 2**32, min(csz, n - i * csz),
                           dtype=np.uint32)
              for i in range((n + csz - 1) // csz)]
    allk = np.concatenate(chunks)
    ref = np.sort(allk)
    rids = [c.copy() for c in chunks]            # rids == keys trick

    def chunk_fn(i):
        return (jnp.asarray(chunks[i]), jnp.asarray(rids[i]))

    ok, vo = engine_v5.sort_v5_from_chunks(
        chunk_fn, len(chunks), n, CFG)
    np.testing.assert_array_equal(np.asarray(ok), ref)
    np.testing.assert_array_equal(np.asarray(vo[0]), ref)

    ok2, vo2 = engine_v5.sort_v5_from_chunks(
        chunk_fn, len(chunks), n, CFG, raw=True)
    assert ok2.ndim == 2 and ok2.shape[1] == LANES
    assert ok2.dtype == jnp.int32      # raw bit patterns (zero-copy)
    got = np.asarray(ok2).reshape(-1).view(np.uint32)[:n]
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(
        np.asarray(vo2[0]).reshape(-1).view(np.uint32)[:n], ref)
    # the slab verifier agrees (the 2^31 validation path)
    from inplacemsdradixsort_tpu.utils.checking import raw_check_2d
    import jax
    s, srt, pay = raw_check_2d(ok2, n, vo2[0], slab_rows=64)
    assert bool(jax.device_get(srt)) and bool(jax.device_get(pay))
    assert (int(jax.device_get(s)) % 2**32
            == int(allk.astype(np.uint64).sum()) % 2**32)
