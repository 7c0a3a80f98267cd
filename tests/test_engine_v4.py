"""v4 engine property tests (CPU interpret mode, small tile geometry).

Oracle strategy per SURVEY.md §4: numpy sort on uniform / Zipfian /
duplicate-heavy / sorted / reverse / all-equal inputs, plus the
payload-integrity trick (rids == stable permutation) and the u64-rid
two-plane payload contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops.engine_v4 import sort_v4, make_plan_v4

CFG = SortConfig(interpret=True, v3_sort_rows=32, v3_rmax=8,
                 v3_cap_rows=32)
N = 70_000


def _run(x, vals=()):
    k, vs = sort_v4(jnp.asarray(x), tuple(jnp.asarray(v) for v in vals),
                    CFG)
    return np.asarray(k), tuple(np.asarray(v) for v in vs)


@pytest.mark.parametrize("dist", [
    "uniform", "zipf", "dup8", "sorted", "reverse", "allequal", "maxheavy",
    "rowcorr",
])
def test_keys_only_distributions(dist):
    rng = np.random.default_rng(hash(dist) % 2**32)
    if dist == "uniform":
        x = rng.integers(0, 2**32, N, dtype=np.uint32)
    elif dist == "zipf":
        x = rng.zipf(1.3, N).astype(np.uint32)
    elif dist == "dup8":
        x = rng.integers(0, 8, N, dtype=np.uint32)
    elif dist == "sorted":
        x = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))
    elif dist == "reverse":
        x = np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))[::-1].copy()
    elif dist == "allequal":
        x = np.full(N, 0xCAFEBABE, np.uint32)
    elif dist == "maxheavy":
        x = np.where(rng.random(N) < 0.3, 0xFFFFFFFF,
                     rng.integers(0, 2**32, N, dtype=np.uint32))
        x = x.astype(np.uint32)
    else:  # rowcorr
        x = ((np.arange(N, 0, -1, dtype=np.uint64) % 997)
             .astype(np.uint32) * np.uint32(44257))
    out, _ = _run(x)
    assert np.array_equal(out, np.sort(x)), dist


def test_pairs_stable():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 500, N, dtype=np.uint32)   # heavy duplicates
    r = np.arange(N, dtype=np.uint32)
    out, (vout,) = _run(x, (r,))
    order = np.argsort(x, kind="stable")
    assert np.array_equal(out, x[order])
    assert np.array_equal(vout, order.astype(np.uint32))


def test_u64_rid_two_planes():
    """(u32 key, u64 rid) payload: rids >= 2^32 round-trip exactly
    (BASELINE config 4 contract; the reference's 64-bit rids,
    /root/reference/include/msb_64.h:37)."""
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, N, dtype=np.uint32)
    rid = rng.integers(0, 2**64, N, dtype=np.uint64)
    hi = (rid >> 32).astype(np.uint32)
    lo = (rid & 0xFFFFFFFF).astype(np.uint32)
    out, (shi, slo) = _run(x, (hi, lo))
    srid = (shi.astype(np.uint64) << 32) | slo
    # key order + per-key rid multisets must match (ordering within a key
    # group is by rid value: planes are compared lexicographically)
    order = np.lexsort((lo, hi, x))
    assert np.array_equal(out, x[order])
    assert np.array_equal(srid, rid[order])


def test_small_input_fallback():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    out, _ = _run(x)
    assert np.array_equal(out, np.sort(x))


def test_one_level_path():
    """nb <= rmax: the pipeline skips L2 and the terminal reads arena1."""
    rng = np.random.default_rng(5)
    n = 66_000
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    big = SortConfig(interpret=True, v3_sort_rows=32, v3_rmax=8,
                     v3_cap_rows=128)     # few big buckets -> one level
    k, _ = sort_v4(jnp.asarray(x), (), big)
    assert np.array_equal(np.asarray(k), np.sort(x))


def test_hybrid_constant_prefix_invariant():
    """With hybrid delimiters wired in, every final bucket must lie
    inside one radix cell: constant top ``prefix_bits`` bits
    (msb_64.c:1545-1564, asserted :2190-2192)."""
    from inplacemsdradixsort_tpu.ops.engine_v4 import (_sample_stats,
                                                       _geometry)
    rng = np.random.default_rng(13)
    n = 2_000_000                  # large enough that nb_want >= 16
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    cfg = SortConfig(interpret=True, v3_sort_rows=512, v3_rmax=64,
                     v3_cap_rows=64)
    _, nbw = _geometry(n, 1, cfg)
    stats = np.asarray(_sample_stats(jnp.asarray(x), ssz=8192,
                                     nbq=4 * nbw, salt=0))
    plan = make_plan_v4(n, stats, 8192, 1, cfg)
    assert plan.prefix_bits >= 2
    # reconstruct the flat bucket bound list from the (biased) group
    # tables: unbias int32 -> uint32
    bounds = (plan.l2_bounds.view(np.uint32)
              ^ np.uint32(0x80000000)).reshape(plan.rmax, plan.rmax)
    shift = 32 - plan.prefix_bits
    glen = plan.group_len
    flat = []
    for gi in range(plan.rmax):
        flat.extend(bounds[gi, : glen[gi]].tolist())
    flat = np.array(sorted(set(flat)), np.uint32)
    los = np.concatenate(
        [np.zeros(1, np.uint64), flat[:-1].astype(np.uint64) + 1])
    assert np.all(
        (los >> shift) == (flat.astype(np.uint64) >> shift)
    ), "bucket spans a radix cell boundary"


def test_plan_exactness_no_overflow_fields():
    """The v4 plan carries bounds only: no capacity estimates."""
    rng = np.random.default_rng(9)
    x = rng.integers(0, 2**32, N, dtype=np.uint32)
    from inplacemsdradixsort_tpu.ops.engine_v4 import (_sample_stats,
                                                       _geometry)
    _, nbw = _geometry(N, 1, CFG)
    stats = np.asarray(_sample_stats(jnp.asarray(x), ssz=4096,
                                     nbq=4 * nbw, salt=0))
    # ssz >= rows (546) -> the sampler sorts the first ssz keys: S = 4096
    plan = make_plan_v4(N, stats, 4096, 1, CFG)
    assert not hasattr(plan, "l1_dst_cap")
    assert plan.arena1_rows >= N // 128


def test_host_planner_path():
    """The host-side numpy planner (device_plan=False) stays correct —
    it is the per-shard planning path used by parallel.dsort."""
    import dataclasses
    rng = np.random.default_rng(31)
    cfg = dataclasses.replace(CFG, device_plan=False)
    for x in (
        rng.integers(0, 2**32, N, dtype=np.uint32),
        rng.integers(0, 9, N, dtype=np.uint32),
    ):
        k, _ = sort_v4(jnp.asarray(x), (), cfg)
        assert np.array_equal(np.asarray(k), np.sort(x))


def test_device_planner_matches_oracle_on_skew():
    """Device-planned tables handle heavy values (mode-1 fill buckets)
    and clustered mass identically to the oracle."""
    rng = np.random.default_rng(33)
    x = np.where(rng.random(N) < 0.35, np.uint32(77),
                 rng.integers(0, 2**32, N).astype(np.uint32))
    k, _ = sort_v4(jnp.asarray(x.astype(np.uint32)), (), CFG)
    assert np.array_equal(np.asarray(k), np.sort(x.astype(np.uint32)))


def test_no_fallback_on_adversarial_classes():
    """Adaptive-scheduler contract (schedule_passes analog,
    msb_64.c:1334-1400): adversarial input classes sort through the
    engine path — the whole-array XLA fallback counter stays zero
    (VERDICT r3 item 5; the chip-scale probe lives in
    benchmarks/verify_probes.py at 2^26)."""
    from inplacemsdradixsort_tpu.ops import engine_v4
    rng = np.random.default_rng(7)
    classes = {
        "zipf1.1": (rng.zipf(1.1, N) % (1 << 32)).astype(np.uint32),
        "dup8": rng.integers(0, 8, N).astype(np.uint32),
        "allequal": np.full(N, 0xCAFEBABE, np.uint32),
        "maxheavy": np.where(
            rng.random(N) < 0.5, np.uint32(0xFFFFFFFF),
            rng.integers(0, 2**32, N).astype(np.uint32)
        ).astype(np.uint32),
    }
    for name, x in classes.items():
        engine_v4.reset_fallback_stats()
        k, _ = sort_v4(jnp.asarray(x), (), CFG)
        assert np.array_equal(np.asarray(k), np.sort(x)), name
        st = engine_v4.FALLBACK_STATS
        assert st["overflow"] == 0 and st["plan"] == 0 \
            and st["small_n"] == 0, (name, dict(st))


def test_one_level_device_plan():
    """The device planner's adaptive level-count selection: a bucket
    estimate that fits one rmax-wide level plans ONE partition sweep +
    terminal (no L2 arena), and still sorts correctly."""
    from inplacemsdradixsort_tpu.ops.engine_v4 import _dev_geometry
    rng = np.random.default_rng(11)
    cfg = SortConfig(interpret=True, v3_sort_rows=128, v3_rmax=48,
                     v3_cap_rows=64)
    n = 40_000
    g = _dev_geometry(n, 1, cfg)
    assert not g.two_level, g
    assert g.arena2_rows == 8  # no L2 arena allocated
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    k, _ = sort_v4(jnp.asarray(x), (), cfg)
    assert np.array_equal(np.asarray(k), np.sort(x))
    # pairs through the same one-level plan
    v = np.arange(n, dtype=np.uint32)
    k, vs = sort_v4(jnp.asarray(x), (jnp.asarray(v),), cfg)
    order = np.argsort(x, kind="stable")
    assert np.array_equal(np.asarray(k), x[order])
    assert np.array_equal(np.asarray(vs[0]), order.astype(np.uint32))
