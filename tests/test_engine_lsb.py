"""LSB engine property tests (interpret mode, tiny geometry).

Covers the reference suite's lsb_32/lsb_64 behavior
(/root/reference/Makefile:8-24): full sorts over 8-bit-digit passes,
inherent stability, and multi-word (u64) keys via the word-major pass
schedule (msb_64.c:1526-1542).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops.engine_lsb import sort_lsb
from inplacemsdradixsort_tpu.ops import keycodec

# interpret-mode pallas executes every grid step in python on one core:
# run the pipeline at tiny n by lowering the XLA-dispatch threshold
CFG = SortConfig(interpret=True, v3_sort_rows=32, lsb_digit_bits=4,
                 min_engine_n=512)
N = 6_000


def _get(x):
    return np.asarray(jax.device_get(x))


def _cases():
    rng = np.random.default_rng(7)
    return {
        "uniform": rng.integers(0, 2**32, N, dtype=np.uint32),
        "dups": rng.integers(0, 17, N, dtype=np.uint32) * 0x10001,
        "sorted": np.sort(rng.integers(0, 2**32, N, dtype=np.uint32)),
        "reverse": np.sort(
            rng.integers(0, 2**32, N, dtype=np.uint32))[::-1].copy(),
        "all_equal": np.full(N, 0xDEADBEEF, np.uint32),
        "extremes": rng.choice(
            np.array([0, 1, 2**31, 0xFFFFFFFF, 0xFFFFFFFE], np.uint32), N),
    }


@pytest.mark.parametrize("name", list(_cases().keys()))
def test_keys_only(name):
    x = _cases()[name]
    out, _ = sort_lsb(jnp.asarray(x), (), CFG)
    np.testing.assert_array_equal(_get(out), np.sort(x))


def test_odd_length_and_small():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**32, 6_337, dtype=np.uint32)
    out, _ = sort_lsb(jnp.asarray(x), (), CFG)
    np.testing.assert_array_equal(_get(out), np.sort(x))
    # below the engine threshold: stable XLA path
    y = rng.integers(0, 2**32, 300, dtype=np.uint32)
    out, _ = sort_lsb(jnp.asarray(y), (), CFG)
    np.testing.assert_array_equal(_get(out), np.sort(y))


def test_pairs_stability():
    """LSB sorts are stable without an index plane (README.md:19-26).

    key_bits=8 skips the constant-zero high digits (keys < 50) — also
    covering the pass-skipping contract with payload planes."""
    rng = np.random.default_rng(11)
    k = rng.integers(0, 50, N).astype(np.uint32)
    v = rng.permutation(N).astype(np.uint32)
    ok, (ov,) = sort_lsb(jnp.asarray(k), (jnp.asarray(v),), CFG,
                         key_bits=8)
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(_get(ok), k[perm])
    np.testing.assert_array_equal(_get(ov), v[perm])


def test_u64_two_plane():
    rng = np.random.default_rng(13)
    # 40 significant bits: hi word in [0, 2^8) with forced collisions —
    # the hi passes matter, the constant-zero top 24 bits are skipped
    x = rng.integers(0, 2**40, N, dtype=np.uint64)
    x[: N // 2] = (x[: N // 2] & np.uint64(0xFFFFFFFF)) | (
        np.uint64(0xAB) << np.uint64(32)
    )
    with jax.enable_x64(True):
        hi, lo = keycodec.split_u64(jnp.asarray(x))
    ohi, (olo,) = sort_lsb(hi, (lo,), CFG, nkey=2, key_bits=40)
    with jax.enable_x64(True):
        out = _get(keycodec.join_u64(ohi, olo))
    np.testing.assert_array_equal(out, np.sort(x))


def test_pass_schedule():
    from inplacemsdradixsort_tpu.ops.engine_lsb import _pass_schedule
    # full width: lsw first, all digits
    assert _pass_schedule(1, 8) == ((0, 0), (0, 8), (0, 16), (0, 24))
    assert _pass_schedule(2, 8)[:4] == ((1, 0), (1, 8), (1, 16), (1, 24))
    assert _pass_schedule(2, 8)[4:] == ((0, 0), (0, 8), (0, 16), (0, 24))
    # key_bits clips high constant-zero digits (the 58-bit trick analog)
    assert _pass_schedule(1, 8, key_bits=8) == ((0, 0),)
    assert _pass_schedule(1, 4, key_bits=9) == ((0, 0), (0, 4), (0, 8))
    assert _pass_schedule(2, 8, key_bits=40) == (
        (1, 0), (1, 8), (1, 16), (1, 24), (0, 0))


def test_api_lsb_engine():
    import inplacemsdradixsort_tpu as rs
    rng = np.random.default_rng(17)
    x = rng.integers(0, 2**32, N, dtype=np.uint32)
    cfg = SortConfig(interpret=True, v3_sort_rows=32, lsb_digit_bits=4,
                     min_engine_n=512, engine="lsb")
    res = rs.sort(jnp.asarray(x), config=cfg)
    np.testing.assert_array_equal(_get(res.keys), np.sort(x))
