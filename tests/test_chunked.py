"""Out-of-core chunked sort (``ops.chunked.sort_external``) property tests.

The chunked path is the single-chip analog of the reference's
cross-domain exchange (SURVEY §5.7, /root/reference/src/msb_64.c:1672-2158):
sample -> exact count -> route into one shared range-major arena -> local
sort per range, yielded as a stream of contiguous sorted pieces.

Interpret mode, tiny geometry (CPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from inplacemsdradixsort_tpu.config import SortConfig
from inplacemsdradixsort_tpu.ops.chunked import sort_external

# ranges are a few thousand elements here, below sort_v4's XLA-dispatch
# threshold: local sorts go through the (separately tested) XLA tier,
# keeping the suite fast; test_local_v4_engine lowers min_engine_n to
# drive the real v4 pipeline on the sliced arena windows once.
CFG = SortConfig(interpret=True, v3_sort_rows=32, v3_rmax=8,
                 v3_cap_rows=32)


def _get(x):
    return np.asarray(jax.device_get(x))


def _run(x: np.ndarray, nchunks: int, vals=(), nranges=4, cfg=CFG):
    """Drive sort_external over even-ish splits of x (+payload planes)."""
    splits = np.array_split(np.arange(len(x)), nchunks)
    planes_np = (x,) + tuple(vals)

    def chunk_fn(i):
        sl = splits[i]
        return tuple(jnp.asarray(p[sl[0]: sl[-1] + 1]) for p in planes_np)

    pieces = list(sort_external(chunk_fn, nchunks, len(x), cfg,
                                nranges=nranges))
    outs = [np.concatenate([_get(p[j]) for p in pieces])
            for j in range(1 + len(vals))]
    return outs


@pytest.mark.parametrize("name,nchunks", [
    ("uniform", 1), ("uniform", 3), ("dups", 2), ("all_equal", 2),
    ("sorted", 2), ("reverse", 3),
])
def test_keys_only(name, nchunks):
    rng = np.random.default_rng(5)
    n = 30_000
    cases = {
        "uniform": rng.integers(0, 2**32, n, dtype=np.uint32),
        "dups": rng.integers(0, 13, n, dtype=np.uint32) * 0x01000193,
        "all_equal": np.full(n, 0xCAFEBABE, np.uint32),
        "sorted": np.sort(rng.integers(0, 2**32, n, dtype=np.uint32)),
        "reverse": np.sort(
            rng.integers(0, 2**32, n, dtype=np.uint32))[::-1].copy(),
    }
    x = cases[name]
    (out,) = _run(x, nchunks)
    np.testing.assert_array_equal(out, np.sort(x))


def test_payload_roundtrip():
    """(key, rid) pairs: the rid plane rides the exchange + local sorts."""
    rng = np.random.default_rng(9)
    n = 25_000
    k = rng.integers(0, 2**20, n).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ok, ov = _run(k, 3, vals=(v,))
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ok, k[order])
    # permutation integrity: each rid appears once, and k[rid] == key
    assert np.array_equal(np.sort(ov), v)
    np.testing.assert_array_equal(k[ov], ok)


def test_uneven_chunks_and_zipf():
    rng = np.random.default_rng(21)
    n = 40_000
    # skewed: a heavy value plus a zipf-ish tail
    x = np.where(
        rng.random(n) < 0.4,
        np.uint32(0x12345678),
        (rng.zipf(1.3, n) * 2654435761 % 2**32).astype(np.uint32),
    )
    splits = [17_000, 3, 22_997]
    offs = np.cumsum([0] + splits)

    def chunk_fn(i):
        return (jnp.asarray(x[offs[i]: offs[i + 1]]),)

    pieces = list(sort_external(chunk_fn, 3, n, CFG, nranges=6))
    out = np.concatenate([_get(p[0]) for p in pieces])
    np.testing.assert_array_equal(out, np.sort(x))


def test_local_v4_engine():
    """Drive the per-range v4 pipeline on the sliced arena windows: the
    window reaches into later ranges and this range's phantom pads — both
    must sort past ``real`` and trim away."""
    rng = np.random.default_rng(33)
    n = 24_000
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    import dataclasses
    cfg = dataclasses.replace(CFG, min_engine_n=1024)
    (out,) = _run(x, 2, nranges=4, cfg=cfg)
    np.testing.assert_array_equal(out, np.sort(x))
