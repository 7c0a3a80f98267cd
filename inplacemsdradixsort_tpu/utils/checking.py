"""Post-hoc verification — the ``check()`` / ``check_thread()`` analog.

The reference verifier (reference: /root/reference/src/msb_64.c:2432-2505)
runs a parallel scan asserting (a) ascending order within each thread chunk,
(b) ``key == rid`` payload integrity when requested, (c) ascending order
across NUMA-node boundaries, and returns an additive checksum the caller
compares against the input's checksum.

Here the same checks run as vectorized device code; the distributed variant
in ``parallel.dsort`` adds the cross-shard boundary check via collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def checksum(keys) -> int:
    """Additive mod-2^64 checksum (msb_64.c:2456-2466 ``sum += key``).

    Computed on host; uint64 wraparound gives the mod-2^64 semantics of the
    reference's ``uint64_t sum`` accumulator.
    """
    host = np.asarray(jax.device_get(keys)).astype(np.uint64)
    return int(host.sum(dtype=np.uint64))


def is_sorted(keys: jax.Array) -> jax.Array:
    """True iff keys are ascending (msb_64.c:2461 ``assert(key >= pkey)``)."""
    if keys.shape[0] <= 1:
        return jnp.asarray(True)
    return jnp.all(keys[1:] >= keys[:-1])


def check(
    keys,
    rids: Optional[jax.Array] = None,
    same: bool = False,
    input_checksum=None,
) -> int:
    """Verify a sorted (keys, rids) result; returns the checksum.

    Mirrors the reference ``check(keys, rids, size, numa, same)``
    (msb_64.c:2470-2505):
      - asserts ascending order,
      - if ``same``, asserts key == rid elementwise (the reference's
        payload-integrity trick where rids were initialized equal to keys),
      - returns the additive checksum for comparison against the input's.

    Accepts a single array or a list of per-shard arrays (the analog of the
    reference's per-NUMA-node arrays, include/msb_64.h:37), asserting
    cross-shard boundary order like msb_64.c:2493-2494.
    """
    shards = keys if isinstance(keys, (list, tuple)) else [keys]
    rshards = (
        rids if isinstance(rids, (list, tuple)) else [rids] * len(shards)
    )
    total = 0
    prev_last = None
    for k, r in zip(shards, rshards):
        k = jnp.asarray(k)
        if not bool(is_sorted(k)):
            raise AssertionError("keys are not ascending within shard")
        if same:
            if r is None:
                raise AssertionError("same=True requires rids")
            if not bool(jnp.all(k == jnp.asarray(r).astype(k.dtype))):
                raise AssertionError("key != rid payload mismatch")
        if prev_last is not None and k.shape[0] > 0:
            if not bool(k[0] >= prev_last):
                raise AssertionError("cross-shard boundary out of order")
        if k.shape[0] > 0:
            prev_last = k[-1]
        total = (total + int(checksum(k))) % (1 << 64)
    if input_checksum is not None:
        if total != int(input_checksum) % (1 << 64):
            raise AssertionError(
                f"checksum mismatch: {total} != {int(input_checksum)}"
            )
    return total


def raw_check_2d(k: jax.Array, n: int, k2: Optional[jax.Array] = None,
                 slab_rows: int = 1 << 15):
    """check() for raw 2D engine output without N-sized temporaries.

    ``k`` is a (rows, 128) plane whose row-major prefix of n elements
    is the result — uint32, or the int32 raw-bit-pattern form the v5
    raw extraction returns (engine_v5.sort_v5_from_chunks(raw=True));
    int32 slabs are bitcast to uint32 AFTER slicing, so the full-buffer
    bitcast (which XLA cannot alias) never materializes.  Returns
    device scalars (checksum mod 2^32, sorted, payload_equal) computed
    slab by slab (bounded footprint — at 2^31 even one bool temp of N
    elements is 2 GiB).  ``k2`` enables the reference's rids == keys
    integrity mode (msb_64.c:2461) against a second plane.
    """
    LANES = 128

    def _slab(kk, r0, rows, prev, kk2):
        r0 = jnp.asarray(r0, jnp.int32)
        sl = jax.lax.dynamic_slice(kk, (r0, 0), (rows, LANES))
        if sl.dtype == jnp.int32:
            sl = jax.lax.bitcast_convert_type(sl, jnp.uint32)
        flat = ((r0.astype(jnp.uint32)
                 + jnp.arange(rows, dtype=jnp.uint32)[:, None])
                * jnp.uint32(LANES)
                + jnp.arange(LANES, dtype=jnp.uint32)[None, :])
        live = flat < jnp.uint32(n)
        s = jnp.sum(jnp.where(live, sl, 0), dtype=jnp.uint32)
        okw = jnp.where(live[:, 1:], sl[:, 1:] >= sl[:, :-1], True)
        okb = jnp.where(live[1:, 0:1], sl[1:, 0:1] >= sl[:-1, -1:],
                        True)
        ok = jnp.all(okw) & jnp.all(okb) & jnp.where(
            live[0, 0], sl[0, 0] >= prev, True)
        pay = jnp.bool_(True)
        if kk2 is not None:
            sl2 = jax.lax.dynamic_slice(kk2, (r0, 0), (rows, LANES))
            if sl2.dtype == jnp.int32:
                sl2 = jax.lax.bitcast_convert_type(sl2, jnp.uint32)
            pay = jnp.all(jnp.where(live, sl == sl2, True))
        return s, ok, pay, sl[-1, -1]

    @jax.jit
    def run(kk, kk2=None):
        rows = kk.shape[0]
        nfull = rows // slab_rows

        def body(i, carry):
            s, ok, pay, prev = carry
            s2, ok2, pay2, prev2 = _slab(
                kk, i * slab_rows, slab_rows, prev, kk2)
            return (s + s2, ok & ok2, pay & pay2, prev2)

        init = (jnp.uint32(0), jnp.bool_(True), jnp.bool_(True),
                jnp.uint32(0))
        s, ok, pay, prev = jax.lax.fori_loop(0, nfull, body, init)
        rem = rows - nfull * slab_rows
        if rem:
            s2, ok2, pay2, _ = _slab(
                kk, nfull * slab_rows, rem, prev, kk2)
            s, ok, pay = s + s2, ok & ok2, pay & pay2
        return s, ok, pay

    return run(k) if k2 is None else run(k, k2)


def check_permutation(sorted_keys, sorted_rids, orig_keys) -> bool:
    """Payload-permutation integrity: sorted_keys == orig_keys[sorted_rids].

    Stronger than the reference's key==rid trick: verifies the rid payload is
    exactly the permutation that sorts the input.
    """
    orig = jnp.asarray(orig_keys)
    gathered = jnp.take(orig, jnp.asarray(sorted_rids).astype(jnp.int32))
    return bool(jnp.all(gathered == jnp.asarray(sorted_keys)))
