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


def check_permutation(sorted_keys, sorted_rids, orig_keys) -> bool:
    """Payload-permutation integrity: sorted_keys == orig_keys[sorted_rids].

    Stronger than the reference's key==rid trick: verifies the rid payload is
    exactly the permutation that sorts the input.
    """
    orig = jnp.asarray(orig_keys)
    gathered = jnp.take(orig, jnp.asarray(sorted_rids).astype(jnp.int32))
    return bool(jnp.all(gathered == jnp.asarray(sorted_keys)))
