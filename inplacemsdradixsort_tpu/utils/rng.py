"""MT19937-64 / MT19937-32 PRNG, bit-compatible with the reference generators.

The reference ships a Mersenne Twister pair used for sampling and (in the
original suite) input generation (reference: /root/reference/src/rand.c:42-131,
/root/reference/src/rand.h:40-47).  This module reproduces the exact bit
streams in vectorized numpy so parity fixtures can be generated without the C
library, and `utils.native` exposes the same generators from `csrc/` for bulk
generation.

Also provides ``mulhi``-style index scaling used by the reference sampler
(msb_64.c:178-186, 1511-1521): ``index = (rand64 * size) >> 64``.
"""

from __future__ import annotations

import numpy as np

_NN = 312
_MM = 156
_MATRIX_A = 0xB5026F5AA96619E9
_UPPER = 0xFFFFFFFF80000000
_LOWER = 0x7FFFFFFF
_U64 = (1 << 64) - 1


class MT19937_64:
    """64-bit Mersenne Twister, identical stream to reference rand64_*."""

    def __init__(self, seed: int):
        mt = np.zeros(_NN, dtype=np.uint64)
        mt[0] = np.uint64(seed & _U64)
        for i in range(1, _NN):
            prev = int(mt[i - 1])
            mt[i] = np.uint64(
                (6364136223846793005 * (prev ^ (prev >> 62)) + i) & _U64
            )
        self._mt = mt
        self._idx = _NN

    def _twist(self):
        # vectorized version of the reference's two do/while loops
        # (rand.c:62-73): x = (mt[i] & UPPER) | (mt[i+1] & LOWER);
        # mt[i] = mt[(i+MM)%NN] ^ (x>>1) ^ (MATRIX_A if x&1 else 0).
        # mt[(i+MM) % NN] must be the *updated* values for i >= NN-MM, so run
        # two passes exactly like the reference.
        out = self._mt.copy()
        for lo, hi in ((0, _NN - _MM), (_NN - _MM, _NN)):
            idx = np.arange(lo, hi)
            x2 = (out[idx] & np.uint64(_UPPER)) | (
                out[(idx + 1) % _NN] & np.uint64(_LOWER)
            )
            xa2 = (x2 >> np.uint64(1)) ^ (
                np.uint64(_MATRIX_A) * (x2 & np.uint64(1))
            )
            out[idx] = out[(idx + _MM) % _NN] ^ xa2
        self._mt = out
        self._idx = 0

    def next_block(self) -> np.ndarray:
        """All 312 tempered outputs of one twist."""
        self._twist()
        y = self._mt.copy()
        y ^= (y >> np.uint64(29)) & np.uint64(0x5555555555555555)
        y ^= (y << np.uint64(17)) & np.uint64(0x71D67FFFEDA60000)
        y ^= (y << np.uint64(37)) & np.uint64(0xFFF7EEE000000000)
        y ^= y >> np.uint64(43)
        return y

    def random_raw(self, n: int) -> np.ndarray:
        blocks = []
        got = 0
        while got < n:
            b = self.next_block()
            blocks.append(b)
            got += b.size
        return np.concatenate(blocks)[:n]


def mt64_stream(seed: int, n: int) -> np.ndarray:
    """First n outputs of the reference rand64 stream (rand.c:47-86)."""
    return MT19937_64(seed).random_raw(n)


_U32 = (1 << 32) - 1


class MT19937_32:
    """32-bit Mersenne Twister, identical stream to reference rand32_*
    (rand.c:88-131).

    The reference variant is NON-standard: seeding multiplies by
    0x6c078965 without the usual ``+ i`` term (rand.c:98-100), and the
    state carries 625 words, the last mirroring the updated ``n[0]``
    during the second twist loop (rand.c:115).  Both quirks are
    reproduced exactly.
    """

    _N = 624
    _M = 397
    _MAT = np.uint32(0x9908B0DF)
    _UP = np.uint32(0x80000000)
    _LOW = np.uint32(0x7FFFFFFF)

    def __init__(self, seed: int):
        n = np.zeros(625, dtype=np.uint32)
        n[0] = np.uint32(seed & _U32)
        for i in range(623):
            prev = int(n[i])
            n[i + 1] = np.uint32(
                (0x6C078965 * (prev ^ (prev >> 30))) & _U32
            )
        self._n = n

    def _twist(self):
        n = self._n
        old = n.copy()
        one = np.uint32(1)

        def mix(y, src):
            return src ^ (y >> one) ^ (self._MAT * (y & one))

        # pass 1: i in [0, 227)  (rand.c:108-113)
        y = (old[0:227] & self._UP) + (old[1:228] & self._LOW)
        n[0:227] = mix(y, old[397:624])
        n[624] = n[0]                                # rand.c:115
        # pass 2a: i in [227, 454) — n[i-227] already updated by pass 1
        y = (old[227:454] & self._UP) + (old[228:455] & self._LOW)
        n[227:454] = mix(y, n[0:227])
        # pass 2b: i in [454, 624) — n[i+1] at i=623 is the new n[624]
        nxt = np.concatenate([old[455:624], n[624:625]])
        y = (old[454:624] & self._UP) + (nxt & self._LOW)
        n[454:624] = mix(y, n[227:397])

    def next_block(self) -> np.ndarray:
        """All 624 tempered outputs of one twist (rand.c:124-130)."""
        self._twist()
        y = self._n[:624].copy()
        y ^= y >> np.uint32(11)
        y ^= (y << np.uint32(7)) & np.uint32(0x9D2C5680)
        y ^= (y << np.uint32(15)) & np.uint32(0xEFC60000)
        y ^= y >> np.uint32(18)
        return y

    def random_raw(self, n: int) -> np.ndarray:
        blocks = []
        got = 0
        while got < n:
            b = self.next_block()
            blocks.append(b)
            got += b.size
        return np.concatenate(blocks)[:n]


def mt32_stream(seed: int, n: int) -> np.ndarray:
    """First n outputs of the reference rand32 stream (rand.c:104-131)."""
    return MT19937_32(seed).random_raw(n)


def mulhi_index(rand64: np.ndarray, size: int) -> np.ndarray:
    """(rand64 * size) >> 64 index scaling (msb_64.c:178-186).

    Maps a uniform 64-bit integer to [0, size) without modulo bias, exactly
    as the reference's inline-asm ``mulq`` helper.
    """
    r = rand64.astype(object)  # python ints for the 128-bit product
    return np.array([(int(x) * size) >> 64 for x in r], dtype=np.uint64)


def uniform_u64(seed: int, n: int) -> np.ndarray:
    """Uniform uint64 keys from the reference-compatible MT stream."""
    return mt64_stream(seed, n)


def uniform_u32(seed: int, n: int) -> np.ndarray:
    """Uniform uint32 keys (low words of the 64-bit stream)."""
    return (mt64_stream(seed, n) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
