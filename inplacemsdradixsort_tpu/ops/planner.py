"""Pass planner — the ``schedule_passes`` analog.

The reference plans its local MSD passes by data size against a cache
threshold, choosing per-pass radix widths and in-cache vs. buffered variants
(reference: /root/reference/src/msb_64.c:1334-1400, cache_limit=6500 at
:1338).  The TPU analog plans *distribution levels*: how many range-partition
levels (and their fan-outs) are needed before every bucket fits the largest
chunk we sort entirely inside VMEM, plus the expected tile geometry per level.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

from ..config import SortConfig


@dataclasses.dataclass(frozen=True)
class LevelPlan:
    """One distribution level."""
    range_bits: int          # log2 fan-out of this level
    tile_elems: int          # tile size used for run formation


@dataclasses.dataclass(frozen=True)
class SortPlan:
    levels: List[LevelPlan]  # distribution levels, outermost first
    vmem_sort_elems: int     # terminal bucket size sorted fully on-chip

    @property
    def total_fanout(self) -> int:
        return 1 << sum(l.range_bits for l in self.levels)


def schedule_levels(n: int, cfg: SortConfig) -> SortPlan:
    """Plan distribution levels for ``n`` keys.

    Analog of ``schedule_passes(size, bits, ...)`` (msb_64.c:1334-1400): the
    reference splits ``ceil_log(size / cache_limit)`` bits across 1-3 passes
    of bounded width; we split ``ceil_log(n / vmem_sort_elems)`` bits across
    levels of at most ``cfg.range_bits`` each.  Returns an empty level list
    when the input already fits in VMEM (the in-cache fast path).
    """
    v = cfg.vmem_sort_elems
    if n <= v:
        return SortPlan(levels=[], vmem_sort_elems=v)
    need_bits = max(1, math.ceil(math.log2(n / v)))
    width = cfg.range_bits
    num_levels = math.ceil(need_bits / width)
    # spread bits evenly like the reference's 2/3-way splits
    # (msb_64.c:1367-1380)
    base = need_bits // num_levels
    extra = need_bits - base * num_levels
    levels = [
        LevelPlan(
            range_bits=base + (1 if i < extra else 0),
            tile_elems=cfg.tile_elems,
        )
        for i in range(num_levels)
    ]
    return SortPlan(levels=levels, vmem_sort_elems=v)
