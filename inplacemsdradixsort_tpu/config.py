"""Typed configuration for the TPU radix partition/sort engine.

The reference exposes its tuning knobs as compile-time constants and the
``sort()`` parameters ``threads, numa, fudge`` (reference:
/root/reference/include/msb_64.h:37-39, /root/reference/src/msb_64.c:2266-2322).
Here every knob is a field of one dataclass, with the reference values as
defaults where they translate:

- ``fudge``            <- reference ``fudge`` over-allocation multiplier
                          (msb_64.c:1574-1578, 2170)
- ``range_partitions`` <- ``range_partitions = 128`` (msb_64.c:2268); we default
                          to 256 ranges per distribution level (one byte).
- ``sample_rate`` / ``sample_cap`` <- 0.005 * N capped at 500k
                          (msb_64.c:2320-2322)
- ``block_cap``        <- 4096-tuple exchange blocks (msb_64.c:2314); on TPU the
                          analogous unit is ``block_rows`` rows of 128 lanes.
- ``vmem_sort_elems``  <- the ``cache_limit = 6500`` in-cache threshold of
                          ``schedule_passes`` (msb_64.c:1338) becomes the
                          largest chunk sorted entirely inside VMEM.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Configuration for single-chip and distributed radix sort."""

    # --- data layout ---
    lanes: int = 128              # TPU lane count; last-dim tiling unit
    tile_elems: int = 1 << 15     # elements per VMEM tile for tile-local sort
    block_rows: int = 8           # rows per DMA chunk in the distribute kernel

    # --- partitioning / planner ---
    range_bits: int = 8           # log2(ranges) per distribution level
    fudge: float = 1.125          # per-range over-allocation slack
    sample_rate: float = 0.005    # sample fraction of N (msb_64.c:2320)
    sample_cap: int = 500_000     # max sample size       (msb_64.c:2321-2322)
    use_sample_splitters: bool = True   # hybrid sample+radix delimiters
    vmem_sort_elems: int = 1 << 18      # bucket size sortable fully in VMEM

    # --- v3/v4 engine geometry (None = auto) ---
    # rows per level tile-sort (x128 lanes, pow2).  1024 beats 2048 by
    # ~9% on chip: the level network is log2(E)(log2(E)+1)/2 stages
    # (153 vs 171) and the extra phantom-pad cost at the smaller pitch
    # is ~3% (geom sweep r4, benchmarks/geom_sweep_v4.py)
    v3_sort_rows: int = 1024
    v3_rmax: Optional[int] = None     # ranges per parent per level
    v3_cap_rows: Optional[int] = None  # terminal bucket capacity rows

    # --- LSB engine ---
    lsb_digit_bits: int = 8       # digit width per LSB pass (msb_64.c:1533)

    # --- v5 in-place engine geometry (None = auto) ---
    # L1 tile rows for the sequential-block partition (rows x 128 must be
    # a power of two; the tile is network-sorted whole)
    v5_pitch_rows: Optional[int] = None
    # L2 scratch budget as a fraction of the input blocks: regions are
    # batched so each batch's blocks fit ceil(frac * total) (the ``fudge``
    # slack contract reborn as a bounded scratch arena, msb_64.h:39)
    v5_batch_frac: float = 0.25

    # below this size the engines dispatch straight to XLA sort (the
    # insertion-sort-tier analog, msb_64.c:1011-1014); None = per-engine
    # default.  Tests lower it to exercise the pipeline at tiny n.
    min_engine_n: Optional[int] = None

    # plan the bound/terminal tables ON DEVICE inside the fused pipeline
    # (sample -> tables -> levels -> terminal as ONE XLA program): no
    # host round-trip between the sample and the partition levels.
    # False = host-side numpy planner (the dsort per-shard path).
    device_plan: bool = True

    # terminal capacity classes: buckets are binned by occupancy and each
    # class sorts with a network sized to its cap (cap, cap/2, cap/4 ...)
    # — the ``schedule_passes`` pass-sizing idea (msb_64.c:1334-1400)
    # applied to the terminal tier.  1 = single full-cap pass.
    # 3 classes beat 1 by ~3% on chip (geom sweep r4).
    term_classes: int = 3

    # --- engine selection ---
    engine: str = "auto"  # "auto" | "v4" | "v5" | "v3" | "lsb" | "pallas" | "xla"
    interpret: bool = False       # run Pallas kernels in interpreter mode
    debug_checks: bool = False    # in-situ invariant checks (#ifdef BG analog,
                                  # msb_64.c:329-349, 474-495)

    # --- distributed ---
    mesh_axes: Tuple[str, ...] = ("shard",)
    exchange_fudge: float = 2.0   # padding factor for the all-to-all exchange
    # segment-packed lax.ragged_all_to_all exchange (exact wire bytes
    # under skew); False = dense exact-cap all_to_all + compaction
    ragged_exchange: bool = True
    # fuse the ragged exchange with the local sort into ONE program:
    # each landed ppermute round's exact L1 histogram contribution is
    # accumulated while the next round's collective is in flight, and
    # the local pipeline runs with that hist injected — no post-
    # exchange sampling and no separate L1 sweep (SURVEY §2.6 item 4 /
    # §5.8 exchange/compute overlap).  Local bounds come from each
    # shard's window of the replicated global sample.
    overlap_exchange: bool = False

    def __post_init__(self):
        assert self.tile_elems % self.lanes == 0
        assert 1 <= self.range_bits <= 12
        assert self.fudge >= 1.0

    @property
    def num_ranges(self) -> int:
        return 1 << self.range_bits

    @property
    def tile_rows(self) -> int:
        return self.tile_elems // self.lanes


DEFAULT_CONFIG = SortConfig()
