"""TPU array-layout guard.

TPU HBM tiling T(8, 128) pads the minor dimension of every >= 2-D array up
to the 128-lane tile (and the second-minor up to 8 sublanes). A large
resident array with 1 < minor dim < 128 is therefore *billed* at up to
128/minor x its logical bytes: the round-2 bench shipped a [2^27, 4] int32
bucket table whose 2 GiB of data compiled to a 64 GiB allocation
(`s32[134217728,4]{1,0:T(8,128)}`) and OOM-crashed the 16 GiB chip — the
exact trap ops/count.py already documents for (1, 2^k) tables.

The rule enforced here: every *resident* device structure (count tables,
direct map, rank map, bitmaps) must be 1-D, or have a minor dim that is a
multiple of 128 (full lanes) — checked at build time, where the fix is a
design change, not at compile time on the deliverable hardware, where it is
a red bench. Small arrays are exempt: padding waste only matters at scale.
"""

from __future__ import annotations

import math

# arrays smaller than this (logical bytes) may pad freely — the absolute
# waste is bounded by 128x this value, i.e. ~128 MB worst case
MIN_GUARDED_BYTES = 1 << 20

_SUBLANE = 8
_LANE = 128


class LayoutError(ValueError):
    pass


def padded_ratio(shape, itemsize: int = 4) -> float:
    """Estimated billed/logical byte ratio under T(8, 128) tiling.

    1-D arrays tile as (pseudo 2-D) full-lane vectors — no meaningful
    padding. For >= 2-D, the minor dim pads to 128 and the second-minor to
    8 (smaller dtypes pack more sublanes; this uses the conservative f32/i32
    tile, which is what the 4-byte tables here use)."""
    if len(shape) <= 1:
        return 1.0
    logical = math.prod(shape)
    if logical == 0:
        return 1.0
    minor = -(-shape[-1] // _LANE) * _LANE
    second = -(-shape[-2] // _SUBLANE) * _SUBLANE
    billed = math.prod(shape[:-2]) * second * minor
    return billed / logical


def assert_lane_efficient(x, name: str, max_ratio: float = 1.5,
                          min_bytes: int = MIN_GUARDED_BYTES) -> None:
    """Raise LayoutError if a resident array's TPU tiling would bill it at
    more than `max_ratio` x its logical size. Accepts jax arrays, numpy
    arrays, or anything with .shape/.dtype."""
    shape = tuple(getattr(x, "shape", ()))
    itemsize = getattr(getattr(x, "dtype", None), "itemsize", 4)
    logical = math.prod(shape) * itemsize if shape else itemsize
    if logical < min_bytes:
        return
    r = padded_ratio(shape, itemsize)
    if r > max_ratio:
        raise LayoutError(
            f"{name}: shape {shape} would be billed ~{r:.0f}x its logical "
            f"{logical / (1 << 30):.2f} GiB under TPU T(8,128) tiling — "
            f"keep resident tables 1-D (or minor dim a multiple of 128). "
            f"See localhgt_tpu/utils/layout.py and the round-2 bench OOM.")
