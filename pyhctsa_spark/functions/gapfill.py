"""Gap-fill for sparse (offset, value) sequences.

Semantics (engine contract, SURVEY.md §4.2): given observed integer
offsets into a dense axis 0..n-1,
  - interior gaps  -> linear interpolation between neighbors,
  - leading gaps   -> backfill from the first observed value,
  - trailing gaps  -> forward-fill from the last observed value.

The reference has no gaps (dense arrays), so this only fires for
corrupted/sparse inputs; the tiers then run on the filled dense series.
Pure numpy, vectorized — used inside the Arrow-batched rollup kernel.
"""

from __future__ import annotations

import numpy as np


def gap_fill(offsets: np.ndarray, values: np.ndarray, n: int) -> np.ndarray:
    """Return the dense length-``n`` float64 series.

    ``offsets`` must be strictly increasing ints in [0, n); ``values``
    aligned observed values. Raises on empty input.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    if offsets.size == 0:
        raise ValueError("cannot gap-fill an empty sequence")
    if offsets.size == n:
        return values.astype(np.float64, copy=False)
    # np.interp: linear interior, clamps to edge values outside the
    # observed range == backfill leading / ffill trailing.
    return np.interp(np.arange(n, dtype=np.float64), offsets.astype(np.float64), values)


def drop_offsets(rng: np.random.Generator, n: int, frac: float) -> np.ndarray:
    """Deterministically choose surviving offsets for corruption fixtures:
    drop ~frac of INTERIOR offsets only — offsets 0 and n-1 always
    survive, so fixtures exercise interior interpolation rather than
    the edge-clamp fill paths."""
    keep = rng.random(n) >= frac
    keep[0] = True
    if n > 1:
        keep[-1] = True
    return np.flatnonzero(keep)
