"""Static neighbourhood windows (reference window.hh:26-61).

``c4/c5/c8/c9`` are the classic connectivity offset sets. ``window_stack``
gathers all neighbours of every pixel at once as a stacked array — the
vectorised form of ``foreach(window) | f``.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..core.image import Image2d

# Offsets (dr, dc), matching window.hh:39-61.
C4: List[Tuple[int, int]] = [(-1, 0), (0, -1), (0, 1), (1, 0)]
C5: List[Tuple[int, int]] = [(-1, 0), (0, -1), (0, 0), (0, 1), (1, 0)]
C8: List[Tuple[int, int]] = [(-1, -1), (-1, 0), (-1, 1),
                             (0, -1), (0, 1),
                             (1, -1), (1, 0), (1, 1)]
C9: List[Tuple[int, int]] = [(-1, -1), (-1, 0), (-1, 1),
                             (0, -1), (0, 0), (0, 1),
                             (1, -1), (1, 0), (1, 1)]


def window_foreach(window, fn):
    """Host-side iteration over window offsets (window.hh:26-36)."""
    for off in window:
        fn(off)


def window_stack(img: Image2d, window) -> jax.Array:
    """Stack every neighbour view: (len(window), H, W[, C]).

    XLA fuses the shifted slices; downstream reductions over axis 0 become
    one pass (e.g. min over C8 = erosion).
    """
    return jnp.stack([img.shifted(dr, dc) for dr, dc in window], axis=0)
