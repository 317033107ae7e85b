"""3x3 Scharr gradient (reference /root/reference/vpp/algorithms/filters/
scharr.hh:45-87).

gx (vertical diff, row3 - row1) and gy (horizontal diff, col+1 - col-1) with
(3, 10, 3)/32 weights — note the reference's component order: out[0] is the
*row* gradient, out[1] the *column* gradient.

One fused XLA stencil over the whole image; returns a 2-channel float image.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.image import Image2d, from_array


def scharr(img: Image2d) -> Image2d:
    """Full-image Scharr; needs border >= 1. Output channels (gr, gc)."""
    assert img.border >= 1

    def n(dr, dc):
        return img.shifted(dr, dc).astype(jnp.float32)

    gr = (3 * n(1, -1) + 10 * n(1, 0) + 3 * n(1, 1)
          - 3 * n(-1, -1) - 10 * n(-1, 0) - 3 * n(-1, 1)) / 32.0
    gc = (3 * n(-1, 1) + 10 * n(0, 1) + 3 * n(1, 1)
          - 3 * n(-1, -1) - 10 * n(0, -1) - 3 * n(1, -1)) / 32.0
    return from_array(jnp.stack([gr, gc], axis=-1))


def scharr_point(img: Image2d, p) -> jnp.ndarray:
    """Single-point Scharr (scharr.hh:10-43); p = (row, col) interior."""
    b = img.border
    r, c = p[0] + b, p[1] + b
    d = img.data.astype(jnp.float32)
    gr = (3 * d[r + 1, c - 1] + 10 * d[r + 1, c] + 3 * d[r + 1, c + 1]
          - 3 * d[r - 1, c - 1] - 10 * d[r - 1, c] - 3 * d[r - 1, c + 1]) / 32.0
    gc = (3 * d[r - 1, c + 1] + 10 * d[r, c + 1] + 3 * d[r + 1, c + 1]
          - 3 * d[r - 1, c - 1] - 10 * d[r, c - 1] - 3 * d[r + 1, c - 1]) / 32.0
    return jnp.stack([gr, gc])
