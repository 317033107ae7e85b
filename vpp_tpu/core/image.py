"""Bordered 2-D image container — the central data structure.

Capability parity with the reference's ``imageNd<V,2>`` / ``image2d<V>``
(/root/reference/vpp/core/imageNd.hh:16-183, imageNd.hpp:99-362): a pixel
buffer with an explicit *border* region around the logical domain, O(1)
subimage views, and bilinear interpolation.

TPU-native design, NOT a translation:

* The buffer is a single HBM-resident ``jnp`` array of shape
  ``(H + 2b, W + 2b[, C])``. The border is materialised padding — on TPU a
  stencil kernel must read contiguous tiles, so pre-padded borders replace
  per-pixel bounds checks exactly as in the reference, but the *fill* is a
  bulk vectorised op, never a loop.
* The reference's pitch/alignment machinery (imageNd.hpp:151-196) has no
  user-facing role here: XLA lays arrays out in (8,128)-tiled form itself.
  We keep an optional ``pad_to`` helper for kernels that want lane-aligned
  widths.
* Copies are functional: ``Image2d`` is an immutable pytree; "mutation"
  returns a new image sharing nothing. The reference's shared-ptr aliasing
  (imageNd.hpp:77-87) is replaced by XLA's copy elision + donation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .box import Box2d


@struct.dataclass
class Image2d:
    """Immutable bordered image.

    ``data`` has shape ``(nrows + 2*border, ncols + 2*border)`` or
    ``(..., C)`` for multi-channel. ``border`` is static (trace-time)
    metadata, like the reference's ``border_`` (imageNd.hh:36).
    """

    data: jax.Array
    border: int = struct.field(pytree_node=False, default=0)

    # -- geometry ----------------------------------------------------------
    @property
    def nrows(self) -> int:
        return self.data.shape[0] - 2 * self.border

    @property
    def ncols(self) -> int:
        return self.data.shape[1] - 2 * self.border

    @property
    def nchannels(self) -> int:
        return 1 if self.data.ndim == 2 else self.data.shape[2]

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def dtype(self):
        return self.data.dtype

    def domain(self) -> Box2d:
        """Logical domain, border excluded (imageNd.hh:82)."""
        return Box2d(0, 0, self.nrows - 1, self.ncols - 1)

    def domain_with_border(self) -> Box2d:
        return self.domain().grow(self.border)

    # -- views -------------------------------------------------------------
    @property
    def interior(self) -> jax.Array:
        """The logical (border-free) pixel array."""
        b = self.border
        if b == 0:
            return self.data
        return self.data[b:-b, b:-b]

    def with_interior(self, values: jax.Array) -> "Image2d":
        """Return a new image whose interior is ``values`` (border kept)."""
        b = self.border
        if b == 0:
            return Image2d(data=jnp.asarray(values), border=0)
        new = jax.lax.dynamic_update_slice(
            self.data, values.astype(self.data.dtype),
            (b, b) + (0,) * (self.data.ndim - 2))
        return Image2d(data=new, border=b)

    def shifted(self, dr: int, dc: int) -> jax.Array:
        """Interior-shaped view shifted by (dr, dc) into the border.

        The TPU-native replacement for the reference's ``relative_access``
        neighbour reads (relative_accessor.hh:26-33): a static slice of the
        padded buffer that XLA fuses into the consuming elementwise op.
        Requires ``|dr|,|dc| <= border``.
        """
        b = self.border
        assert abs(dr) <= b and abs(dc) <= b, (
            f"shift ({dr},{dc}) exceeds border {b}")
        r0, c0 = b + dr, b + dc
        return jax.lax.slice(
            self.data,
            (r0, c0) + (0,) * (self.data.ndim - 2),
            (r0 + self.nrows, c0 + self.ncols) + self.data.shape[2:])

    def subimage(self, box: Box2d) -> "Image2d":
        """Domain-restricted view (imageNd.hpp:323-362).

        Like the reference's view, the subimage KEEPS the full parent
        border: pixels beyond the box edge stay reachable and hold the
        parent's actual neighbouring content (interior pixels of the
        parent where the box is interior, parent border pixels at the
        image edge) — so stencils on a subimage read exactly what they
        would read on the parent. The parent buffer always has
        ``border`` real pixels beyond any in-domain box, so this is a
        plain wider slice."""
        b = self.border
        sl = self.data[box.r1: box.r2 + 1 + 2 * b,
                       box.c1: box.c2 + 1 + 2 * b]
        return Image2d(data=sl, border=b)

    def __or__(self, box: Box2d) -> "Image2d":
        """``img | box`` subimage operator (imageNd.hh:173-177)."""
        return self.subimage(box)

    # -- element access (host/debug only) -----------------------------------
    def __call__(self, r, c):
        """Border-aware pixel read; accepts negative (border) coords."""
        b = self.border
        return self.data[b + r, b + c]

    # -- conversions ---------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.interior)

    def astype(self, dtype) -> "Image2d":
        return Image2d(data=self.data.astype(dtype), border=self.border)


def image2d(nrows: int, ncols: int, *, dtype=jnp.float32, border: int = 0,
            channels: int = 0) -> Image2d:
    """Allocate a zero image (reference image2d ctor, imageNd.hpp:38-52)."""
    shape = (nrows + 2 * border, ncols + 2 * border)
    if channels:
        shape = shape + (channels,)
    return Image2d(data=jnp.zeros(shape, dtype=dtype), border=border)


def from_array(arr, *, border: int = 0, border_mode: str = "zero") -> Image2d:
    """Wrap an (H, W[, C]) array, materialising the border padding.

    ``border_mode``: 'zero' | 'mirror' | 'closest' — initial border content
    (mirror/closest match fill_border_mirror / fill_border_closest semantics,
    reference fill.hh:47-123).
    """
    arr = jnp.asarray(arr)
    if border == 0:
        return Image2d(data=arr, border=0)
    pad = [(border, border), (border, border)] + [(0, 0)] * (arr.ndim - 2)
    mode = {"zero": "constant", "mirror": "symmetric", "closest": "edge"}[
        border_mode]
    return Image2d(data=jnp.pad(arr, pad, mode=mode), border=border)


def pad_to_multiple(arr: jax.Array, row_mult: int = 8,
                    col_mult: int = 128, value=0) -> jax.Array:
    """Pad trailing (H, W) dims up to hardware-tile multiples.

    Plays the role of the reference's row alignment (imageNd.hpp:10-18,
    151-196) for kernels that want (8,128)-aligned extents.
    """
    h, w = arr.shape[0], arr.shape[1]
    ph = (-h) % row_mult
    pw = (-w) % col_mult
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return jnp.pad(arr, pad, constant_values=value)
