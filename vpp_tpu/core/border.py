"""Border fills — bulk, functional, vectorised.

Semantics match the reference cell-for-cell (fill.hh:31-123, validated the
same way tests/border.cc does):

* value:   every border cell gets a constant.
* mirror:  cell at interior-relative coord ``-k`` reads interior ``k-1``
           (symmetric reflection *including* the edge pixel) — fill.hh:47-85.
* closest: clamp-to-edge — fill.hh:88-123.

On TPU these are single ``jnp.pad`` / mask ops over the whole buffer, not
eight per-region loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from .image import Image2d


def _repad(img: Image2d, mode: str, value=0) -> Image2d:
    b = img.border
    if b == 0:
        return img
    interior = img.interior
    pad = [(b, b), (b, b)] + [(0, 0)] * (interior.ndim - 2)
    if mode == "constant":
        data = jnp.pad(interior, pad, mode="constant", constant_values=value)
    else:
        data = jnp.pad(interior, pad, mode=mode)
    return Image2d(data=data, border=b)


def fill(img: Image2d, value) -> Image2d:
    """Fill the interior (fill.hh:11-15). Border content preserved."""
    return img.with_interior(jnp.full(img.interior.shape, value,
                                      dtype=img.dtype))


def fill_with_border(img: Image2d, value) -> Image2d:
    """Fill interior + border (fill.hh:23-28)."""
    return Image2d(data=jnp.full(img.data.shape, value, dtype=img.dtype),
                   border=img.border)


def fill_border_with_value(img: Image2d, value) -> Image2d:
    """fill.hh:31-45."""
    return _repad(img, "constant", value)


def fill_border_mirror(img: Image2d) -> Image2d:
    """fill.hh:47-85 — symmetric reflection including edge."""
    return _repad(img, "symmetric")


def fill_border_closest(img: Image2d) -> Image2d:
    """fill.hh:88-123 — clamp to nearest edge pixel."""
    return _repad(img, "edge")


def copy(src: Image2d, dst: Image2d) -> Image2d:
    """Interior copy into dst's geometry (copy.hh:9-14)."""
    assert src.shape == dst.shape
    return dst.with_interior(src.interior.astype(dst.dtype))


def copy_with_border(src: Image2d, dst: Image2d) -> Image2d:
    """copy.hh:17-27 — copies the border region too (borders must match)."""
    assert src.border == dst.border and src.shape == dst.shape
    return Image2d(data=src.data.astype(dst.dtype), border=dst.border)


def clone(img: Image2d, *, border: int | None = None,
          border_mode: str = "zero") -> Image2d:
    """Deep copy with optional border override (clone.hh:9-21)."""
    from .image import from_array
    b = img.border if border is None else border
    return from_array(img.interior, border=b, border_mode=border_mode)
