"""Colorspace conversions (reference colorspace_conversions.hh:9-87).

Whole-image fused ops; the border region is converted too (the reference
iterates domain_with_border).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.image import Image2d


def rgb_to_graylevel(img: Image2d, dtype=None) -> Image2d:
    """gray = (r + g + b) / 3 (colorspace_conversions.hh:9-20).

    Accepts 3- or 4-channel images (alpha ignored, :35-47). Integer inputs
    accumulate in a wider type before the divide, like plus_promotion.
    """
    a = img.data
    assert a.ndim == 3 and a.shape[2] in (3, 4)
    rgb = a[..., :3]
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        g = jnp.sum(rgb.astype(jnp.int32), axis=-1) // 3
    else:
        g = jnp.sum(rgb, axis=-1) / 3
    out_dtype = dtype if dtype is not None else img.dtype
    return Image2d(data=g.astype(out_dtype), border=img.border)


def graylevel_to_rgb(img: Image2d) -> Image2d:
    """Replicate gray into 3 channels (colorspace_conversions.hh:49-61)."""
    a = img.data
    assert a.ndim == 2
    return Image2d(data=jnp.stack([a, a, a], axis=-1), border=img.border)


def hsv_to_rgb(h, s, v) -> jax.Array:
    """Vectorised HSV→RGB matching the reference's sector formula
    (colorspace_conversions.hh:63-85): h in degrees [0, 360), s, v in [0, 1];
    returns uint8 RGB with the same leading shape as ``h`` plus (3,)."""
    h = jnp.asarray(h, jnp.float32)
    s = jnp.asarray(s, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    c = s * v
    h2 = h / 60.0
    x = c * (1 - jnp.abs(jnp.mod(h2, 2) - 1))
    C = (c * 255).astype(jnp.uint8)
    X = (x * 255).astype(jnp.uint8)
    Z = jnp.zeros_like(C)
    sector = jnp.clip(h2.astype(jnp.int32), 0, 6)
    # sectors 0..5 → (C,X,0),(X,C,0),(0,C,X),(0,X,C),(X,0,C),(C,0,X); 6 → 0
    r = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4, sector == 5], [C, X, Z, Z, X, C], Z)
    g = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4, sector == 5], [X, C, C, X, Z, Z], Z)
    b = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4, sector == 5], [Z, Z, X, C, C, X], Z)
    return jnp.stack([r, g, b], axis=-1)
