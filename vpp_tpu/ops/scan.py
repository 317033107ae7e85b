"""Directional sequential sweeps — the TPU form of ordered ``pixel_wise``.

The reference exposes traversal-order flags ``_left_to_right`` /
``_right_to_left`` / ``_top_to_bottom`` / ``_bottom_to_top`` on pixel_wise
(pixel_wise.hh:27-33) so kernels may carry recurrences along a row or column
(used by distance transforms, distance_transforms.hh:30-76, and the
propagation sweeps of semi-dense flow). On TPU an ordered traversal is a
``lax.scan``: the carried value is an entire row (or column) vector, so the
orthogonal dimension stays lane-parallel — the same dependency structure,
8x128 lanes wide.

``fn(carry, *cols) -> (carry, out)`` where ``carry``/``cols``/``out`` are
(H,)-shaped (column sweeps) or (W,)-shaped (row sweeps) vectors.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.image import Image2d, from_array


def _as_array(x):
    return x.interior if isinstance(x, Image2d) else jnp.asarray(x)


def _sweep(axis: int, reverse: bool, fn: Callable, init, *imgs):
    arrs = [_as_array(i) for i in imgs]
    # Move the scanned axis to the front.
    xs = [jnp.moveaxis(a, axis, 0) for a in arrs]

    def step(carry, slices):
        return fn(carry, *slices)

    carry, out = jax.lax.scan(step, init, tuple(xs), reverse=reverse)
    out = jnp.moveaxis(out, 0, axis)
    return carry, out


def scan_left_to_right(fn, init, *imgs):
    """Carry flows along +columns; carry/slices are (H,) vectors."""
    return _sweep(1, False, fn, init, *imgs)


def scan_right_to_left(fn, init, *imgs):
    return _sweep(1, True, fn, init, *imgs)


def scan_top_to_bottom(fn, init, *imgs):
    """Carry flows along +rows; carry/slices are (W,) vectors."""
    return _sweep(0, False, fn, init, *imgs)


def scan_bottom_to_top(fn, init, *imgs):
    return _sweep(0, True, fn, init, *imgs)


DIRECTIONS = {
    "left_to_right": scan_left_to_right,
    "right_to_left": scan_right_to_left,
    "top_to_bottom": scan_top_to_bottom,
    "bottom_to_top": scan_bottom_to_top,
}


def directional_pixel_wise(direction: str, fn, init, *imgs) -> Image2d:
    """Ordered pixel_wise: returns only the swept output as an Image2d."""
    _, out = DIRECTIONS[direction](fn, init, *imgs)
    return from_array(out)
