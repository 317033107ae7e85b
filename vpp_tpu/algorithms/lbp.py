"""Local binary patterns (reference /root/reference/vpp/algorithms/lbp/
lbp_transform.hh:6-38, lbp_distance.hh:4-14).

Bit order parity with the reference: bits 0..7 are the 8-neighbourhood in
row-major order skipping the centre —
(-1,-1),(-1,0),(-1,+1),(0,-1),(0,+1),(+1,-1),(+1,0),(+1,+1).

Whole-image fused comparison pack on the VPU (8 shifted views, 8 compares,
8 shifts-and-adds → one pass), replacing the reference's OMP+SIMD row loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.image import Image2d, from_array

_OFFSETS = [(-1, -1), (-1, 0), (-1, 1),
            (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1)]


def lbp_transform(img: Image2d) -> Image2d:
    """8-bit LBP code per pixel; needs border >= 1."""
    assert img.border >= 1
    center = img.interior
    code = jnp.zeros(center.shape[:2], dtype=jnp.uint8)
    for bit, (dr, dc) in enumerate(_OFFSETS):
        code = code | ((img.shifted(dr, dc) > center).astype(jnp.uint8)
                       << bit)
    return from_array(code)


def lbp_hamming_distance(a, b) -> jax.Array:
    """Popcount Hamming distance between LBP codes (lbp_distance.hh:4-14).

    Elementwise over arrays of uint8 codes."""
    x = (jnp.asarray(a) ^ jnp.asarray(b)).astype(jnp.uint8)
    # 8-bit popcount via SWAR on the VPU.
    x = x - ((x >> 1) & 0x55)
    x = (x & 0x33) + ((x >> 2) & 0x33)
    return ((x + (x >> 4)) & 0x0F).astype(jnp.int32)
