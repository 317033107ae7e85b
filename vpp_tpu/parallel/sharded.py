"""Spatially/data-sharded front-end ops over a device mesh.

TPU-native multi-chip layer (no reference counterpart — vpp is single
process). Patterns:

* column-sharded stencils with explicit halo exchange over the 'sp' mesh
  axis via ``ppermute`` (ICI neighbour traffic only);
* data-parallel batched tracker steps over 'dp';
* reductions via ``psum``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.image import Image2d, from_array
from ..algorithms.fast import fast9_score
from ..algorithms.video_extruder import (VideoExtruderConfig,
                                         video_extruder_init,
                                         video_extruder_update)


def halo_exchange_cols(local: jax.Array, halo: int,
                       axis: str) -> jax.Array:
    """Concatenate ``halo`` columns from ring neighbours on both sides.

    Ring (wraparound) exchange over the mesh axis; callers mask or mirror
    the outermost shards if open boundaries are needed.
    """
    n = jax.lax.axis_size(axis)
    right_edge = local[:, -halo:]
    left_edge = local[:, :halo]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(right_edge, axis, fwd)
    from_right = jax.lax.ppermute(left_edge, axis, bwd)
    return jnp.concatenate([from_left, local, from_right], axis=1)


def sharded_fast9_score(mesh: Mesh, frame: jax.Array, th: int) -> jax.Array:
    """Total FAST score of a frame, columns sharded over 'sp': each shard
    scores its slice using a 3-column halo from its neighbours, then the
    partial sums psum over ICI."""
    halo = 3

    @partial(shard_map, mesh=mesh, in_specs=P(None, "sp"), out_specs=P())
    def run(local):
        padded = halo_exchange_cols(local, halo, "sp")
        img = from_array(padded, border=3, border_mode="mirror")
        s = fast9_score(img, th)[:, halo:-halo]
        return jax.lax.psum(jnp.sum(s), "sp")

    return run(frame)


def sharded_tracker_batch_step(mesh: Mesh, frames1: jax.Array,
                               frames2: jax.Array) -> jax.Array:
    """One tracker step per batch element, batch sharded over 'dp'.
    Returns per-element live-keypoint counts."""
    cfg = VideoExtruderConfig(capacity=64, detect_k=32, nscales=2,
                              winsize=7, keypoint_spacing=8,
                              detector_period=1)
    b = max(3, cfg.winsize)

    @partial(shard_map, mesh=mesh, in_specs=(P("dp"), P("dp")),
             out_specs=P("dp"))
    def run(f1, f2):
        def one(a, bfr):
            st = video_extruder_init(cfg)
            st = video_extruder_update(
                st, from_array(a, border=b, border_mode="mirror"),
                from_array(bfr, border=b, border_mode="mirror"), cfg)
            return st.keypoints.alive.sum()

        return jax.vmap(one)(f1, f2)

    return run(frames1, frames2)
