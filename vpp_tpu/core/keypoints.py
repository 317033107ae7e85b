"""Fixed-capacity keypoint set — the TPU form of ``keypoint_container``.

Capability parity with /root/reference/vpp/core/keypoint_container.hh:27-90 /
.hpp:10-187 and keypoint_trajectory.hh:11-70:

* per-keypoint state {position, velocity, age} (keypoint_container.hh:12-25);
  ``age == 0`` means dead (``die()``).
* ``add`` / ``remove`` / ``move`` keep a spatial occupancy structure
  consistent (the reference's image2d<int> index2d_).
* ``compact()`` drops dead keypoints and yields an old→new index mapping used
  by ``sync_attributes`` to permute parallel arrays (e.g. trajectories),
  with dead entries signalled (keypoint_container.hpp:20-111).

TPU-native: a static-capacity struct-of-arrays pytree. Death is a mask, not
a resize; ``compact`` is a stable alive-first permutation (argsort of
liveness); spawn fills dead slots. The spatial index is rebuilt on demand as
a scatter of slot ids into an (H, W) grid — functional, race-free, identical
role to index2d_. Everything jits with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Keypoints:
    """SoA keypoint set of static capacity K."""

    position: jax.Array   # (K, 2) float32, (row, col)
    velocity: jax.Array   # (K, 2) float32
    age: jax.Array        # (K,) int32; 0 = dead

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def alive(self) -> jax.Array:
        return self.age > 0

    def size(self) -> jax.Array:
        """Number of live keypoints (keypoint_container::size)."""
        return jnp.sum(self.alive.astype(jnp.int32))


def keypoints_empty(capacity: int) -> Keypoints:
    return Keypoints(position=jnp.zeros((capacity, 2), jnp.float32),
                     velocity=jnp.zeros((capacity, 2), jnp.float32),
                     age=jnp.zeros((capacity,), jnp.int32))


def keypoints_from_positions(pos: jax.Array, valid: jax.Array) -> Keypoints:
    """Build from detector output; invalid slots are dead."""
    k = pos.shape[0]
    return Keypoints(position=pos.astype(jnp.float32),
                     velocity=jnp.zeros((k, 2), jnp.float32),
                     age=valid.astype(jnp.int32))


def kp_move(kps: Keypoints, i, new_pos) -> Keypoints:
    """move(i, pos): update position + velocity (keypoint_container.hpp
    :153-167). ``i`` may be an index array; batched update."""
    new_pos = jnp.asarray(new_pos, jnp.float32)
    vel = new_pos - kps.position[i]
    return kps.replace(position=kps.position.at[i].set(new_pos),
                       velocity=kps.velocity.at[i].set(vel),
                       age=kps.age.at[i].add(1))


def kp_move_all(kps: Keypoints, new_pos: jax.Array,
                ok: jax.Array) -> Keypoints:
    """Vectorised per-slot move/remove: slots with ``ok`` move to
    ``new_pos`` and age; slots without die (the semi-dense-flow callback in
    video_extruder.hpp:45-56 does exactly this per keypoint)."""
    ok = ok & kps.alive
    pos = jnp.where(ok[:, None], new_pos.astype(jnp.float32), kps.position)
    vel = jnp.where(ok[:, None], pos - kps.position, kps.velocity)
    age = jnp.where(ok, kps.age + 1, jnp.where(kps.alive, 0, kps.age))
    return Keypoints(position=pos, velocity=vel, age=age)


def kp_remove(kps: Keypoints, i) -> Keypoints:
    """die() — mask out slot(s) i."""
    return kps.replace(age=kps.age.at[i].set(0))


def kp_kill_where(kps: Keypoints, dead_mask: jax.Array) -> Keypoints:
    return kps.replace(age=jnp.where(dead_mask, 0, kps.age))


def kp_compact(kps: Keypoints) -> Tuple[Keypoints, jax.Array]:
    """Stable alive-first compaction.

    Returns (compacted, matches) where ``matches[old_slot] = new_slot`` or
    -1 if dead — exactly the reference's matches_ mapping
    (keypoint_container.hpp:20-53). Use ``sync_attributes`` to permute
    parallel arrays.
    """
    k = kps.capacity
    alive = kps.alive
    # stable: order by (dead, original index)
    order = jnp.argsort(jnp.where(alive, 0, 1) * k +
                        jnp.arange(k, dtype=jnp.int32))
    compacted = jax.tree_util.tree_map(lambda a: a[order], kps)
    # matches: position of old index in the new ordering, -1 for dead
    inv = jnp.zeros((k,), jnp.int32).at[order].set(
        jnp.arange(k, dtype=jnp.int32))
    matches = jnp.where(alive, inv, -1)
    return compacted, matches


def sync_attributes(attr: jax.Array, matches: jax.Array,
                    fill_value=0) -> jax.Array:
    """Permute a parallel per-keypoint array through a compact() mapping
    (keypoint_container.hpp:64-111). ``attr`` leading dim = capacity.
    New slots (unmapped) get ``fill_value``."""
    k = matches.shape[0]
    out = jnp.full_like(attr, fill_value)
    # dead entries scatter out-of-range and are dropped
    idx = jnp.where(matches >= 0, matches, k)
    return out.at[idx].set(attr, mode="drop")


def kp_add(kps: Keypoints, new_pos: jax.Array,
           new_valid: jax.Array) -> Keypoints:
    """Spawn up to N new keypoints into dead slots (add(),
    keypoint_container.hpp:113-137). New keypoints start with age 1.

    Dead slots are assigned in slot order; excess candidates are dropped
    (the fixed budget is the TPU analogue of the reference's unbounded
    vector — callers size capacity generously).
    """
    k = kps.capacity
    n = new_pos.shape[0]
    dead = ~kps.alive
    # rank of each dead slot among dead slots
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    # rank of each candidate among valid candidates
    cand_rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    n_valid = jnp.sum(new_valid.astype(jnp.int32))
    # slot i takes candidate cand_index where cand has rank == dead_rank[i]
    # build mapping candidate_rank -> candidate_index
    cand_by_rank = jnp.zeros((n,), jnp.int32).at[
        jnp.where(new_valid, cand_rank, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    take = dead & (dead_rank < n_valid)
    src = cand_by_rank[jnp.clip(dead_rank, 0, n - 1)]
    pos = jnp.where(take[:, None], new_pos.astype(jnp.float32)[src],
                    kps.position)
    vel = jnp.where(take[:, None], 0.0, kps.velocity)
    age = jnp.where(take, 1, kps.age)
    return Keypoints(position=pos, velocity=vel, age=age)


def occupancy_grid(kps: Keypoints, shape: Tuple[int, int],
                   cell: int = 1) -> jax.Array:
    """(H//cell, W//cell) int32 grid of slot ids (+1), 0 = empty — the
    reference's index2d_ spatial hash (keypoint_container.hpp:10-18), built
    functionally by scatter. Later keypoints win collisions."""
    h, w = shape
    gh, gw = -(-h // cell), -(-w // cell)
    r = jnp.clip((kps.position[:, 0] / cell).astype(jnp.int32), 0, gh - 1)
    c = jnp.clip((kps.position[:, 1] / cell).astype(jnp.int32), 0, gw - 1)
    ids = jnp.where(kps.alive, jnp.arange(kps.capacity, dtype=jnp.int32) + 1,
                    0)
    grid = jnp.zeros((gh, gw), jnp.int32)
    return grid.at[r, c].max(ids)
