"""Keypoint container semantics: add/move/remove/compact/sync_attributes
(reference keypoint_container.hpp behavior, masked fixed-capacity form)."""

import jax.numpy as jnp
import numpy as np

from vpp_tpu.core.keypoints import (Keypoints, keypoints_empty,
                                    keypoints_from_positions, kp_add,
                                    kp_compact, kp_kill_where, kp_move,
                                    kp_move_all, kp_remove, occupancy_grid,
                                    sync_attributes)


def test_add_into_dead_slots():
    kps = keypoints_empty(4)
    new = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    kps = kp_add(kps, new, jnp.array([True, True]))
    assert int(kps.size()) == 2
    np.testing.assert_array_equal(np.asarray(kps.position[:2]),
                                  [[1, 2], [3, 4]])
    np.testing.assert_array_equal(np.asarray(kps.age[:2]), [1, 1])


def test_add_skips_invalid_and_respects_capacity():
    kps = keypoints_empty(2)
    new = jnp.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    kps = kp_add(kps, new, jnp.array([False, True, True]))
    assert int(kps.size()) == 2
    np.testing.assert_array_equal(np.asarray(kps.position),
                                  [[2, 2], [3, 3]])


def test_add_fills_holes():
    kps = keypoints_from_positions(
        jnp.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]]),
        jnp.array([True, True, True]))
    kps = kp_remove(kps, 1)
    kps = kp_add(kps, jnp.array([[9.0, 9.0]]), jnp.array([True]))
    assert int(kps.size()) == 3
    np.testing.assert_array_equal(np.asarray(kps.position[1]), [9, 9])
    assert int(kps.age[1]) == 1


def test_move_updates_velocity_and_age():
    kps = keypoints_from_positions(jnp.array([[5.0, 5.0]]),
                                   jnp.array([True]))
    kps = kp_move(kps, 0, jnp.array([7.0, 4.0]))
    np.testing.assert_array_equal(np.asarray(kps.velocity[0]), [2, -1])
    assert int(kps.age[0]) == 2


def test_move_all_kills_failures():
    kps = keypoints_from_positions(
        jnp.array([[1.0, 1.0], [2.0, 2.0]]), jnp.array([True, True]))
    kps = kp_move_all(kps, jnp.array([[1.5, 1.5], [0.0, 0.0]]),
                      jnp.array([True, False]))
    assert int(kps.size()) == 1
    assert int(kps.age[1]) == 0


def test_compact_and_sync_attributes():
    kps = keypoints_from_positions(
        jnp.array([[0.0, 0], [1.0, 1], [2.0, 2], [3.0, 3]]),
        jnp.array([True, True, True, True]))
    kps = kp_kill_where(kps, jnp.array([False, True, False, True]))
    compacted, matches = kp_compact(kps)
    np.testing.assert_array_equal(np.asarray(matches), [0, -1, 1, -1])
    np.testing.assert_array_equal(np.asarray(compacted.position[:2]),
                                  [[0, 0], [2, 2]])
    assert int(compacted.size()) == 2
    # trajectories-style parallel array follows the permutation
    attr = jnp.array([10, 11, 12, 13])
    synced = sync_attributes(attr, matches, fill_value=-1)
    np.testing.assert_array_equal(np.asarray(synced), [10, 12, -1, -1])


def test_occupancy_grid():
    kps = keypoints_from_positions(
        jnp.array([[0.0, 0.0], [5.0, 7.0]]), jnp.array([True, True]))
    grid = occupancy_grid(kps, (10, 10), cell=1)
    g = np.asarray(grid)
    assert g[0, 0] == 1 and g[5, 7] == 2
    assert (g != 0).sum() == 2
