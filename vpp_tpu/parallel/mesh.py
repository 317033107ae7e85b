"""Device-mesh helpers.

The reference's only parallelism is OpenMP fork-join over image rows
(SURVEY §2.5); the multi-device story here is new, TPU-native design:
images shard spatially ('sp'), frame batches shard over data ('dp'), and
the SLAM back-end shards observations/landmarks over the mesh with ICI
collectives (see vpp_tpu.slam.ba).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, ...], names: Tuple[str, ...],
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    n = int(np.prod(shape))
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    grid = np.array(devs[:n]).reshape(shape)
    return Mesh(grid, names)


def shard_image_cols(mesh: Mesh, arr: jax.Array,
                     axis: str = "sp") -> jax.Array:
    """Place an (H, W...) array column-sharded over ``axis``."""
    spec = P(None, axis)
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, arr: jax.Array, axis: str = "dp") -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))


def distributed_mesh(shape: Tuple[int, ...], names: Tuple[str, ...], *,
                     coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Mesh:
    """Multi-host mesh: initialise ``jax.distributed`` (control plane over
    DCN) and build one global mesh over every chip of every host. Single
    program, no per-host branching: the same jitted step runs on all
    hosts, XLA routes intra-host collectives over ICI and host-crossing
    ones over DCN.

    Launch recipe for BASELINE config 5 (v5e-16, 2 hosts x 8 chips):

        # host 0:
        python my_driver.py --coordinator=HOST0_IP:8476 \\
            --num-processes=2 --process-id=0
        # host 1:
        python my_driver.py --coordinator=HOST0_IP:8476 \\
            --num-processes=2 --process-id=1

    and in the driver::

        mesh = distributed_mesh((16,), ("sp",),
                                coordinator=args.coordinator,
                                num_processes=args.num_processes,
                                process_id=args.process_id)

    On a managed TPU pod runtime (GKE / queued resources) all three
    parameters are auto-discovered: call with none of them and
    ``jax.distributed.initialize()`` is invoked bare. With a single
    process (or num_processes=1) no initialisation happens and this
    reduces to ``make_mesh`` — which is what the driver's virtual-device
    dry run exercises.

    The device order from ``jax.devices()`` enumerates each host's chips
    contiguously, so a 1-D ``('sp',)`` column sharding gives every host a
    contiguous column span: the tracker's halo ``ppermute`` crosses DCN
    only at the two host-boundary shards, everything else rides ICI.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif (coordinator is None and num_processes is None
          and process_id is None and jax.process_count() > 1):
        jax.distributed.initialize()
    return make_mesh(shape, names)


def tracker_comm_report(n_devices: int, h: int, w: int, *, halo: int,
                        capacity: int, spacing: int, ring: int = 8,
                        n_landmarks: Optional[int] = None,
                        dtype_bytes: int = 4) -> dict:
    """Per-device work / per-frame communication volumes for the sharded
    tracker + landmark-sharded BA — the quantities a scaling-efficiency
    measurement compares against wall clock once multi-host hardware
    exists. All entries in bytes (per device, per frame or per BA
    iteration) except the counts.

    Communication inventory (see parallel/sharded_tracker.py and
    slam/ba.py):
      * halo ppermute: 2 neighbour exchanges of (H, halo) frame columns,
        x2 frames per step;
      * flow psum: match (K, 2) f32 + distance (K,) f32 + matched (K,) i32;
      * cull psum: scores (K,) i32;
      * detect all_gather: one (score i32, pos 2xi32) candidate per
        ``spacing`` block of the owned columns;
      * BA psum per iteration: S (R, 6, R, 6) + rhs (R, 6) + cost, f32.
    """
    wl = w // n_devices
    n_blocks_local = (-(-h // spacing)) * (wl // spacing)
    k = capacity
    report = {
        "n_devices": n_devices,
        "owned_cols_per_device": wl,
        "pixels_per_device": h * wl,
        "halo_ppermute_bytes": 2 * 2 * h * halo * dtype_bytes,
        "flow_psum_bytes": k * (2 * 4 + 4 + 4),
        "cull_psum_bytes": k * 4,
        "detect_allgather_bytes": n_blocks_local * 3 * 4,
        "ba_psum_bytes_per_iter": (ring * 6 * ring * 6 + ring * 6 + 1) * 4,
    }
    if n_landmarks is not None:
        report["landmarks_per_device"] = -(-n_landmarks // n_devices)
    report["total_comm_bytes_per_frame"] = (
        report["halo_ppermute_bytes"] + report["flow_psum_bytes"]
        + report["cull_psum_bytes"] + report["detect_allgather_bytes"])
    return report
