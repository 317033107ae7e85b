"""vpp_tpu — a TPU-native image/video processing + SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
Video++ (matt-42/vpp): bordered image containers, fused stencil loop
constructs, image pyramids, FAST9 / LBP / Scharr, pyramidal LK and
semi-dense optical flow, the video-extruder point tracker, descriptor
matching, distance transforms, dense Hough line detection + tracking,
epipolar geometry — plus a distributed SLAM back-end (bundle adjustment,
pose graph) sharded over TPU meshes, which the reference only sketches.
"""

__version__ = "0.1.0"

from . import core, ops

__all__ = ["core", "ops", "__version__"]
