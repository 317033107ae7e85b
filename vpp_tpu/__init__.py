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

# Heavier subpackages (algorithms, slam, parallel, draw, io, utils) are
# imported lazily on attribute access to keep bare `import vpp_tpu` light.
_SUBPACKAGES = ("algorithms", "slam", "parallel", "draw", "io", "utils")


def __getattr__(name):
    if name in _SUBPACKAGES:
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module 'vpp_tpu' has no attribute {name!r}")
