"""Host array interop — the OpenCV-bridge capability.

Parity with /root/reference/vpp/utils/opencv_bridge.hh: ``from_opencv`` /
``to_opencv`` (:52-90) move pixel buffers between the framework's image
type and OpenCV Mats. On TPU the native host format is the numpy array
(cv2 Mats *are* numpy arrays in Python), so the bridge reduces to
border-aware wrapping + device transfer; the reference's zero-copy
refcount stealing has no analogue across the host/HBM boundary — the copy
is the H2D DMA itself.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.image import Image2d, from_array


def from_numpy(a: np.ndarray, border: int = 0,
               border_mode: str = "mirror") -> Image2d:
    """Host array -> device Image2d with materialised border."""
    return from_array(jnp.asarray(a), border=border,
                      border_mode=border_mode if border else "zero")


def to_numpy(img: Image2d) -> np.ndarray:
    """Device Image2d -> host array (interior only, like to_opencv)."""
    return np.asarray(img.interior)


# cv2 Mats are numpy arrays; these aliases keep the reference's API names.
from_opencv = from_numpy
to_opencv = to_numpy
