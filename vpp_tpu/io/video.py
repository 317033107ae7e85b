"""Video input — the frame pump feeding the trackers.

Capability parity with /root/reference/vpp/utils/opencv_utils.hh:
``open_videocapture`` (file or camera, :11-24), ``videocapture_domain``
(:26-48) and the ``foreach_videoframe | lambda`` pump (:50-69).

TPU-native design: decode stays on host (the reference uses OpenCV; here
cv2 is optional — .npy/.npz clips and synthetic generators always work),
while ``clip_prefetch`` overlaps H2D copies with device compute by keeping
one frame in flight (double buffering with ``jax.device_put``), per the
build plan's host↔device pipeline note (SURVEY §7 hard parts).
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np


def _try_cv2():
    try:
        import cv2
        return cv2
    except Exception:
        return None


def synthetic_clip(w: int, h: int, nframes: int, seed: int = 0,
                   speed: int = 1) -> np.ndarray:
    """(T, H, W) float32 moving smoothed-noise texture — the dataset-free
    test/benchmark clip (tests/pyrlk.cc synthetic methodology)."""
    rng = np.random.RandomState(seed)
    th, tw = h + speed * nframes + 8, w + speed * nframes + 8
    base = rng.randint(0, 256, (th, tw)).astype(np.float32)
    p = np.pad(base, 1, mode="edge")
    sm = sum(p[r:r + th, c:c + tw] for r in range(3) for c in range(3)) / 9.0
    return np.stack([sm[speed * t:speed * t + h, speed * t:speed * t + w]
                     for t in range(nframes)]).astype(np.float32)


def open_clip(source, max_frames: Optional[int] = None,
              gray: bool = True) -> Iterator[np.ndarray]:
    """Yield (H, W[, 3]) float32 frames from: an ndarray (T, ...), a .npy /
    .npz path, or (when cv2 is present) any video file / camera index —
    ``open_videocapture`` parity."""
    if isinstance(source, np.ndarray):
        frames: Iterable[np.ndarray] = source
    elif isinstance(source, str) and source.endswith(".npy"):
        frames = np.load(source)
    elif isinstance(source, str) and source.endswith(".npz"):
        z = np.load(source)
        frames = z[list(z.files)[0]]
    else:
        cv2 = _try_cv2()
        if cv2 is None:
            raise RuntimeError(
                "cv2 unavailable; pass an ndarray or .npy/.npz clip")
        cap = cv2.VideoCapture(int(source) if str(source).isdigit()
                               else source)

        def gen():
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield frame[..., ::-1]      # BGR -> RGB
            cap.release()
        frames = gen()

    for i, f in enumerate(frames):
        if max_frames is not None and i >= max_frames:
            break
        f = np.asarray(f)
        if gray and f.ndim == 3:
            f = f.mean(axis=-1)
        yield f.astype(np.float32)


def clip_prefetch(frames: Iterable[np.ndarray]) -> Iterator:
    """Double-buffered H2D pipeline: device_put frame t+1 while the caller
    computes on frame t."""
    import jax
    it = iter(frames)
    try:
        nxt = jax.device_put(next(it))
    except StopIteration:
        return
    for f in it:
        cur, nxt = nxt, jax.device_put(f)
        yield cur
    yield nxt


def foreach_videoframe(source, fn: Callable, *, max_frames: int = None,
                       prefetch: bool = True) -> int:
    """``foreach_videoframe(f) | [&](frame){...}`` parity
    (opencv_utils.hh:50-69): calls ``fn(frame)`` per frame; returns the
    frame count."""
    frames = open_clip(source, max_frames=max_frames)
    if prefetch:
        frames = clip_prefetch(frames)
    n = 0
    for f in frames:
        fn(f)
        n += 1
    return n
