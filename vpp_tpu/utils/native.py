"""Native (C++) runtime components, loaded via ctypes.

``cpu_baseline``: the reference-equivalent CPU tracker used by bench.py to
measure "reference CPU frames/s" on the local machine (the reference repo
publishes no numbers — BASELINE.md §1 — so the denominator is measured).
Built on demand with the same flags the reference uses
(-O3 -march=native -fopenmp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"


def build_native(name: str = "cpu_baseline",
                 out: str = "libvppcpu.so") -> Optional[Path]:
    """Build (or reuse) the native library. Staleness is decided by a
    CONTENT hash of the source stored next to the lib — mtimes lie
    (checkouts, stashes and copies all reset them; an mtime check once
    served a stale .so missing a freshly added symbol)."""
    import hashlib
    src = _NATIVE_DIR / f"{name}.cpp"
    lib = _NATIVE_DIR / out
    tag = _NATIVE_DIR / f"{out}.srchash"
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    if (lib.exists() and tag.exists()
            and tag.read_text().strip() == digest):
        return lib
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", str(lib), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:
        return None
    tag.write_text(digest)
    return lib


def load_cpu_baseline() -> Optional[ctypes.CDLL]:
    lib = build_native()
    if lib is None:
        return None
    dll = ctypes.CDLL(str(lib))
    dll.tracker_fps.restype = ctypes.c_double
    dll.tracker_fps.argtypes = [ctypes.c_int] * 4
    return dll


def cpu_tracker_fps(width: int, height: int, frames: int,
                    seed: int = 0) -> Optional[float]:
    dll = load_cpu_baseline()
    if dll is None:
        return None
    return float(dll.tracker_fps(width, height, frames, seed))
