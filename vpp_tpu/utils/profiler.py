"""Hierarchical section profiler — the reference's profiler, TPU-aware.

Capability parity with /root/reference/vpp/utils/profiler.hh:16-159: named
``begin/end`` sections form a tree; each node aggregates wall time and call
counts; the report prints a tree table with %parent / %total / %self
columns.

TPU-aware: JAX dispatch is asynchronous, so naive wall-clock around a
jitted call measures dispatch, not compute. Sections therefore call
``jax.block_until_ready`` on an optional ``sync`` value at exit (pass the
section's output arrays), and the profiler can also wrap
``jax.profiler.StartTrace`` for XLA-level traces. Use as::

    prof = Profiler()
    with prof("frame"):
        with prof("pyramid"):
            pyr = pyramid(img, 3)
            prof.sync(pyr)
    print(prof.report())
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class _Node:
    """profiler_node{duration, ncalls, childs} (profiler.hh:16-24)."""
    name: str
    duration: float = 0.0
    ncalls: int = 0
    children: Dict[str, "_Node"] = field(default_factory=dict)


class Profiler:
    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.root = _Node("root")
        self._stack: List[_Node] = [self.root]
        self._t0: List[float] = []

    def begin(self, name: str) -> None:
        """profiler.hh:25-46 ``begin(name)``."""
        if not self.enabled:
            return
        parent = self._stack[-1]
        node = parent.children.get(name)
        if node is None:
            node = _Node(name)
            parent.children[name] = node
        self._stack.append(node)
        self._t0.append(time.perf_counter())

    def end(self, name: str, sync=None) -> None:
        """``end(name)``; optionally blocks on device values first so the
        section charges the real compute time."""
        if not self.enabled:
            return
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        node = self._stack.pop()
        assert node.name == name, f"end({name}) inside {node.name}"
        node.duration += time.perf_counter() - self._t0.pop()
        node.ncalls += 1

    def sync(self, value) -> None:
        """Attach a device value to the innermost open section: blocks now
        so the pending async work is charged here."""
        if self.enabled and value is not None:
            import jax
            jax.block_until_ready(value)

    @contextmanager
    def __call__(self, name: str, sync=None):
        self.begin(name)
        try:
            yield self
        finally:
            self.end(name, sync)

    # -- report (profiler.hh:92-159 pretty printer) ------------------------
    def report(self) -> str:
        total = sum(c.duration for c in self.root.children.values())
        lines = [f"{'section':<40}{'ms':>10}{'calls':>8}"
                 f"{'%parent':>9}{'%total':>8}{'%self':>8}"]

        def walk(node: _Node, depth: int, parent_dur: float):
            self_dur = node.duration - sum(c.duration
                                           for c in node.children.values())
            pp = 100 * node.duration / parent_dur if parent_dur else 100.0
            pt = 100 * node.duration / total if total else 100.0
            ps = 100 * self_dur / node.duration if node.duration else 0.0
            lines.append(f"{'  ' * depth + node.name:<40}"
                         f"{node.duration * 1e3:>10.3f}{node.ncalls:>8}"
                         f"{pp:>8.1f}%{pt:>7.1f}%{ps:>7.1f}%")
            for c in node.children.values():
                walk(c, depth + 1, node.duration)

        for c in self.root.children.values():
            walk(c, 0, total)
        return "\n".join(lines)

    def reset(self) -> None:
        self.root = _Node("root")
        self._stack = [self.root]
        self._t0 = []


@contextmanager
def xla_trace(logdir: str):
    """XLA-level trace capture (view with TensorBoard / xprof) — the deep
    equivalent of the reference's manual timers."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
