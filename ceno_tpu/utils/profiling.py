"""Hierarchical span profiling.

Mirrors the reference's tracing-span idiom (sumcheck/src/macros.rs
entered_span!/exit_span! + the bin/e2e.rs --profiling N level filter,
bin/e2e.rs:66-99): spans carry a profiling level; a report prints the timing
tree down to the requested depth.  For kernel-level detail use jax.profiler
traces alongside (the span names match the module structure).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class Span:
    name: str
    level: int
    start: float
    elapsed: float = 0.0
    children: List["Span"] = field(default_factory=list)


class Profiler:
    _active: Optional["Profiler"] = None

    def __init__(self, max_level: int = 3):
        self.max_level = max_level
        self.root = Span("root", 0, time.time())
        self._stack = [self.root]

    @contextmanager
    def span(self, name: str, level: int = 1):
        if level > self.max_level:
            yield
            return
        s = Span(name, level, time.time())
        self._stack[-1].children.append(s)
        self._stack.append(s)
        try:
            yield
        finally:
            s.elapsed = time.time() - s.start
            self._stack.pop()

    def report(self) -> str:
        self.root.elapsed = time.time() - self.root.start
        lines = []

        def walk(s: Span, depth: int):
            if depth:
                lines.append(f"{'  ' * depth}{s.name}: {s.elapsed * 1e3:.1f} ms")
            for c in s.children:
                walk(c, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)


@contextmanager
def entered_span(name: str, level: int = 1):
    """Module-level convenience: no-op if no profiler is installed."""
    p = Profiler._active
    if p is None:
        yield
    else:
        with p.span(name, level):
            yield


@contextmanager
def profile(max_level: int = 3):
    p = Profiler(max_level)
    Profiler._active = p
    try:
        yield p
    finally:
        Profiler._active = None


# -- pipeline-facing API (bin/e2e.rs --profiling N analog) -------------------

span = entered_span


def enable(max_level: int = 99) -> Profiler:
    """Install a process-global profiler; spans record from here on."""
    Profiler._active = Profiler(max_level)
    return Profiler._active


def report(max_depth: int = 3) -> None:
    """Print the installed profiler's timing tree down to max_depth."""
    p = Profiler._active
    if p is None:
        return
    p.root.elapsed = time.time() - p.root.start
    lines = []

    def walk(s: Span, depth: int):
        if depth:
            lines.append(f"{'  ' * (depth - 1)}{s.name}: {s.elapsed * 1e3:.1f} ms")
        if depth < max_depth:
            for c in s.children:
                walk(c, depth + 1)

    walk(p.root, 0)
    print("\n".join(lines))
