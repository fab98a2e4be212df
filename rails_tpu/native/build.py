"""On-demand build of the native host library (g++, no dependencies).

The reference ships CMake + external BLAS/LAPACK/SLICOT/Trilinos; our
native surface is one self-contained translation unit, so a single g++
invocation (cached by mtime) replaces the build system for it.
"""

from __future__ import annotations

import os
import subprocess

__all__ = ["build_library"]


def build_library(force: bool = False) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "librails_host.cpp")
    out = os.path.join(here, "librails_host.so")
    if not force and os.path.exists(out) \
            and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out, src]
    subprocess.run(cmd, check=True, capture_output=True)
    return out
