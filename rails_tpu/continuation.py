"""Continuation runs: solve a sequence of similar Lyapunov problems.

The driving application of the reference is continuation of probability
density functions for ocean models (README.md:1-23): a sequence of
Jacobians A(theta_i) along a bifurcation branch, each Lyapunov solve warm
started from the previous one.  The reference supports this through the
MATLAB ``restart_data`` export/import (RAILSsolver.m:174-197,428-443) and
the C++ "Restart from solution" parameter; this module packages the loop:

    cont = ContinuationSolver(b, m=..., options)
    for a in jacobians:
        v, t, info = cont.step(a)

Each step reuses the previous step's converged subspace {V} as the
initial space (AV/VAV are recomputed against the *new* A, which is what
the warm start needs when A changes - matching the semantics of
restart_from_solution, tested at
/root/reference/test/LyapunovSolver_test.cpp:312-352).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from rails_tpu.core.options import SolverOptions
from rails_tpu.core.solver import LyapunovSolver

__all__ = ["ContinuationSolver"]


class ContinuationSolver:
    def __init__(self, b, m=None, options: Optional[SolverOptions] = None,
                 mesh=None, **opt_kwargs):
        self.b = b
        self.m = m
        self.mesh = mesh
        self.options = options or SolverOptions(**opt_kwargs)
        self._prev_space = None
        self.history = []

    def step(self, a, b=None, m=None, compiled: bool = False):
        """Solve with the given operator, warm started from the last step."""
        import dataclasses

        opts = dataclasses.replace(
            self.options,
            space=self._prev_space if self._prev_space is not None
            else self.options.space,
            restart_upon_start=self._prev_space is not None
            or self.options.restart_upon_start,
        )
        solver = LyapunovSolver(a, b if b is not None else self.b,
                                m if m is not None else self.m,
                                options=opts, mesh=self.mesh)
        v, t, info = solver.solve(compiled=compiled)
        self._prev_space = np.asarray(v)
        self.history.append(info)
        return v, t, info

    def save(self, path: str) -> None:
        """Persist the continuation state (the last converged subspace)
        so a later process can resume the sequence - the on-disk form
        of MATLAB's in-memory restart_data (RAILSsolver.m:174-197)."""
        if self._prev_space is None:
            raise ValueError("no step has completed; nothing to save")
        from rails_tpu.io import save_restart_data

        save_restart_data(path, {"V": self._prev_space})

    def load(self, path: str) -> None:
        """Resume from a state written by ``save``: the next ``step``
        warm starts from the stored subspace."""
        from rails_tpu.io import load_restart_data

        self._prev_space = np.asarray(load_restart_data(path)["V"])
