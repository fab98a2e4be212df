"""Wide-multivector SpMM via dense-window MXU matmuls.

The gather-based windowed-ELL kernel (ell_spmm.py) is issue-bound on
``tpu.dynamic_gather``: its cost is per *vreg of output rows*, so at
s = 64 it runs ~4x slower per nnz than at its s = 16 design point while
the MXU sits idle.  The round-4 probes measured the escape route: a
dense per-chunk window matrix P streams from HBM at the full measured
rate (710 GB/s) and the one-hot product ``out = x_win @ P`` puts the
work on the MXU, which is row-starved at s = 16 but fed at s >= 64
(ell_spmm.py docstring, route 3).  This module is that route, dispatched
on operand width (VERDICT r04 next-round item 4):

- **Payload**: for each 128-row chunk b with window [c0_b, c0_b + w),
  ``P_b[c, r] = A[128 b + r, c0_b + c]`` - the ELL entries scattered
  into a dense (w, 128) block, built host-side.  Cost: w/L values
  stored per nnz (the price of the dense route; 2-8% occupancy at the
  bench geometry), so the payload is built on request
  (``sparse_from_scipy(..., wide_s=True)`` or ``build_wide_window``).
- **Precision**: the MXU multiplies bf16; a single pass measured 3e-3
  relative error - unusable in the solver.  P is split host-side into
  bf16 hi + lo planes and x split in-kernel; three MXU passes
  (xh Ph + xh Pl + xl Ph) recover ~1.5e-5 relative accuracy (the
  2^-17 split residual of each operand dominates; the dropped xl Pl
  term is 2^-18).  ``passes=6`` adds the third P plane and the
  remaining cross terms for f32-grade ~2^-26 accuracy at 2x MXU work
  and 1.5x P traffic.
- **Kernel**: grid over chunks; x window (s, w) DMA'd double-buffered
  with 128-aligned dynamic lane starts (the ell_spmm machinery); P
  planes arrive as (w, 128) VMEM blocks through the automatic pipeline;
  the products accumulate in f32.

Dispatch: ``ell_spmm`` (sparse/ell_spmm.py) routes applies with
``s >= wide.min_s`` columns here when the payload carries a
WideWindow.  The wide consumers in production are the residual-factor
block applies of the refined driver and the eigs sweeps' full-basis
applies (both 64-200 columns); both tolerate 1e-5 apply error at their
stage tolerances - callers needing full f32 build with ``passes=6``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WideWindow", "build_wide_window", "wide_spmm_t", "wide_spmm"]

_CHUNK = 128
# Measured crossover on the live chip (PROBE_wide_s.json): the gather
# kernel degrades sublinearly in s, so this route only passes it at
# s ~ 160-192 - and peaks at ~1.2x, never the predicted 2x+.
_MIN_S_DEFAULT = 192
_BYTES_CAP_DEFAULT = 4 << 30   # refuse silent multi-GB payloads


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class WideWindow:
    """Dense-window payload: bf16 planes of P laid out (w, m_pad) with
    chunk b in lane columns [128 b, 128 (b+1)); p3 is the third plane
    (passes=6 only)."""

    c0: jax.Array                    # (nb,) int32 128-aligned starts
    p_hi: jax.Array                  # (w, m_pad) bfloat16
    p_lo: jax.Array                  # (w, m_pad) bfloat16
    p3: Optional[jax.Array]          # (w, m_pad) bfloat16 or None
    w: int                           # static window width
    shape: Tuple[int, int]           # static logical (m, n)
    min_s: int = _MIN_S_DEFAULT      # static dispatch threshold

    @property
    def passes(self) -> int:
        return 6 if self.p3 is not None else 3

    def astype(self, dtype):
        return self  # planes are bf16 by construction

    def tree_flatten(self):
        return (self.c0, self.p_hi, self.p_lo, self.p3), (
            self.w, self.shape, self.min_s)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], children[3],
                   aux[0], aux[1], aux[2])


def _split_planes(p: np.ndarray, three: bool):
    """bf16 plane decomposition of an f32 array: p ~= hi + lo (+ p3),
    each plane exactly representable in bf16."""
    hi = p.astype(jnp.bfloat16)
    r = p - np.asarray(hi, np.float32)
    lo = r.astype(jnp.bfloat16)
    if not three:
        return hi, lo, None
    r2 = r - np.asarray(lo, np.float32)
    return hi, lo, r2.astype(jnp.bfloat16)


def build_wide_window(well, *, passes: int = 3, min_s: int = _MIN_S_DEFAULT,
                      bytes_cap: int = _BYTES_CAP_DEFAULT
                      ) -> Optional[WideWindow]:
    """Build the dense-window planes from a masked WindowedEll payload.

    Returns None when the payload would exceed ``bytes_cap`` on device
    or the layout is sliced (window-local indices are re-bucketed there;
    the masked layout keeps them directly scatterable)."""
    if well is None or well.sb is not None:
        return None
    if passes not in (3, 6):
        raise ValueError(f"passes must be 3 or 6, got {passes}")
    lidx = np.asarray(well.lidx)     # (L, m_pad) window-local
    values = np.asarray(well.values, np.float32)
    ell_l, m_pad = lidx.shape
    w = well.w
    n_planes = 3 if passes == 6 else 2
    if n_planes * w * m_pad * 2 > bytes_cap:
        return None
    p = np.zeros((w, m_pad), np.float32)
    cols = np.arange(m_pad)
    for l in range(ell_l):
        # duplicates cannot occur for real entries; padding slots carry
        # value 0 at a live index, which add-at absorbs
        np.add.at(p, (lidx[l], cols), values[l])
    hi, lo, p3 = _split_planes(p, passes == 6)
    return WideWindow(well.c0, jnp.asarray(hi), jnp.asarray(lo),
                      None if p3 is None else jnp.asarray(p3),
                      w, well.shape, min_s)


@functools.partial(jax.jit, static_argnames=("w", "m", "m_pad", "six"))
def _wide_spmm_t_impl(c0, p_hi, p_lo, p3, xt, w: int, m: int, m_pad: int,
                      six: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = xt.shape[0]
    nb = m_pad // _CHUNK

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(c0_ref, *refs):
        if six:
            phi_ref, plo_ref, p3_ref, xt_ref, out_ref, w_ref, sems = refs
        else:
            phi_ref, plo_ref, xt_ref, out_ref, w_ref, sems = refs
            p3_ref = None
        i = pl.program_id(0)

        def dma(slot, blk):
            start = pl.multiple_of(c0_ref[blk], _CHUNK)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, w)], w_ref.at[slot],
                sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nb)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        xw = w_ref[i % 2]                       # (s, w) f32
        xh = xw.astype(jnp.bfloat16)
        xr = xw - xh.astype(jnp.float32)
        xl = xr.astype(jnp.bfloat16)
        ph = phi_ref[:]
        plo = plo_ref[:]
        acc = dot(xh, ph) + dot(xh, plo) + dot(xl, ph)
        if six:
            x3 = (xr - xl.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = acc + dot(xl, plo) + dot(xh, p3_ref[:]) + dot(x3, ph)
        out_ref[:] = acc.astype(out_ref.dtype)

    p_specs = [pl.BlockSpec((w, _CHUNK), lambda i, c0: (0, i),
                            memory_space=pltpu.VMEM)] * (3 if six else 2)
    operands = (c0, p_hi, p_lo) + ((p3,) if six else ()) + (xt,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=p_specs + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((s, _CHUNK), lambda i, c0: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, w), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    n_pass = 6 if six else 3
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m_pad), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=n_pass * 2 * w * _CHUNK * s * nb,
            bytes_accessed=((3 if six else 2) * w * m_pad * 2
                            + 2 * m_pad * s * 4),
            transcendentals=0),
    )(*operands)
    return out if m_pad == m else out[:, :m]


def wide_spmm_t(wide: WideWindow, xt: jax.Array) -> jax.Array:
    """yt (s, m) = (A @ x)^T for x given transposed as xt (s, n)."""
    m, n = wide.shape
    s = xt.shape[0]
    n_pad = -(-n // _CHUNK) * _CHUNK
    s_pad = -(-s // 8) * 8
    if n_pad != n or s_pad != s:
        xt = jnp.pad(xt, ((0, s_pad - s), (0, n_pad - n)))
    out = _wide_spmm_t_impl(wide.c0, wide.p_hi, wide.p_lo, wide.p3, xt,
                            wide.w, m, wide.p_hi.shape[1],
                            wide.p3 is not None)
    return out if s_pad == s else out[:s]


# VMEM: the x-window scratch is 2*s*w*4 bytes plus three (w, 128)
# P blocks through the pipeline; cap the scratch like ell_spmm does.
_SCRATCH_BUDGET_BYTES = 8 * 1024 * 1024


def wide_fits_vmem(wide: WideWindow, s: int) -> bool:
    s_pad = -(-s // 8) * 8
    return 2 * s_pad * wide.w * 4 <= _SCRATCH_BUDGET_BYTES


def wide_spmm(ell, x: jax.Array) -> Optional[jax.Array]:
    """(n, s)-layout dispatch helper: returns A @ x via the dense-window
    MXU kernel, or None when the operand/payload does not qualify (the
    caller then falls through to the gather kernel / XLA path)."""
    wide = getattr(ell, "wide", None)
    if (wide is None
            or jax.default_backend() != "tpu"
            or x.dtype != jnp.float32
            or x.ndim != 2
            or x.shape[1] < wide.min_s
            or not wide_fits_vmem(wide, x.shape[1])):
        return None
    return wide_spmm_t(wide, x.T).T
