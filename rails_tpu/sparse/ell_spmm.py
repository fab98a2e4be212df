"""Windowed-ELL SpMM Pallas kernel - unstructured sparsity on TPU.

The reference handles arbitrary CrsMatrix sparsity as its baseline case
(/root/reference/src/Epetra_OperatorWrapper.cpp:75-91) through Epetra's
CPU SpMV.  A TPU has no scalar gather path worth using: the XLA lowering
of the per-slot ``jnp.take`` ELL apply measures ~0.03 Gnnz/s on v5e.
The one vector-gather primitive Mosaic compiles is
``tpu.dynamic_gather`` (via ``jnp.take_along_axis``) on a *128-wide
lane operand* (measured: wider operands and sublane gathers fail to
compile - benchmarks/probes/probe_dyngather.py).  This kernel is built
around that constraint:

- rows are processed in 128-row chunks (the lane dimension of the
  transposed (s, m) multivector layout, see sparse/spmm.py);
- each chunk declares a 128-aligned *column window* ``[c0, c0+w)``
  covering every column index it touches; window starts are
  scalar-prefetched from SMEM and drive a double-buffered DMA of the
  (s, w) slice of x into VMEM;
- ELL indices are stored window-local; the gather over the w-wide
  window decomposes into w/128 sub-block gathers combined by masked
  select (the only shape the hardware gather supports).

Matrices qualify when every 128-row chunk's column span fits a bounded
window - true for banded/structured matrices and for general ones after
RCM reordering (rails_tpu.sparse.reorder).  Genuinely random sparsity
(window ~ n) falls back to the XLA path; no TPU memory system does well
there.

Measured on v5e at m=2^21, L=8, band 64, s=16: the single-chunk masked
kernel runs 2.45 Gnnz/s = 0.57 of the measured gather-issue ceiling
(100.6M (16,128)-gathers/s; masked spends w/128 = 3 gathers per
slot-chunk -> ceiling 4.29 Gnnz/s).  Round-3 A/B (probe_ell_pred): the
sliced single-gather layout times the SAME 2.4 Gnnz/s and pl.when slot
predication HALVES it - the gap is per-grid-step overhead, not
per-gather work.  The shipped kernel therefore groups _NC_DEFAULT=4
chunks per grid step under one super-window DMA
(_ell_spmm_t_nc_impl): 4.17 Gnnz/s = 0.979 of the gather-issue ceiling,
1.70x the single-chunk kernel, 136x the XLA take path (all from
benchmarks/BENCH_r03_tpu_prerun.json, the artifact PARITY.md and
README.md cite).

Round-4 verdict: this is the HARDWARE OPTIMUM for the operating point
(s=16, f32, per-row spans <= 2*band+1).  Every route past the gather
ceiling was probed on the live chip and measured dead
(probe_w256.py, probe_multiacc.py, probe_ell_minops.py):

1. sliced layout (1 gather/slot): the blocker is NOT the SMEM table
   previously documented - ``_slice_layout`` at the bench geometry pads
   to L' = 23 slots (per-chunk slot count = sum over sub-blocks of the
   max per-row count over 128 rows; some row concentrates ~all L
   entries in each block), so its ceiling is 3L/L' = 1.04x masked.
2. narrower windows (w 384 -> 256, 2 gathers/slot): every row touches
   <= 2 sub-blocks, so the third gather exists only because DMA starts
   are 128-floored - but Mosaic REJECTS non-128-aligned lane starts in
   ``make_async_copy`` (compile failure at starts 64/192/100).
3. MXU one-hot (out = x_win @ P with P (w,128) the scattered values):
   streams P at 710 GB/s = full measured HBM rate, but P costs
   w/2 = 192 bytes/nnz at L=8 (3.7 Gnnz/s standalone), and f32
   accuracy needs a 3xbf16 decomposition whose (16,w)@(w,128) matmuls
   leave the 128x128 MXU 8x row-starved at s=16 (~1 Gnnz/s effective;
   single bf16 pass measured err 3e-3 - unusable in the solver).
4. multiple accumulators: 1/2/4/8 independent accumulator chains all
   time 94-98M composite gathers/s - the kernel is NOT add-latency-
   bound.
5. minimal-op inner loop (per-sub-block clipped indices and mask-
   folded values precomputed host-side; gather+mul+add only, 6 vreg
   ops/term vs ~16): 4.17 vs 4.12 Gnnz/s = 1.01x - NOT VPU-issue-
   bound either.

The limit is the tpu.dynamic_gather issue rate itself (~4.8
cycles/vreg, 2 vregs per (16,128) composite).  Past it the problem
must change: larger s (MXU route wins at s >= 64), relaxed precision,
or denser rows (gather ceiling is L-independent, so DIA/HYB formats
win when structure allows - which the format auto-selection already
exploits).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WindowedEll", "ell_windowize", "windowize_arrays",
           "ell_spmm_t", "ell_spmm", "window_fits_vmem"]

_CHUNK = 128          # output rows per grid step (lane width)
_NC_DEFAULT = 4       # 128-row chunks sharing one grid step / DMA
_W_CAP = 2048         # widest supported window (VPU cost grows with w/128)
_MIN_ROWS = 256       # below this the XLA path wins on dispatch overhead
_SLICE_FACTOR = 2.5   # accept sliced layout while L' <= factor * L

# Layout picked when callers don't say: 'masked' until the dynamic-lane
# -slice read the sliced kernel needs is confirmed on the target Mosaic
# (benchmarks/probes/probe_dynslice.py).
DEFAULT_LAYOUT = "masked"


def group_windows(c0: np.ndarray, w: int, nc: int, n_pad: int,
                  force_ws: Optional[int] = None):
    """Group ``nc`` consecutive 128-row chunks under one super-window.

    Returns (c0s, offs, w_super): per-group 128-aligned DMA starts, the
    per-chunk block offset of each chunk's own w-wide window inside its
    group's super-window, and the static super-window width.  Host-side;
    feeds the multi-chunk kernel (_ell_spmm_t_nc_impl), which amortizes
    the per-grid-step overhead (DMA wait, sequencing) over ``nc`` chunks
    - measured as the dominant cost beyond the raw gather rate
    (probe_ell_pred: sliced == masked at ~0.57 of the gather ceiling,
    so the gap is per-step overhead, not per-gather work)."""
    nb = len(c0)
    nbs = -(-nb // nc)
    if nbs * nc != nb:
        raise ValueError("chunk count must be a multiple of nc")
    cg = c0.reshape(nbs, nc)
    c0s = cg.min(axis=1)
    w_super = int((cg.max(axis=1) + w - c0s).max())
    w_super = -(-w_super // _CHUNK) * _CHUNK
    if force_ws is not None:
        if force_ws % _CHUNK or w_super > force_ws:
            raise ValueError(f"group span {w_super} exceeds forced "
                             f"super-window {force_ws}")
        w_super = force_ws
    c0s = np.minimum(c0s, max(n_pad - w_super, 0)).astype(np.int32)
    offs = ((cg - c0s[:, None]) // _CHUNK).astype(np.int32).reshape(-1)
    return c0s, offs, w_super


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class WindowedEll:
    """Kernel-native ELL payload: transposed (L, m_pad) slots with
    window-local indices plus per-chunk window starts.

    Two layouts share this container:

    - **masked** (``sb is None``): ``lidx`` holds window-local indices in
      [0, w); the kernel gathers each slot from every 128-wide sub-block
      of the window and combines by masked select (w/128 gathers/slot).
    - **sliced** (``sb`` present, (nb, L') int32): entries are re-bucketed
      host-side so each (chunk, slot) lives in ONE sub-block, named by
      ``sb[chunk, slot]``; ``lidx`` holds within-sub-block indices in
      [0, 128).  One gather per slot, no masks - at the price of slot
      padding (L' >= L).  Chosen when L' stays under
      ``_SLICE_FACTOR * L``.
    """

    c0: jax.Array                    # (nb,) int32, 128-aligned starts
    lidx: jax.Array                  # (L', m_pad) int32
    values: jax.Array                # (L', m_pad)
    w: int                           # static window width (128-multiple)
    shape: Tuple[int, int]           # static logical (m, n)
    sb: Optional[jax.Array] = None   # (nb, L') int32 sub-block ids
    # multi-chunk grouping (masked layout): nc 128-row chunks share one
    # super-window DMA; each chunk's own w-wide window sits at block
    # offset offs[chunk] inside it (see group_windows)
    c0s: Optional[jax.Array] = None  # (nb/nc,) int32 group DMA starts
    offs: Optional[jax.Array] = None  # (nb,) int32 per-chunk block offset
    w_super: int = 0                 # static super-window width
    nc: int = 1                      # chunks per grid step

    def astype(self, dtype) -> "WindowedEll":
        if self.values.dtype == jnp.dtype(dtype):
            return self
        return WindowedEll(self.c0, self.lidx, self.values.astype(dtype),
                           self.w, self.shape, self.sb, self.c0s,
                           self.offs, self.w_super, self.nc)

    def tree_flatten(self):
        return (self.c0, self.lidx, self.values, self.sb, self.c0s,
                self.offs), (self.w, self.shape, self.w_super, self.nc)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1],
                   children[3], children[4], children[5], aux[2], aux[3])


def ell_windowize(indices: np.ndarray, values: np.ndarray,
                  shape: Tuple[int, int], w_cap: int = _W_CAP,
                  layout: Optional[str] = None,
                  force_w: Optional[int] = None,
                  min_rows: int = _MIN_ROWS) -> Optional[WindowedEll]:
    """Host-side analysis: per-128-row-chunk windows over an ELL matrix.

    Returns None when the matrix does not qualify (too small, window
    wider than ``w_cap`` or than the column count).  Padding slots must
    carry row-local indices (see formats._ell_from_scipy) or the pads
    themselves blow up the window span.

    ``layout``: 'masked' | 'sliced' | 'auto' (None = module default
    ``DEFAULT_LAYOUT``).  'auto' prefers sliced when its slot padding
    stays under ``_SLICE_FACTOR`` x, else masked.

    ``force_w``: use exactly this window width (128-multiple) instead of
    the tightest fit - the distributed path needs one static ``w``
    across every shard (parallel/halo_ell.py).  Returns None if any
    chunk's span exceeds it.
    """
    if layout is None:
        layout = DEFAULT_LAYOUT
    res = windowize_arrays(indices, values, shape, w_cap=w_cap,
                           force_w=force_w, min_rows=min_rows)
    if res is None:
        return None
    c0, lidx, values, w = res
    m, n = shape
    ell_l = lidx.shape[1]
    if layout in ("auto", "sliced") and w > _CHUNK:
        sliced = _slice_layout(lidx, values, ell_l, w // _CHUNK)
        if sliced is not None or layout == "sliced":
            if sliced is None:
                return None  # explicit request, padding too costly
            s_lidx, s_val, sb = sliced
            return WindowedEll(
                jnp.asarray(c0), jnp.asarray(np.ascontiguousarray(s_lidx.T)),
                jnp.asarray(np.ascontiguousarray(s_val.T)), w, (m, n),
                jnp.asarray(sb))
    # multi-chunk grouping for the masked kernel: amortize the per-grid
    # -step cost over _NC_DEFAULT chunks when the windows advance slowly
    # enough that one super-window covers the group (banded / post-RCM
    # shapes; irregular window jumps fall back to nc=1)
    n_pad = -(-n // _CHUNK) * _CHUNK
    c0s = offs = None
    w_super, nc = 0, 1
    nb = len(c0)
    for cand in (_NC_DEFAULT, 2):
        if cand <= 1 or nb % cand:
            continue
        c0s_np, offs_np, w_s = group_windows(np.asarray(c0), w, cand,
                                             n_pad)
        if w_s <= min(w + cand * _CHUNK, n_pad):
            c0s, offs = jnp.asarray(c0s_np), jnp.asarray(offs_np)
            w_super, nc = w_s, cand
            break
    return WindowedEll(
        jnp.asarray(c0), jnp.asarray(np.ascontiguousarray(lidx.T)),
        jnp.asarray(np.ascontiguousarray(values.T)), w, (m, n),
        None, c0s, offs, w_super, nc)


def windowize_arrays(indices: np.ndarray, values: np.ndarray,
                     shape: Tuple[int, int], w_cap: int = _W_CAP,
                     force_w: Optional[int] = None,
                     min_rows: int = _MIN_ROWS):
    """Numpy core of the masked-layout window analysis: returns
    ``(c0, lidx, values, w)`` with lidx/values in row-major (m_pad, L)
    and window-local indices, or None when the matrix does not qualify.
    Shared by ``ell_windowize`` and the distributed per-shard builder
    (parallel/halo_ell.py), which stacks shard payloads host-side."""
    m, n = shape
    if m < min_rows:
        return None
    indices = np.asarray(indices)
    values = np.asarray(values)
    ell_l = indices.shape[1]
    m_pad = -(-m // _CHUNK) * _CHUNK
    if m_pad != m:
        # pad rows: replicate the last row's index (in-window), zero value
        pad_idx = np.broadcast_to(indices[m - 1:m], (m_pad - m, ell_l))
        indices = np.concatenate([indices, pad_idx], axis=0)
        values = np.concatenate(
            [values, np.zeros((m_pad - m, ell_l), values.dtype)], axis=0)
    nb = m_pad // _CHUNK
    ci = indices.reshape(nb, _CHUNK, ell_l)
    c0 = (ci.min(axis=(1, 2)) // _CHUNK) * _CHUNK
    span = ci.max(axis=(1, 2)) - c0 + 1
    w = int(-(-int(span.max()) // _CHUNK)) * _CHUNK
    # windows must stay 128-aligned AND in-range of the 128-padded
    # column space (ell_spmm_t pads xt to n_pad columns; clamping
    # against raw n would break the alignment the DMA promises)
    n_pad = -(-n // _CHUNK) * _CHUNK
    if force_w is not None:
        if force_w % _CHUNK or w > force_w:
            return None
        w = force_w
    if w > min(w_cap, n_pad):
        return None
    c0 = np.minimum(c0, n_pad - w).astype(np.int32)
    lidx = (indices - np.repeat(c0, _CHUNK)[:, None]).astype(np.int32)
    return c0, lidx, values, w


def _slice_layout(lidx: np.ndarray, values: np.ndarray, ell_l: int,
                  nw: int):
    """Re-bucket (m_pad, L) window-local ELL entries so each
    (128-row-chunk, slot) pair touches exactly one 128-wide sub-block.

    Returns (lidx', values', sb) with lidx' (m_pad, L') holding
    within-sub-block indices, or None when the padded slot count L'
    exceeds ``_SLICE_FACTOR * L`` (then the masked layout wins)."""
    m_pad = lidx.shape[0]
    nb = m_pad // _CHUNK
    cap = max(int(np.ceil(_SLICE_FACTOR * ell_l)), ell_l + 1)
    rows = np.arange(_CHUNK)
    per_chunk = []
    lp_max = 0
    for b in range(nb):
        lb = lidx[b * _CHUNK:(b + 1) * _CHUNK]
        vb = values[b * _CHUNK:(b + 1) * _CHUNK]
        live = vb != 0
        bucket = np.where(live, lb // _CHUNK, nw)  # pads sort last
        order = np.argsort(bucket, axis=1, kind="stable")
        j_s = np.take_along_axis(bucket, order, axis=1)
        l_s = np.take_along_axis(lb % _CHUNK, order, axis=1)
        v_s = np.take_along_axis(vb, order, axis=1)
        counts = np.zeros((_CHUNK, nw + 1), dtype=np.int64)
        np.add.at(counts, (rows[:, None], bucket), 1)
        maxc = counts[:, :nw].max(axis=0)
        lp = int(maxc.sum())
        if lp > cap:
            return None
        lp_max = max(lp_max, lp)
        row_start = np.zeros((_CHUNK, nw + 1), dtype=np.int64)
        row_start[:, 1:] = np.cumsum(counts[:, :nw], axis=1)
        glob_start = np.concatenate([[0], np.cumsum(maxc)])
        valid = j_s < nw
        j_c = np.minimum(j_s, nw - 1)
        rank = np.arange(ell_l)[None, :] - np.take_along_axis(
            row_start, j_c, axis=1)
        dest = glob_start[j_c] + rank
        nl = np.zeros((_CHUNK, lp), dtype=np.int32)
        nv = np.zeros((_CHUNK, lp), dtype=values.dtype)
        rr = np.broadcast_to(rows[:, None], (_CHUNK, ell_l))
        nl[rr[valid], dest[valid]] = l_s[valid]
        nv[rr[valid], dest[valid]] = v_s[valid]
        sb_b = np.repeat(np.arange(nw, dtype=np.int32), maxc)
        per_chunk.append((nl, nv, sb_b))
    out_l = np.zeros((m_pad, lp_max), dtype=np.int32)
    out_v = np.zeros((m_pad, lp_max), dtype=values.dtype)
    sb = np.zeros((nb, lp_max), dtype=np.int32)
    for b, (nl, nv, sb_b) in enumerate(per_chunk):
        out_l[b * _CHUNK:(b + 1) * _CHUNK, :nl.shape[1]] = nl
        out_v[b * _CHUNK:(b + 1) * _CHUNK, :nv.shape[1]] = nv
        sb[b, :len(sb_b)] = sb_b
    return out_l, out_v, sb


@functools.partial(jax.jit, static_argnames=("ell_l", "w", "m", "m_pad"))
def _ell_spmm_t_impl(c0, lidx, values, xt, ell_l: int, w: int, m: int,
                     m_pad: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = xt.shape[0]
    nb = m_pad // _CHUNK
    nw = w // _CHUNK

    def kernel(c0_ref, lidx_ref, val_ref, xt_ref, out_ref, w_ref, sems):
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
        slot = i % 2

        acc = jnp.zeros((s, _CHUNK), dtype=jnp.float32)
        for l in range(ell_l):
            bidx = jnp.broadcast_to(lidx_ref[l, :][None, :], (s, _CHUNK))
            vrow = val_ref[l, :][None, :]
            if nw == 1:
                # single-sub-block window: indices already in [0, 128)
                g = jnp.take_along_axis(w_ref[slot], bidx, axis=1)
                acc = acc + vrow * g
                continue
            for j in range(nw):
                loc = jnp.clip(bidx - j * _CHUNK, 0, _CHUNK - 1)
                g = jnp.take_along_axis(
                    w_ref[slot, :, j * _CHUNK:(j + 1) * _CHUNK], loc,
                    axis=1)
                mask = (bidx >= j * _CHUNK) & (bidx < (j + 1) * _CHUNK)
                acc = acc + jnp.where(mask, vrow * g, 0.0)
        out_ref[:] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ell_l, _CHUNK), lambda i, c0: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ell_l, _CHUNK), lambda i, c0: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, _CHUNK), lambda i, c0: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, w), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m_pad), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ell_l * m_pad * s,
            bytes_accessed=(2 * ell_l * m_pad + 2 * m_pad * s)
            * jnp.dtype(xt.dtype).itemsize,
            transcendentals=0),
    )(c0, lidx, values, xt)
    return out if m_pad == m else out[:, :m]


@functools.partial(jax.jit, static_argnames=("ell_l", "w", "w_super",
                                             "nc", "m", "m_pad"))
def _ell_spmm_t_nc_impl(c0s, offs, lidx, values, xt, ell_l: int, w: int,
                        w_super: int, nc: int, m: int, m_pad: int):
    """Masked kernel, ``nc`` chunks per grid step: one (s, w_super) DMA
    serves nc consecutive 128-row chunks; chunk c gathers from the
    w-wide sub-window at block offset offs[step*nc + c] (dynamic
    128-aligned lane slices).  Measured motivation: the single-chunk
    kernel sits at ~0.57 of the raw gather-issue rate and removing the
    select ops (sliced layout) does not move it - the gap is per-step
    overhead, amortized here over nc chunks (and the super-window DMAs
    ~w_super/nc bytes per chunk instead of w, fewer for banded
    matrices)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = xt.shape[0]
    nb = m_pad // _CHUNK
    nbs = nb // nc
    nw = w // _CHUNK

    def kernel(c0s_ref, offs_ref, lidx_ref, val_ref, xt_ref, out_ref,
               w_ref, sems):
        i = pl.program_id(0)

        def dma(slot, blk):
            start = pl.multiple_of(c0s_ref[blk], _CHUNK)
            return pltpu.make_async_copy(
                xt_ref.at[:, pl.ds(start, w_super)], w_ref.at[slot],
                sems.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nbs)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        slot = i % 2

        for c in range(nc):
            base = offs_ref[i * nc + c]
            acc = jnp.zeros((s, _CHUNK), dtype=jnp.float32)
            for l in range(ell_l):
                row = lidx_ref[l, c * _CHUNK:(c + 1) * _CHUNK]
                bidx = jnp.broadcast_to(row[None, :], (s, _CHUNK))
                vrow = val_ref[l, c * _CHUNK:(c + 1) * _CHUNK][None, :]
                for j in range(nw):
                    blk = w_ref[slot, :, pl.ds(
                        pl.multiple_of((base + j) * _CHUNK, _CHUNK),
                        _CHUNK)]
                    if nw == 1:
                        g = jnp.take_along_axis(blk, bidx, axis=1)
                        acc = acc + vrow * g
                        continue
                    loc = jnp.clip(bidx - j * _CHUNK, 0, _CHUNK - 1)
                    g = jnp.take_along_axis(blk, loc, axis=1)
                    mask = (bidx >= j * _CHUNK) & (bidx < (j + 1) * _CHUNK)
                    acc = acc + jnp.where(mask, vrow * g, 0.0)
            out_ref[:, c * _CHUNK:(c + 1) * _CHUNK] = \
                acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbs,),
        in_specs=[
            pl.BlockSpec((ell_l, nc * _CHUNK), lambda i, c0s, offs: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ell_l, nc * _CHUNK), lambda i, c0s, offs: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, nc * _CHUNK),
                               lambda i, c0s, offs: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, w_super), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m_pad), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ell_l * m_pad * s,
            bytes_accessed=(2 * ell_l * m_pad + 2 * m_pad * s)
            * jnp.dtype(xt.dtype).itemsize,
            transcendentals=0),
    )(c0s, offs, lidx, values, xt)
    return out if m_pad == m else out[:, :m]


@functools.partial(jax.jit, static_argnames=("ell_l", "w", "m", "m_pad"))
def _ell_spmm_t_sliced_impl(c0, sb, lidx, values, xt, ell_l: int, w: int,
                            m: int, m_pad: int):
    """Sliced-window schedule: one gather per slot from the sub-block
    named by sb[chunk, slot] (dynamic 128-aligned lane slice), no
    masks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = xt.shape[0]
    nb = m_pad // _CHUNK

    def kernel(c0_ref, sb_ref, lidx_ref, val_ref, xt_ref, out_ref, w_ref,
               sems):
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
        slot = i % 2

        acc = jnp.zeros((s, _CHUNK), dtype=jnp.float32)
        for l in range(ell_l):
            sbl = sb_ref[i, l]
            blk = w_ref[slot, :,
                        pl.ds(pl.multiple_of(sbl * _CHUNK, _CHUNK), _CHUNK)]
            bidx = jnp.broadcast_to(lidx_ref[l, :][None, :], (s, _CHUNK))
            g = jnp.take_along_axis(blk, bidx, axis=1)
            acc = acc + val_ref[l, :][None, :] * g
        out_ref[:] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ell_l, _CHUNK), lambda i, c0, sb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ell_l, _CHUNK), lambda i, c0, sb: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, _CHUNK), lambda i, c0, sb: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, w), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m_pad), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ell_l * m_pad * s,
            bytes_accessed=(2 * ell_l * m_pad + 2 * m_pad * s)
            * jnp.dtype(xt.dtype).itemsize,
            transcendentals=0),
    )(c0, sb, lidx, values, xt)
    return out if m_pad == m else out[:, :m]


def ell_spmm_t(well: WindowedEll, xt: jax.Array) -> jax.Array:
    """yt (s, m) = (A @ x)^T for x given transposed as xt (s, n)."""
    m, n = well.shape
    ell_l = well.lidx.shape[0]
    s = xt.shape[0]
    n_pad = -(-n // _CHUNK) * _CHUNK
    # pad sublanes to a full vreg row count (the hardware gather operates
    # on full 8-sublane registers) and columns to the 128-padded window
    # space the c0 clamping assumes
    s_pad = -(-s // 8) * 8
    if n_pad != n or s_pad != s:
        xt = jnp.pad(xt, ((0, s_pad - s), (0, n_pad - n)))
    if well.sb is not None:
        out = _ell_spmm_t_sliced_impl(well.c0, well.sb, well.lidx,
                                      well.values, xt, ell_l, well.w, m,
                                      well.lidx.shape[1])
    elif well.nc > 1 and window_fits_vmem(well, s):
        out = _ell_spmm_t_nc_impl(well.c0s, well.offs, well.lidx,
                                  well.values, xt, ell_l, well.w,
                                  well.w_super, well.nc, m,
                                  well.lidx.shape[1])
    else:
        # also the degrade path for grouped payloads whose super-window
        # scratch exceeds the VMEM budget at this s while the single
        # window still fits (ADVICE r03): run nc=1 off the retained
        # per-chunk c0 instead of losing the kernel entirely
        out = _ell_spmm_t_impl(well.c0, well.lidx, well.values, xt,
                               ell_l, well.w, m, well.lidx.shape[1])
    return out if s_pad == s else out[:s]


# VMEM budget for the double-buffered (2, s_pad, w) window scratch: the
# chip has ~16 MB/core; leave room for the lidx/values/out blocks and
# Mosaic's own overheads.  Wide-s multivectors exceed it (ADVICE r02) -
# they take the XLA path instead of failing Mosaic compilation.
_SCRATCH_BUDGET_BYTES = 8 * 1024 * 1024


def window_fits_vmem(well: WindowedEll, s: int, itemsize: int = 4,
                     nc1: bool = False) -> bool:
    """Does the double-buffered window scratch fit the VMEM budget?
    ``nc1=True`` checks the single-chunk (w-wide) scratch only - the
    degrade target when the grouped super-window is what overflows."""
    s_pad = -(-s // 8) * 8
    w_eff = well.w if nc1 else max(well.w,
                                   well.w_super if well.nc > 1 else 0)
    return 2 * s_pad * w_eff * itemsize <= _SCRATCH_BUDGET_BYTES


def ell_spmm(ell, x: jax.Array) -> jax.Array:
    """Dispatching ELL SpMM in (n, s) layout: dense-window MXU kernel
    for wide multivectors (s >= wide.min_s, payload present - the
    gather kernel's issue cost grows with s while the MXU route's does
    not, see wide_spmm.py), windowed gather Pallas kernel on TPU
    float32 when the payload qualifies, XLA take path otherwise."""
    if getattr(ell, "wide", None) is not None:
        from rails_tpu.sparse.wide_spmm import wide_spmm

        y = wide_spmm(ell, x)
        if y is not None:
            return y
    well = getattr(ell, "well", None)
    if (well is not None
            and jax.default_backend() == "tpu"
            and x.dtype == jnp.float32
            and x.ndim == 2
            and window_fits_vmem(well, x.shape[1], x.dtype.itemsize,
                                 nc1=True)):
        # nc1=True: qualification needs only the single-chunk window to
        # fit - ell_spmm_t degrades grouped payloads to the nc=1 kernel
        # when the super-window alone overflows (ADVICE r03)
        return ell_spmm_t(well, x.T).T
    return ell.matmat(x)
