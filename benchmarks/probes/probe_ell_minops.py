"""Probe: is the masked windowed-ELL kernel gather-issue-bound or
VPU-issue-bound?

The r03 'gather ceiling' (97M composite (16,128)-gathers/s) was measured
by a microkernel that also spends 2 index-arithmetic vreg-ops per
gather; the production masked kernel spends ~16 vreg-ops per
(slot, sub-block) term (clip, two compares, and, select, mul, add)
around its 2 gather vregs.  If the VPU issue rate - not the gather
unit - is the shared limit, both measure the same number and the
agreement at 0.999 proves nothing.

Test: the same nc-grouped kernel with all per-term arithmetic
PRECOMPUTED host-side -
- lidx_j = clip(lidx - j*128, 0, 127) stored per sub-block, and
- val_j = val * (index in sub-block j) stored per sub-block (mask
  folded into the values; out-of-block terms contribute exactly 0) -
so the inner loop is gather + mul + add only (6 vreg-ops per term vs
~16).  Payload bytes x3 (24 B/nnz - HBM has 4x headroom at this rate).
If this runs ~2x the shipped kernel, the ceiling was VPU issue and the
production kernel should adopt the precomputed layout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rails_tpu.sparse.ell_spmm import (_CHUNK, ell_windowize, ell_spmm_t,
                                       group_windows, windowize_arrays)
from benchmarks.probes.probe_ell_ab import build, chain_time


def precompute(lidx, values, w):
    """(m, L) window-local -> per-sub-block (m, L*nw) clipped indices and
    mask-folded values (term (l, j) at column l*nw + j)."""
    nw = w // _CHUNK
    m, ell_l = lidx.shape
    lj = np.zeros((m, ell_l * nw), np.int32)
    vj = np.zeros((m, ell_l * nw), values.dtype)
    for j in range(nw):
        inb = (lidx >= j * _CHUNK) & (lidx < (j + 1) * _CHUNK)
        lj[:, j::nw] = np.clip(lidx - j * _CHUNK, 0, _CHUNK - 1)
        vj[:, j::nw] = np.where(inb, values, 0.0)
    return lj, vj


def minops_nc(c0s, offs, lj, vj, xt, terms, w, w_super, nc, m):
    """nc-grouped masked kernel, gather+mul+add inner loop only."""
    s = xt.shape[0]
    nb = m // _CHUNK
    nbs = nb // nc
    nw = w // _CHUNK

    def kernel(c0s_ref, offs_ref, lj_ref, vj_ref, xt_ref, out_ref,
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
            for t in range(terms):
                j = t % nw
                blk = w_ref[slot, :, pl.ds(
                    pl.multiple_of((base + j) * _CHUNK, _CHUNK), _CHUNK)]
                row = lj_ref[t, c * _CHUNK:(c + 1) * _CHUNK]
                bidx = jnp.broadcast_to(row[None, :], (s, _CHUNK))
                g = jnp.take_along_axis(blk, bidx, axis=1)
                acc = acc + vj_ref[t, c * _CHUNK:(c + 1) * _CHUNK][None, :] * g
            out_ref[:, c * _CHUNK:(c + 1) * _CHUNK] = \
                acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbs,),
        in_specs=[
            pl.BlockSpec((terms, nc * _CHUNK),
                         lambda i, c0s, offs: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((terms, nc * _CHUNK),
                         lambda i, c0s, offs: (0, i),
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
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
    )(c0s, offs, lj, vj, xt)


def main():
    print("devices:", jax.devices(), flush=True)
    m, ell_l, band, s, nc = 1 << 21, 8, 64, 16, 4
    indices, values, nnz = build(m, ell_l, band, np.float32)
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    x_np = np.asarray(xt)
    ref = np.zeros((s, m), np.float32)
    for l in range(indices.shape[1]):
        ref += values[:, l][None, :] * x_np[:, indices[:, l]]

    # shipped kernel for the baseline on THIS tunnel session
    well = ell_windowize(indices, values, (m, m), layout="masked")
    fn0 = jax.jit(lambda x: ell_spmm_t(well, x))
    y0 = np.asarray(fn0(xt))
    assert np.allclose(y0, ref, atol=1e-2)
    dt0 = chain_time(fn0, xt)
    print(f"shipped masked nc={well.nc}: {nnz / dt0 / 1e9:.3f} Gnnz/s",
          flush=True)

    c0, lidx, vals, w = windowize_arrays(indices, values, (m, m))
    nw = w // _CHUNK
    c0s, offs, w_super = group_windows(np.asarray(c0), w, nc, m)
    lj, vj = precompute(lidx, vals.astype(np.float32), w)
    terms = ell_l * nw
    # drop all-zero term columns? terms where vj is identically zero
    live = np.flatnonzero(np.abs(vj).max(axis=0) > 0)
    # keep alignment of j = t % nw: only drop from the end if possible;
    # simplest: keep all terms (the arithmetic structure needs t -> j)
    print(f"w={w} nw={nw} terms={terms} "
          f"(live {len(live)}/{terms})", flush=True)
    lj_t = jnp.asarray(np.ascontiguousarray(lj.T))
    vj_t = jnp.asarray(np.ascontiguousarray(vj.T))
    c0s_j, offs_j = jnp.asarray(c0s), jnp.asarray(offs)
    try:
        # payloads as jit ARGUMENTS, never closure constants (the
        # CLAUDE.md HTTP-413 gotcha - embedded 400 MB constants exceed
        # the remote-compile body limit)
        fn2 = jax.jit(lambda lj_a, vj_a, x: minops_nc(
            c0s_j, offs_j, lj_a, vj_a, x, terms, w, w_super, nc, m))
        fn = lambda x: fn2(lj_t, vj_t, x)
        y = np.asarray(fn(xt))
        err = np.abs(y - ref).max() / np.abs(ref).max()
        dt = chain_time(fn, xt)
        print(f"minops ({terms} gathers/chunk-row): "
              f"{nnz / dt / 1e9:.3f} Gnnz/s (err {err:.2e}, "
              f"{dt0 / dt:.2f}x shipped)", flush=True)
    except Exception as e:
        print(f"minops: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:240]}", flush=True)

    # variant 2: SAME minimal inner loop but only the LIVE terms kept,
    # packed host-side per chunk (generalizes the sliced idea at term
    # granularity: each term column carries its own j via a per-term
    # sub-block id folded into a per-chunk scalar table).  Skipped here:
    # per-chunk term counts vary and the static shape must cover the
    # worst chunk - measured live fraction above tells whether the win
    # could reach 3*L/terms_live.
    print("done", flush=True)


if __name__ == "__main__":
    main()
