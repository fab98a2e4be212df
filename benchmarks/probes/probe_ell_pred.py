"""Probe: predicated-slot sliced windowed-ELL kernel.

The sliced layout pads every chunk to the global worst-case slot count
L' (24 at the bench geometry) while the median chunk only needs ~20;
padded slots still cost a gather each.  This variant scalar-prefetches
the per-chunk live slot count lp[chunk] and predicates each slot's
gather+mac with ``pl.when(l < lp)`` above a static floor (the min lp
across chunks runs unpredicated - no branch cost where it cannot help).

Measures masked vs sliced vs sliced-pred at the bench geometry.
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

import rails_tpu.sparse.ell_spmm as es
from rails_tpu.sparse.ell_spmm import (_CHUNK, ell_spmm_t, ell_windowize,
                                       windowize_arrays, _slice_layout)
from benchmarks.probes.probe_ell_ab import build, chain_time


def sliced_pred_impl(c0, sb, lp, lidx, values, xt, ell_l, w, m, m_pad,
                     lp_floor):
    s = xt.shape[0]
    nb = m_pad // _CHUNK

    def kernel(c0_ref, sb_ref, lp_ref, lidx_ref, val_ref, xt_ref, out_ref,
               w_ref, sems):
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
        lp_i = lp_ref[i]

        def mac(l, acc):
            sbl = sb_ref[i, l]
            blk = w_ref[slot, :,
                        pl.ds(pl.multiple_of(sbl * _CHUNK, _CHUNK), _CHUNK)]
            bidx = jnp.broadcast_to(lidx_ref[l, :][None, :], (s, _CHUNK))
            g = jnp.take_along_axis(blk, bidx, axis=1)
            return acc + val_ref[l, :][None, :] * g

        acc = jnp.zeros((s, _CHUNK), dtype=jnp.float32)
        for l in range(lp_floor):
            acc = mac(l, acc)
        out_ref[:] = acc.astype(out_ref.dtype)
        # predicated tail: pl.when skips the gather entirely (a where-
        # select would still pay for it); out_ref carries the partial sum
        for l in range(lp_floor, ell_l):
            @pl.when(l < lp_i)
            def _(l=l):
                out_ref[:] = (out_ref[:]
                              + mac(l, jnp.zeros((s, _CHUNK), jnp.float32))
                              .astype(out_ref.dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ell_l, _CHUNK), lambda i, c0, sb, lp: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ell_l, _CHUNK), lambda i, c0, sb, lp: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, _CHUNK), lambda i, c0, sb, lp: (0, i),
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
    )(c0, sb, lp, lidx, values, xt)
    return out if m_pad == m else out[:, :m]


def per_chunk_lp(lidx, values, ell_l, nw):
    """(nb,) live slot counts the sliced layout needs per chunk."""
    m_pad = lidx.shape[0]
    nb = m_pad // _CHUNK
    rows = np.arange(_CHUNK)
    lp = np.zeros(nb, np.int32)
    for b in range(nb):
        lb = lidx[b * _CHUNK:(b + 1) * _CHUNK]
        vb = values[b * _CHUNK:(b + 1) * _CHUNK]
        bucket = np.where(vb != 0, lb // _CHUNK, nw)
        counts = np.zeros((_CHUNK, nw + 1), np.int64)
        np.add.at(counts, (rows[:, None], bucket), 1)
        lp[b] = counts[:, :nw].max(axis=0).sum()
    return lp


def main():
    m, ell_l, band, s = 1 << 21, 8, 64, 16
    dtype = np.float32
    indices, values, nnz = build(m, ell_l, band, dtype)
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)

    # masked baseline
    well_m = ell_windowize(indices, values, (m, m), layout="masked")
    fn_m = lambda x: ell_spmm_t(well_m, x)
    y_ref = np.asarray(fn_m(xt))
    dt = chain_time(fn_m, xt)
    print(f"masked:      w={well_m.w}  {nnz / dt / 1e9:.2f} Gnnz/s "
          f"({dt * 1e3:.3f} ms)")

    # sliced (cap lifted so it qualifies at the bench geometry)
    es._SLICE_FACTOR = 100.0
    well_s = ell_windowize(indices, values, (m, m), layout="sliced")
    if well_s is None:
        print("sliced: does not qualify even with lifted cap")
        return
    # lp from the masked window-local indices (same windows)
    c0, lidx_w, vals_w, w = windowize_arrays(indices, values, (m, m))
    lp_arr = per_chunk_lp(lidx_w, vals_w, ell_l, w // _CHUNK)
    lpp = well_s.lidx.shape[0]
    print(f"sliced L'={lpp}, lp: min={lp_arr.min()} med="
          f"{np.median(lp_arr):.0f} max={lp_arr.max()}")
    # NO outer jit: an outer jit closing over the payload embeds it as
    # HLO constants - at L'=24, m=2^21 that is ~400MB of request body,
    # which the remote-compile tunnel rejects (HTTP 413).  The inner
    # impl is already jitted with the payload as runtime arguments.
    fn_s = lambda x: ell_spmm_t(well_s, x)
    try:
        y_s = np.asarray(fn_s(xt))
        err = np.max(np.abs(y_s - y_ref))
        dt_s = chain_time(fn_s, xt)
        print(f"sliced:      L'={lpp}  {nnz / dt_s / 1e9:.2f} Gnnz/s "
              f"({dt_s * 1e3:.3f} ms)  err={err:.2e}")
    except Exception as e:
        print(f"sliced FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:240]}")

    # sliced + predicated tail
    n_pad = -(-m // _CHUNK) * _CHUNK
    s_pad = -(-s // 8) * 8
    xt_p = jnp.pad(xt, ((0, s_pad - s), (0, n_pad - m))) \
        if (n_pad != m or s_pad != s) else xt
    floor = int(lp_arr.min())
    lp_j = jnp.asarray(lp_arr)
    pred_jit = jax.jit(sliced_pred_impl,
                       static_argnames=("ell_l", "w", "m", "m_pad",
                                        "lp_floor"))
    fn_p = lambda x: pred_jit(
        well_s.c0, well_s.sb, lp_j, well_s.lidx, well_s.values, x,
        ell_l=lpp, w=well_s.w, m=m, m_pad=well_s.lidx.shape[1],
        lp_floor=floor)[:s]
    try:
        y_p = np.asarray(fn_p(xt_p))
        err = np.max(np.abs(y_p - y_ref))
        dt_p = chain_time(fn_p, xt_p)
        print(f"sliced-pred: floor={floor}  {nnz / dt_p / 1e9:.2f} Gnnz/s "
              f"({dt_p * 1e3:.3f} ms)  err={err:.2e}")
    except Exception as e:
        print(f"sliced-pred FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:240]}")


if __name__ == "__main__":
    main()
