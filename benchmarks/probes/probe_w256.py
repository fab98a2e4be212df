"""Probe: round-4 routes to close the unstructured-SpMM gap
(VERDICT r03 next-round item 3).

Context.  The masked nc=4 kernel runs 4.14-4.17 Gnnz/s = ~0.999 of its
own gather ceiling (w/128 = 3 gathers per slot-chunk at w=384).  The
three candidate routes past that ceiling:

(a) sliced layout + DMA-staged tables: DEAD by measurement, and not for
    the SMEM reason previously documented - ``_slice_layout`` at the
    bench geometry (m=2^21, L=8, band 64) pads to L' = 23 slots, so the
    sliced ceiling is gops*128*(L/L') = 1.04x the masked one.  The
    padding is structural: the per-chunk slot count is
    sum_j max_over_128_rows count_j(row), and with random in-band draws
    some row concentrates ~all L entries in each sub-block.  No table
    staging changes that.  (Reproduce: this file --lprime.)

(b) narrower windows (THIS probe's main question): each row's span is
    <= 2*band+1 = 129 columns, so every row touches at most TWO
    128-blocks; the third gather exists only because the window DMA
    start is floored to 128.  If ``make_async_copy`` accepts a
    64-aligned lane start, w drops 384 -> 256 and the masked kernel
    does 2 gathers/slot: ceiling x1.5.  Within a group the per-chunk
    VMEM slice offsets stay 128-multiples (all c0 share the 64 phase),
    so only the HBM-side DMA start is off-tile.

(c) MXU one-hot: per 128-row chunk, scatter the chunk's values into a
    dense (w, 128) matrix P host-side (P[c, r] = sum of values of row
    r's entries at window-local column c); then out_chunk(s,128) =
    x_win(s,w) @ P - no gathers at all.  Bytes-bound on P: w bytes/nnz
    f32 at L=8 (128 B/nnz at w=256 -> HBM ceiling 6.4 Gnnz/s).  Probed
    at f32 and (rate-only; accuracy unusable for the solver) bf16.

A gather-route and an MXU-route bound different units (VPU gather issue
vs HBM+MXU), so their measured rates also bound a potential hybrid
kernel (slots split between the two paths, overlapped).
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

from rails_tpu.sparse.ell_spmm import _CHUNK
from benchmarks.probes.probe_ell_ab import build, chain_time


def probe_dma_alignment(s=16, n=4096):
    """Does make_async_copy accept a non-128-aligned lane start?"""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (s, n)), jnp.float32)
    for start, hint in ((128, 128), (64, 64), (192, 64), (100, 4)):
        def kernel(c0_ref, x_ref, o_ref, w_ref, sem, hint=hint):
            st = pl.multiple_of(c0_ref[0], hint)
            cp = pltpu.make_async_copy(
                x_ref.at[:, pl.ds(st, 256)], w_ref, sem)
            cp.start()
            cp.wait()
            o_ref[:] = w_ref[:]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((s, 256), lambda i, c: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((s, 256), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        try:
            out = pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((s, 256), jnp.float32),
            )(jnp.asarray([start], jnp.int32), x)
            ok = np.allclose(np.asarray(out),
                             np.asarray(x)[:, start:start + 256])
            print(f"dma start={start} (hint {hint}): compiled, "
                  f"correct={ok}", flush=True)
        except Exception as e:
            print(f"dma start={start} (hint {hint}): FAIL "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:160]}",
                  flush=True)


def windowize64(indices, values, shape, nc=4):
    """Host-side masked windowize with 64-aligned per-chunk starts,
    grouped nc chunks per super-window (phase-aligned within a group:
    each chunk start is re-floored to group_start + 128k)."""
    m, n = shape
    ell_l = indices.shape[1]
    m_pad = -(-m // _CHUNK) * _CHUNK
    assert m_pad == m
    nb = m // _CHUNK
    ci = indices.reshape(nb, _CHUNK, ell_l)
    c0 = (ci.min(axis=(1, 2)) // 64) * 64
    nbs = nb // nc
    cg = c0.reshape(nbs, nc)
    c0s = cg.min(axis=1)
    # re-floor each chunk's start to group phase (128-multiples from c0s)
    c0_adj = c0s[:, None] + ((cg - c0s[:, None]) // _CHUNK) * _CHUNK
    c0_adj = c0_adj.reshape(-1)
    span = ci.max(axis=(1, 2)) - c0_adj + 1
    w = int(-(-int(span.max()) // _CHUNK)) * _CHUNK
    offs = ((c0_adj - np.repeat(c0s, nc)) // _CHUNK).astype(np.int32)
    w_super = int((c0_adj + w - np.repeat(c0s, nc)).max())
    lidx = (indices - np.repeat(c0_adj, _CHUNK)[:, None]).astype(np.int32)
    return (c0s.astype(np.int32), offs, lidx, w, w_super)


def masked_nc64(c0s, offs, lidx, values, xt, ell_l, w, w_super, nc, m):
    """The shipped masked nc kernel with the DMA start hinted 64-aligned
    (everything else identical to _ell_spmm_t_nc_impl)."""
    s = xt.shape[0]
    nb = m // _CHUNK
    nbs = nb // nc
    nw = w // _CHUNK

    def kernel(c0s_ref, offs_ref, lidx_ref, val_ref, xt_ref, out_ref,
               w_ref, sems):
        i = pl.program_id(0)

        def dma(slot, blk):
            start = pl.multiple_of(c0s_ref[blk], 64)
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
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
    )(c0s, offs, lidx, values, xt)


def build_p(lidx, values, w, dtype):
    """Dense per-chunk one-hot*value matrices: P[b, c, r] = sum of
    values[b*128+r, l] over slots with lidx == c."""
    m, ell_l = lidx.shape
    nb = m // _CHUNK
    p = np.zeros((nb, w, _CHUNK), dtype)
    b = np.repeat(np.arange(nb), _CHUNK * ell_l)
    r = np.tile(np.repeat(np.arange(_CHUNK), ell_l), nb)
    np.add.at(p, (b, lidx.ravel(), r), values.ravel())
    return p


def mxu_onehot(c0s, p, xt, w, w_super, nc, m, pdtype):
    """out_chunk(s,128) = x_win(s,w) @ P_chunk(w,128) on the MXU."""
    s = xt.shape[0]
    nb = m // _CHUNK
    nbs = nb // nc

    def kernel(c0s_ref, p_ref, xt_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def dma(slot, blk):
            start = pl.multiple_of(c0s_ref[blk], 64)
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
        # phase-aligned groups: every chunk's window starts at block 0
        # of the super-window in this probe's geometry (offs==0 when
        # nc*128 <= w; here w covers the whole group span)
        xwin = w_ref[slot, :, pl.ds(0, w)]
        for c in range(nc):
            pc = p_ref[c].astype(jnp.float32)
            out_ref[:, c * _CHUNK:(c + 1) * _CHUNK] = jnp.dot(
                xwin, pc, preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbs,),
        in_specs=[
            pl.BlockSpec((nc, w, _CHUNK), lambda i, c0s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((s, nc * _CHUNK), lambda i, c0s: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, w_super), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
    )(c0s, p, xt)


def main():
    if "--lprime" in sys.argv:
        from rails_tpu.sparse.ell_spmm import (windowize_arrays,
                                               _slice_layout)
        import rails_tpu.sparse.ell_spmm as es
        es._SLICE_FACTOR = 10
        m = 1 << 16
        indices, values, nnz = build(m, 8, 64, np.float32)
        c0, lidx, vals, w = windowize_arrays(indices, values, (m, m))
        sl = _slice_layout(lidx, vals, 8, w // _CHUNK)
        print(f"sliced L' = {sl[0].shape[1]} (L=8, w={w}): "
              f"ceiling vs masked = {3 * 8 / sl[0].shape[1]:.3f}x")
        return

    print("devices:", jax.devices(), flush=True)
    print("== DMA alignment ==", flush=True)
    probe_dma_alignment()

    m, ell_l, band, s, nc = 1 << 21, 8, 64, 16, 4
    indices, values, nnz = build(m, ell_l, band, np.float32)
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
    x_np = np.asarray(xt)
    ref = np.zeros((s, m), np.float32)
    for l in range(indices.shape[1]):
        ref += values[:, l][None, :] * x_np[:, indices[:, l]]

    print("== masked nc=4, 64-aligned window ==", flush=True)
    c0s, offs, lidx, w, w_super = windowize64(indices, values, (m, m),
                                              nc=nc)
    print(f"w={w} w_super={w_super} (128-aligned gives w=384)",
          flush=True)
    lidx_t = jnp.asarray(np.ascontiguousarray(lidx.T))
    val_t = jnp.asarray(np.ascontiguousarray(values.astype(np.float32).T))
    c0s_j, offs_j = jnp.asarray(c0s), jnp.asarray(offs)
    try:
        fn = jax.jit(lambda x: masked_nc64(
            c0s_j, offs_j, lidx_t, val_t, x, ell_l, w, w_super, nc, m))
        y = np.asarray(fn(xt))
        err = np.abs(y - ref).max() / np.abs(ref).max()
        dt = chain_time(fn, xt)
        print(f"masked-64 w={w}: {nnz / dt / 1e9:.3f} Gnnz/s "
              f"(err {err:.2e})", flush=True)
    except Exception as e:
        print(f"masked-64: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:240]}", flush=True)

    # MXU probe at reduced m (P is w bytes/nnz: 2.1 GB at m=2^21)
    m2 = 1 << 19
    indices2, values2, nnz2 = build(m2, ell_l, band, np.float32)
    xt2 = jnp.asarray(rng.uniform(-1, 1, (s, m2)), jnp.float32)
    x2_np = np.asarray(xt2)
    ref2 = np.zeros((s, m2), np.float32)
    for l in range(indices2.shape[1]):
        ref2 += values2[:, l][None, :] * x2_np[:, indices2[:, l]]
    c0s2, offs2, lidx2, w2, ws2 = windowize64(indices2, values2, (m2, m2),
                                              nc=nc)
    # MXU kernel slices the window at block 0 for every chunk: widen w to
    # cover the whole group (w_super) and rebase lidx to the group start
    wg = ws2
    lidx_g = lidx2 + np.repeat(offs2, _CHUNK)[:, None] * _CHUNK
    for pdt, name in ((np.float32, "f32"), (jnp.bfloat16, "bf16")):
        print(f"== MXU one-hot ({name}) m=2^19 ==", flush=True)
        p = build_p(lidx_g, values2.astype(np.float32), wg, np.float32)
        p_j = jnp.asarray(p).astype(pdt)
        c0s2_j = jnp.asarray(c0s2)
        try:
            fn2 = jax.jit(lambda x: mxu_onehot(
                c0s2_j, p_j, x, wg, ws2, nc, m2, pdt))
            y2 = np.asarray(fn2(xt2))
            err2 = np.abs(y2 - ref2).max() / np.abs(ref2).max()
            dt2 = chain_time(fn2, xt2)
            gb = p_j.nbytes / 1e9
            print(f"mxu-{name} w={wg}: {nnz2 / dt2 / 1e9:.3f} Gnnz/s "
                  f"(err {err2:.2e}, P={gb:.2f} GB, "
                  f"P-stream {p_j.nbytes / dt2 / 1e9:.0f} GB/s)",
                  flush=True)
        except Exception as e:
            print(f"mxu-{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:240]}", flush=True)


if __name__ == "__main__":
    main()
