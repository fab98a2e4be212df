"""Probe: windowed-ELL SpMM Pallas kernel prototype.

Design constraints measured by probe_dyngather.py: tpu.dynamic_gather
(jnp.take_along_axis) only compiles for lane gathers on a 128-wide
operand.  So the kernel gathers per 128-row output chunk from a
per-chunk column *window* (s, W) DMA'd into VMEM, decomposed into
W/128 sub-blocks with a clip+select per sub-block.

Timed against the XLA per-slot take path at banded geometry.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128  # output chunk rows


@functools.partial(jax.jit, static_argnames=("ell_l", "w", "m"))
def ell_spmm_t_probe(c0, lidx, values, xt, ell_l: int, w: int, m: int):
    """yt (s, m) = (A @ x)^T, A in windowed-ELL form.

    c0: (nchunks,) int32 window starts (128-aligned, c0 + w <= m)
    lidx: (ell_l, m) int32 window-local indices
    values: (ell_l, m) payload
    xt: (s, m) transposed multivector
    """
    s = xt.shape[0]
    nb = m // C
    nw = w // C

    def kernel(c0_ref, lidx_ref, val_ref, xt_ref, out_ref, w_ref, sems):
        i = pl.program_id(0)

        def dma(slot, blk):
            start = pl.multiple_of(c0_ref[blk], C)
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

        acc = jnp.zeros((s, C), dtype=jnp.float32)
        for l in range(ell_l):
            row_idx = lidx_ref[l, :]
            bidx = jnp.broadcast_to(row_idx[None, :], (s, C))
            vrow = val_ref[l, :][None, :]
            for j in range(nw):
                loc = jnp.clip(bidx - j * C, 0, C - 1)
                g = jnp.take_along_axis(w_ref[slot, :, j * C:(j + 1) * C],
                                        loc, axis=1)
                mask = (bidx >= j * C) & (bidx < (j + 1) * C)
                acc = acc + jnp.where(mask, vrow * g, 0.0)
        out_ref[:] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ell_l, C), lambda i, c0: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ell_l, C), lambda i, c0: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((s, C), lambda i, c0: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, s, w), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, m), xt.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * ell_l * m * s,
            bytes_accessed=(2 * ell_l * m + 2 * m * s) * 4,
            transcendentals=0),
    )(c0, lidx, values, xt)


@functools.partial(jax.jit, static_argnames=("ell_l",))
def ell_spmm_xla(indices, values, x, ell_l: int):
    m = indices.shape[0]
    y = jnp.zeros((m,) + x.shape[1:], dtype=x.dtype)
    for l in range(ell_l):
        y = y + values[:, l][:, None] * jnp.take(x, indices[:, l], axis=0)
    return y


def make_banded_ell(m, ell_l, band, seed=0):
    """Random banded unstructured matrix in ELL form."""
    rng = np.random.default_rng(seed)
    base = np.arange(m)
    idx = base[:, None] + rng.integers(-band, band + 1, size=(m, ell_l))
    idx = np.clip(idx, 0, m - 1).astype(np.int32)
    val = rng.uniform(-1, 1, size=(m, ell_l)).astype(np.float32)
    return idx, val


def windowize(idx, m):
    """Per-128-chunk window starts + local indices; returns minimal w."""
    nb = m // C
    ci = idx.reshape(nb, C, -1)
    c0 = ci.min(axis=(1, 2))
    c0 = (c0 // C) * C
    span = ci.max(axis=(1, 2)) - c0 + 1
    w = int(-(-span.max() // C)) * C
    c0 = np.minimum(c0, m - w).astype(np.int32)
    lidx = (idx - np.repeat(c0, C)[:, None]).astype(np.int32)
    return c0, lidx, w


def bench(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    print("devices:", jax.devices())
    m, s = 1 << 21, 16
    for ell_l, band in ((8, 64), (8, 192), (16, 64)):
        idx, val = make_banded_ell(m, ell_l, band)
        c0, lidx, w = windowize(idx, m)
        xt = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (s, m)), jnp.float32)
        lidx_t = jnp.asarray(lidx.T.copy())
        val_t = jnp.asarray(val.T.copy())
        c0_j = jnp.asarray(c0)
        nnz = m * ell_l
        try:
            yt = ell_spmm_t_probe(c0_j, lidx_t, val_t, xt, ell_l, w, m)
            ref = ell_spmm_xla(jnp.asarray(idx), jnp.asarray(val), xt.T,
                               ell_l)
            err = float(jnp.max(jnp.abs(yt.T - ref)))
            dt_k = bench(ell_spmm_t_probe, c0_j, lidx_t, val_t, xt,
                         ell_l, w, m)
            dt_x = bench(ell_spmm_xla, jnp.asarray(idx), jnp.asarray(val),
                         xt.T, ell_l)
            print(f"L={ell_l} band={band} w={w}: err={err:.2e} "
                  f"kernel={nnz/dt_k/1e9:.2f} Gnnz/s "
                  f"xla={nnz/dt_x/1e9:.2f} Gnnz/s "
                  f"speedup={dt_x/dt_k:.2f}x")
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"L={ell_l} band={band} w={w}: FAIL "
                  f"{type(e).__name__}: {msg}")
