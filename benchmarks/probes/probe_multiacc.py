"""Probe: is the windowed-ELL kernel gather-ISSUE-bound or
ADD-LATENCY-bound?

The r03 'gather ceiling' microkernel (bench.py _gather_issue_rate) and
the production kernel both accumulate through ONE serialized chain
(``acc = acc + take(...)``): every floating add depends on the previous
one, so if the VPU add latency exceeds the gather issue interval, the
chain - not the gather unit - sets the measured ~4.8 cycles/vreg.  The
suspicious 0.999 agreement between kernel and microkernel is consistent
with both hitting the same serialization.

This probe runs the same gather+mac loop with 1/2/4/8 independent
accumulators (summed once at the end).  If the rate rises with
accumulator count, the ceiling was the add chain and the production
kernel gains the same factor by splitting its accumulator.

Also re-runs the MXU one-hot probe with P passed as a jit ARGUMENT
(the r04 first attempt closed over the 537 MB array -> HTTP 413 from
the remote-compile tunnel, the CLAUDE.md payload gotcha).
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


def gather_rate(s=16, nb=2048, g=64, nacc=1, with_mac=True):
    rng = np.random.default_rng(1)
    s_pad = -(-s // 8) * 8
    idx = jnp.asarray(rng.integers(0, 128, (s_pad, 128)), jnp.int32)
    vals = jnp.asarray(rng.uniform(-1, 1, (s_pad, 128)), jnp.float32)

    def kernel(idx_ref, val_ref, x_ref, o_ref):
        accs = [jnp.zeros((s_pad, 128), jnp.float32) for _ in range(nacc)]
        base = idx_ref[:]
        for k in range(g):
            loc = (base + k) & 127
            gathered = jnp.take_along_axis(x_ref[:], loc, axis=1)
            if with_mac:
                gathered = val_ref[:] * gathered
            accs[k % nacc] = accs[k % nacc] + gathered
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:] = (acc * (1.0 / g)).astype(o_ref.dtype)

    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((s_pad, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((s_pad, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((s_pad, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((s_pad, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, 128 * nb), jnp.float32),
    )(idx, vals, x))
    x0 = jnp.asarray(rng.uniform(-1, 1, (s_pad, 128 * nb)), jnp.float32)
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    float(total(fn(x0)))
    dt = chain_time(fn, x0, 5, 25)
    return nb * g / dt


def build_p(lidx, values, w, dtype):
    m, ell_l = lidx.shape
    nb = m // _CHUNK
    p = np.zeros((nb, w, _CHUNK), dtype)
    b = np.repeat(np.arange(nb), _CHUNK * ell_l)
    r = np.tile(np.repeat(np.arange(_CHUNK), ell_l), nb)
    np.add.at(p, (b, lidx.ravel(), r), values.ravel())
    return p


def mxu_onehot_arg(c0s, p, xt, w, w_super, nc, m):
    """P enters as a pallas_call ARGUMENT (and the jit wrapper passes it
    as a parameter, never a closure constant)."""
    s = xt.shape[0]
    nb = m // _CHUNK
    nbs = nb // nc

    def kernel(c0s_ref, p_ref, xt_ref, out_ref, w_ref, sems):
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
    print("devices:", jax.devices(), flush=True)
    print("== accumulator scaling (gather+mac, s=16) ==", flush=True)
    base = None
    for nacc in (1, 2, 4, 8):
        try:
            r = gather_rate(nacc=nacc)
            base = base or r
            print(f"nacc={nacc}: {r / 1e6:.1f}M composite gathers/s "
                  f"({r / base:.2f}x of nacc=1)", flush=True)
        except Exception as e:
            print(f"nacc={nacc}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    print("== pure gather (no mac) ==", flush=True)
    for nacc in (1, 4):
        try:
            r = gather_rate(nacc=nacc, with_mac=False)
            print(f"nacc={nacc}: {r / 1e6:.1f}M composite gathers/s",
                  flush=True)
        except Exception as e:
            print(f"nacc={nacc}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    # MXU one-hot with P as argument, masked windowize (w=384 geometry)
    from rails_tpu.sparse.ell_spmm import windowize_arrays, group_windows
    m2, ell_l, band, s, nc = 1 << 19, 8, 64, 16, 4
    indices2, values2, nnz2 = build(m2, ell_l, band, np.float32)
    rng = np.random.default_rng(1)
    xt2 = jnp.asarray(rng.uniform(-1, 1, (s, m2)), jnp.float32)
    c0, lidx, vals, w = windowize_arrays(indices2, values2, (m2, m2))
    n_pad = m2
    c0s, offs, w_super = group_windows(np.asarray(c0), w, nc, n_pad)
    lidx_g = lidx + np.repeat(offs, _CHUNK)[:, None] * _CHUNK
    x2_np = np.asarray(xt2)
    ref2 = np.zeros((s, m2), np.float32)
    for l in range(indices2.shape[1]):
        ref2 += values2[:, l][None, :] * x2_np[:, indices2[:, l]]
    print(f"== MXU one-hot (f32, P as arg) w_super={w_super} ==",
          flush=True)
    p = build_p(lidx_g, values2.astype(np.float32), w_super, np.float32)
    p_j = jax.device_put(jnp.asarray(p))
    c0s_j = jnp.asarray(c0s)
    try:
        fn2 = jax.jit(lambda pp, x: mxu_onehot_arg(
            c0s_j, pp, x, w_super, w_super, nc, m2))
        y2 = np.asarray(fn2(p_j, xt2))
        err2 = np.abs(y2 - ref2).max() / np.abs(ref2).max()
        dt2 = chain_time(lambda x: fn2(p_j, x), xt2)
        print(f"mxu-f32 w={w_super}: {nnz2 / dt2 / 1e9:.3f} Gnnz/s "
              f"(err {err2:.2e}, P={p_j.nbytes / 1e9:.2f} GB, "
              f"P-stream {p_j.nbytes / dt2 / 1e9:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"mxu-f32: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:240]}", flush=True)


if __name__ == "__main__":
    main()
