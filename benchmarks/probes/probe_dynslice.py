"""Probe: can a Pallas TPU kernel read a VMEM window at a *dynamic*
128-aligned lane offset (sub-block id from SMEM scalar prefetch)?

Needed for the sliced-window ELL layout: one dynamic_gather per slot
from the sub-block named by sb[chunk, slot], instead of w/128 masked
gathers.  Also probes gather at s=1..8 sublanes (the MOC small-s crash).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128


def probe_dynslice(s, w, nw):
    def kernel(sb_ref, x_ref, idx_ref, o_ref):
        i = pl.program_id(0)
        sb = sb_ref[i]
        blk = x_ref[:, pl.ds(pl.multiple_of(sb * C, C), C)]
        o_ref[:] = jnp.take_along_axis(blk, idx_ref[:], axis=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(s, w)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, size=(s, C)), jnp.int32)
    sb = jnp.asarray(rng.integers(0, nw, size=(4,)), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((s, C), lambda i, sb: (0, i),
                               memory_space=pltpu.VMEM),
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((s, 4 * C), jnp.float32),
        )(sb, x, idx)
        out = np.asarray(out)
        ok = True
        for i in range(4):
            blk = np.asarray(x)[:, int(sb[i]) * C:(int(sb[i]) + 1) * C]
            ref = np.take_along_axis(blk, np.asarray(idx), axis=1)
            ok &= np.allclose(out[:, i * C:(i + 1) * C], ref)
        print(f"dynslice s={s} w={w}: compiled, correct={ok}")
    except Exception as e:
        print(f"dynslice s={s} w={w}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}")


def probe_small_s(s):
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(s, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, C, size=(s, C)), jnp.int32)
    try:
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((s, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
        ok = np.allclose(np.asarray(out), np.take_along_axis(
            np.asarray(x), np.asarray(idx), axis=1))
        print(f"gather s={s}: ok={ok}")
    except Exception as e:
        print(f"gather s={s}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for s in (1, 3, 8):
        probe_small_s(s)
    for s, w, nw in ((8, 512, 4), (16, 512, 4)):
        probe_dynslice(s, w, nw)
