"""Probe: does tpu.dynamic_gather (via jnp.take_along_axis) compile in a
Pallas TPU kernel for (s, win) lane-gather and (win, s) sublane-gather
shapes?  Needed for the ELL SpMM kernel design."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lane_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def sub_gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def run(kind, s, win):
    rng = np.random.default_rng(0)
    if kind == "lane":
        x = jnp.asarray(rng.uniform(size=(s, win)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, win, size=(s, win)), jnp.int32)
        kern = lane_gather_kernel
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    else:
        x = jnp.asarray(rng.uniform(size=(win, s)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, win, size=(win, s)), jnp.int32)
        kern = sub_gather_kernel
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)
        ok = np.allclose(np.asarray(out), ref)
        print(f"{kind} s={s} win={win}: compiled, correct={ok}")
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"{kind} s={s} win={win}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for kind in ("lane", "sub"):
        for (s, win) in ((8, 128), (16, 2048), (16, 8192)):
            run(kind, s, win)
