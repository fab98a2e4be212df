"""Probe: does Mosaic compile in-kernel 2D transposes, and at what
shapes/speed?  Needed for the native-(m,s)-layout DIA kernel
(probe_kernel_nt) which wants (win, s) -> (s, win) per block."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_transpose(rows, s):
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], 0, 1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(rows, s)), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s, rows), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.allclose(np.asarray(out), np.asarray(x).T)
        print(f"transpose ({rows}, {s}) -> ({s}, {rows}): ok={ok}")
        return True
    except Exception as e:
        print(f"transpose ({rows}, {s}): FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}")
        return False


if __name__ == "__main__":
    print("devices:", jax.devices())
    for rows, s in ((128, 16), (1024, 16), (8192, 16), (32768, 16),
                    (1024, 8), (26112, 16)):
        try_transpose(rows, s)
