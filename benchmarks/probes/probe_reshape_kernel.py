"""Probe: in-kernel lane->sublane reshape (win/8, 128) -> (win, 16) and
the reverse, composed with transposes.

Why: the native-(m,s)-layout DIA kernel cannot hold (win, 16) VMEM
buffers - Mosaic pads the 16-lane minor dim to 128 (8x memory, OOM at
production block sizes).  Viewing x (m, 16) as its bitcast (m/8, 128)
keeps every VMEM buffer compact; the kernel then needs
reshape((win/8, 128) -> (win, 16)) . transpose to reach the (16, win)
full-lane compute layout, and the reverse on the way out.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(win, s=16):
    def kernel(x_ref, o_ref):
        w = x_ref[:]                           # (win//8, 128)
        wt = jnp.reshape(w, (win, s))          # row-major bitcast view
        c = jnp.swapaxes(wt, 0, 1)             # (s, win) compute layout
        acc = c * 2.0                          # stand-in for the FMA loop
        back = jnp.swapaxes(acc, 0, 1)         # (win, s)
        o_ref[:] = jnp.reshape(back, (win // 8, 128))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(win // 8, 128)), jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((win // 8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = np.allclose(np.asarray(out), np.asarray(x) * 2.0)
        print(f"reshape chain win={win}: ok={ok}")
    except Exception as e:
        print(f"reshape chain win={win}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for win in (1024, 8192, 27648):
        probe(win)
