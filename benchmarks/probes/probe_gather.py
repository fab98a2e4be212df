"""Probe: which gather forms does Mosaic support inside a Pallas TPU
kernel?  Decides the ELL SpMM kernel design (VERDICT round-1 item 4):

A. sublane gather: w (n, s) in VMEM, idx (r,) -> w[idx, :]
B. lane gather:    wt (s, n) in VMEM, idx (r,) -> wt[:, idx]
C. one-hot matmul fallback cost (MXU)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def try_kernel(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(kernel, out_shape=out_shape,
                            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                                      for _ in args],
                            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        y = jax.jit(fn)(*args)
        jax.block_until_ready(y)
        print(f"{name}: OK", flush=True)
        return np.asarray(y)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


n, s, r = 2048, 8, 1024
w = jnp.asarray(rng.uniform(-1, 1, (n, s)), jnp.float32)
wt = jnp.asarray(np.asarray(w).T)
idx = jnp.asarray(rng.integers(0, n, r), jnp.int32)


def k_sublane(w_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(w_ref[:], i_ref[:], axis=0)


def k_lane(w_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(w_ref[:], i_ref[:], axis=1)


ya = try_kernel("A sublane take", k_sublane,
                jax.ShapeDtypeStruct((r, s), jnp.float32), w, idx)
if ya is not None:
    ref = np.asarray(w)[np.asarray(idx)]
    print("  A correct:", np.allclose(ya, ref))
yb = try_kernel("B lane take", k_lane,
                jax.ShapeDtypeStruct((s, r), jnp.float32), wt, idx)
if yb is not None:
    ref = np.asarray(wt)[:, np.asarray(idx)]
    print("  B correct:", np.allclose(yb, ref))


def k_dyn_slice_loop(w_ref, i_ref, o_ref):
    # row-at-a-time dynamic slice (always supported, possibly slow)
    def body(j, _):
        o_ref[j, :] = w_ref[i_ref[j], :]
        return 0
    jax.lax.fori_loop(0, r, body, 0)


yc = try_kernel("C per-row dynamic index loop", k_dyn_slice_loop,
                jax.ShapeDtypeStruct((r, s), jnp.float32), w, idx)
if yc is not None:
    ref = np.asarray(w)[np.asarray(idx)]
    print("  C correct:", np.allclose(yc, ref))
