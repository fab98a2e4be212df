"""Live-chip probe: dense-window MXU kernel (wide_spmm) vs the gather
kernel at wide operand counts (VERDICT r04 next-round item 4).

The round-4 probes measured the MXU one-hot route's ingredients
standalone (P streams at 710 GB/s; 3xbf16 at s=16 is 8x row-starved);
this probe times the DISPATCHED kernel end to end at s in {16, 64, 128}
against the gather kernel on the same payload, plus an on-hardware
accuracy check of the 3-pass and 6-pass plane decompositions.

Geometry: banded-unstructured ELL (the bench ell-phase shape) at
m = 2^18 - the P planes are then ~200 MB/plane, big enough to stream
from HBM (no cache residency) while keeping the tunnel transfer time
sane.  Run from /root/repo on the live chip:

    python benchmarks/probes/probe_wide_s.py
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from rails_tpu.sparse.ell_spmm import ell_spmm_t  # noqa: E402
from rails_tpu.sparse.formats import sparse_from_scipy  # noqa: E402
from rails_tpu.sparse.wide_spmm import (  # noqa: E402
    build_wide_window,
    wide_spmm_t,
)


def chain_time(fn, x0, total_fn, lo, hi, repeats=3):
    def chain(reps):
        y = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn(y)
        float(total_fn(y))
        return time.perf_counter() - t0

    chain(lo)
    d_los = [chain(lo) for _ in range(repeats)]
    d_his = [chain(hi) for _ in range(repeats)]
    return max(min(d_his) - min(d_los), 1e-9) / (hi - lo)


def main():
    assert jax.default_backend() != "cpu", jax.default_backend()
    m, ell_l, band = 1 << 18, 8, 64
    rng = np.random.default_rng(0)
    base = np.arange(m)
    idx = np.clip(base[:, None] + rng.integers(-band, band + 1, (m, ell_l)),
                  0, m - 1)
    val = rng.uniform(-1, 1, (m, ell_l)) * 0.2
    a = sp.coo_matrix((val.ravel(), (np.repeat(base, ell_l), idx.ravel())),
                      shape=(m, m)).tocsr()
    nnz = int(a.nnz)
    op = sparse_from_scipy(a, fmt="ell", dtype=jnp.float32)
    well = op.fwd.well
    assert well is not None
    print(f"windowed: w={well.w} nc={well.nc}", file=sys.stderr, flush=True)
    wide3 = build_wide_window(well, passes=3)
    wide6 = build_wide_window(well, passes=6)
    assert wide3 is not None
    total = jax.jit(lambda x: jnp.sum(jnp.abs(x)))
    out = {"m": m, "ell_l": ell_l, "band": band, "w": well.w,
           "p_bytes_per_plane": int(np.prod(wide3.p_hi.shape)) * 2,
           "device": str(getattr(jax.devices()[0], "device_kind", "?"))}

    # accuracy on hardware (f64 host reference), s = 64
    s_acc = 64
    x = jnp.asarray(rng.uniform(-1, 1, (m, s_acc)), jnp.float32)
    ref = a.astype(np.float64) @ np.asarray(x, np.float64)
    scale = np.abs(ref).max()
    for name, wd in (("pass3", wide3), ("pass6", wide6)):
        y = np.asarray(wide_spmm_t(wd, x.T).T, np.float64)
        out[f"{name}_rel_err"] = float(np.abs(y - ref).max() / scale)
    y_g = np.asarray(ell_spmm_t(well, x.T).T, np.float64)
    out["gather_rel_err"] = float(np.abs(y_g - ref).max() / scale)
    print(json.dumps(out), flush=True)

    for s in (16, 64, 128):
        xt = jnp.asarray(rng.uniform(-1, 1, (s, m)), jnp.float32)
        # no outer jit closure: the payload would embed as an HLO
        # constant and the remote-compile tunnel rejects 400 MB bodies
        # (HTTP 413) - the inner impls are jitted with payload ARGS
        g_fn = lambda z: ell_spmm_t(well, z)          # noqa: E731
        w3_fn = lambda z: wide_spmm_t(wide3, z)       # noqa: E731
        w6_fn = lambda z: wide_spmm_t(wide6, z)       # noqa: E731
        print(f"s={s}: compiling...", file=sys.stderr, flush=True)
        for fn in (g_fn, w3_fn, w6_fn):
            float(total(fn(xt)))
        dt_g = chain_time(g_fn, xt, total, 5, 25)
        dt_3 = chain_time(w3_fn, xt, total, 5, 25)
        dt_6 = chain_time(w6_fn, xt, total, 5, 25)
        out[f"s{s}"] = {
            "gather_nnz_per_s": nnz / dt_g,
            "wide3_nnz_per_s": nnz / dt_3,
            "wide6_nnz_per_s": nnz / dt_6,
            "wide3_vs_gather": dt_g / dt_3,
            "wide6_vs_gather": dt_g / dt_6,
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
