"""Probe: why no VMEM-window split pays on PURE Barabasi-Albert
sparsity (VERDICT r04 item 5, the "committed probe" branch), plus the
superhub-with-locality class where hub-splitting DOES pay.

Host analysis at m = 2^20 (no TPU needed for the impossibility half):

1. **Hub coverage**: fraction of nnz incident to the n highest-degree
   vertices.  BA theory: edge-ends at degree > tau carry k/tau of the
   mass, and a VMEM-window-sized hub set (w <= 2048) sits at
   tau ~ k sqrt(m/w), so coverage ~ sqrt(w/m) (~4-6%) - measured below.
2. **Remainder windows**: per-128-row-chunk column spans of the
   non-hub remainder after RCM.  BA minus hubs is still an expander:
   spans stay ~m, far over the 2048 window cap - the windowed kernel
   can never host it, and 94%+ of the nnz stays on the take path.
   => hub-splitting cannot pay on pure BA; the split targets the
   superhub-with-locality class instead (sparse/hub.py docstring), and
   the bench hub phase measures its >= 10x there.

Run host-only:  python benchmarks/probes/probe_hub_ba.py
Writes benchmarks/probes/PROBE_hub_ba.json.
"""

import json
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")


def ba_matrix(m: int, k: int, rng) -> sp.csr_matrix:
    """Continuum-approximation Barabasi-Albert: node v attaches its k
    edges to j < v with p(j) ~ 1/sqrt(j v) (the exact BA attachment
    kernel in arrival order), via inverse-CDF sampling j = floor(v u^2).
    Reproduces the d^-3 degree law and the sqrt coverage scaling."""
    v = np.repeat(np.arange(1, m), k)
    u = rng.random(len(v))
    j = np.minimum((v * u * u).astype(np.int64), v - 1)
    data = np.ones(len(v))
    a = sp.coo_matrix((data, (v, j)), shape=(m, m))
    a = (a + a.T).tocsr()
    a.sum_duplicates()
    return a


def chunk_spans(a: sp.csr_matrix, chunk: int = 128) -> np.ndarray:
    m = a.shape[0]
    nb = m // chunk
    spans = np.zeros(nb, np.int64)
    indptr, indices = a.indptr, a.indices
    for b in range(nb):
        lo, hi = indptr[b * chunk], indptr[(b + 1) * chunk]
        if hi > lo:
            cols = indices[lo:hi]
            spans[b] = cols.max() - cols.min() + 1
    return spans


def main():
    from rails_tpu.sparse.hub import hub_coverage

    m, k = 1 << 20, 8
    rng = np.random.default_rng(0)
    a = ba_matrix(m, k, rng)
    out = {"m": m, "k": k, "nnz": int(a.nnz),
           "max_degree": int(np.diff(a.indptr).max())}
    for h in (512, 1024, 2048):
        out[f"coverage_top{h}"] = hub_coverage(a, h)
        out[f"sqrt_w_over_m_{h}"] = float(np.sqrt(h / m))

    # remainder after removing the top-2048 hubs, RCM-reordered
    deg = np.asarray(np.diff(a.indptr))
    hubs = np.argsort(-deg)[:2048]
    mask = np.ones(m, bool)
    mask[hubs] = False
    rest = a[mask][:, mask].tocsr()
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = reverse_cuthill_mckee(rest, symmetric_mode=True)
    rest_p = rest[perm][:, perm].tocsr()
    spans = chunk_spans(rest_p)
    out["remainder_nnz_frac"] = float(rest.nnz / a.nnz)
    out["remainder_chunk_span_median"] = int(np.median(spans))
    out["remainder_chunk_span_p90"] = int(np.percentile(spans, 90))
    out["window_cap"] = 2048
    out["remainder_windowizable"] = bool(np.percentile(spans, 99) <= 2048)
    out["conclusion"] = (
        "hub coverage ~sqrt(w/m) (<6% at any VMEM-window-sized hub "
        "set) and the RCM'd remainder's chunk spans are >> the window "
        "cap: no split with VMEM-bounded windows accelerates pure BA "
        "- the expander remainder stays on the take path.  The split "
        "pays on superhub-with-locality matrices (bench ell phase "
        "hub_* fields)")
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROBE_hub_ba.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
