"""On-chip per-sweep trajectory: force k sweeps (tol=0), pull the panel
to the host, and measure the TRUE max cos^2 in numpy f64 — separates
kernel-arithmetic convergence from Gram-gauge read noise at the exit
threshold.  Also reports the LIVE-PAIR index-distance histogram of the
corrected warm panel (pairs with cos^2 > tol^2), in raw row order and in
row-norm-sorted (eigenvalue-sorted) order — decides whether a banded
local finisher can replace full tournament sweeps.  Run alone on the
chip."""
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import importlib

import jax
import jax.numpy as jnp
import numpy as np

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
DK = importlib.import_module("xitorch_tpu.ops.dc_kernel")

B, N = 16, 256


def emit(**kw):
    print(json.dumps(kw), flush=True)


def f64_cos2(g):
    g = np.asarray(g, np.float64)
    nrm = (g * g).sum(-1)
    gram = np.einsum("bik,bjk->bij", g, g)
    den = np.maximum(nrm[:, :, None] * nrm[:, None, :], 1e-300)
    r = gram * gram / den
    np.einsum("bii->bi", r)[:] = 0.0
    return r


def live_pair_stats(g, tol2, label):
    """Histogram of |i-j| over pairs with cos^2 > tol2, raw and sorted
    by row norm (~ shifted eigenvalue)."""
    g = np.asarray(g, np.float64)
    for order in ("raw", "sorted"):
        if order == "sorted":
            t = (g * g).sum(-1)                   # (B, n) row norms
            idx = np.argsort(t, axis=-1)
            gg = np.take_along_axis(g, idx[:, :, None], axis=1)
        else:
            gg = g
        r = f64_cos2(gg)
        iu = np.triu_indices(gg.shape[1], k=1)
        dists = []
        per_mat_max = []
        for b in range(gg.shape[0]):
            rb = r[b][iu]
            live = rb > tol2
            d = (iu[1] - iu[0])[live]
            dists.append(d)
            per_mat_max.append(int(d.max()) if d.size else 0)
        d = np.concatenate(dists)
        if d.size == 0:
            emit(panel=label, order=order, live=0)
            continue
        qs = np.percentile(d, [50, 90, 99, 100]).tolist()
        emit(panel=label, order=order, live=int(d.size),
             live_per_mat=round(d.size / gg.shape[0], 1),
             dist_q50_90_99_max=[int(x) for x in qs],
             per_mat_maxdist=per_mat_max)


def main():
    emit(backend=jax.default_backend())
    key = jax.random.PRNGKey(1256)
    a = jax.random.normal(key, (B, N, N), jnp.float32) / N ** 0.5
    mats = a @ jnp.swapaxes(a, -1, -2) + 2 * jnp.eye(N, dtype=jnp.float32)
    absa = jnp.abs(mats)
    diag = jnp.diagonal(mats, axis1=-2, axis2=-1)
    offsum = jnp.sum(absa, -1) - jnp.diagonal(absa, axis1=-2, axis2=-1)
    lower = jnp.min(diag - offsum, -1)
    frob = jnp.sqrt(jnp.sum(absa * absa, (-2, -1)))
    sigma = jnp.maximum(-lower, 0) + 0.01 * frob
    ash = mats + sigma[:, None, None] * jnp.eye(N, dtype=jnp.float32)
    g0 = jax.jit(lambda x: DK.dc_precondition_tpu(x, levels=8, min_seg=2)
                 )(ash)
    gc = jax.jit(lambda g: JE._rot_correct(g, passes=2))(g0)
    tol2 = (float(jnp.finfo(jnp.float32).eps) * 4 * math.sqrt(N)) ** 2
    emit(tol2=tol2)

    g0h, gch = np.asarray(g0), np.asarray(gc)
    live_pair_stats(g0h, tol2, "warm")
    live_pair_stats(gch, tol2, "corr")

    # fixed-sweep-count kernels allocate at the marginal VMEM edge
    # (17.6 MB vs the 16 MB scope at the default stack) — halve the
    # per-program stack for the diagnostic runs
    old = JE._M_CAP
    JE._M_CAP = 4
    try:
        for name, pan in [("warm", g0h), ("corr", gch)]:
            emit(panel=name, start=[float(f"{v:.3g}") for v in
                                    f64_cos2(pan).max((-2, -1))])
            for k in (1, 2, 3, 4):
                out = jax.jit(lambda g, _k=k: JE._pallas_g_panel(
                    g, _k, 0.0, False, False))(jnp.asarray(pan))
                emit(panel=name, k=k,
                     true_cos2=[float(f"{v:.3g}") for v in
                                f64_cos2(np.asarray(out)).max((-2, -1))])
            # what the in-kernel exit actually does at the default tol
            _, sw = jax.jit(lambda g: JE._pallas_g_panel(
                g, 18, math.sqrt(tol2), False, False,
                return_sweeps=True))(jnp.asarray(pan))
            emit(panel=name, exit_sweeps=[int(x) for x in np.asarray(sw)])
    finally:
        JE._M_CAP = old


if __name__ == "__main__":
    main()
