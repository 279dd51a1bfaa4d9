"""f32-faithful CPU prototype: hard-split sign refinement on the soft-DC
T (globally rank-sorted).  Tests whether converged NS sign at gap-selected
cuts + polar basis extraction (all matmuls, f32) can drive the off-diag
field below the finisher tolerance, and at what matmul budget.

Pipeline per cut (recursive: n/2 cut, then n/4 and 3n/4 on the halves):
  1. pick cut c* in [c-16, c+16] at the max relative diag gap; mu = mid
  2. X = (T - mu I)/s ; NS cubic X <- 1.5X - 0.5X^3 to convergence
  3. P = (I - X)/2 ; Q1 = NS-polar(P[:, :c*]), Q2 = NS-polar((I-P)[:, c*:])
  4. R = [Q1 | Q2] ; T <- R^T T R ; G <- R^T G
Then exact leaf eigh per quarter + boundary windows; report fields.

All arithmetic f32 (matmuls accumulate in f32 here; TPU HIGHEST is
slightly better, so this is a conservative floor).
"""
import math
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

B, N, LEVELS = 4, 256, 2
NS_SEG = 2 ** LEVELS
W = N // NS_SEG
BW = 32
TOL = 7.6e-6

rng = np.random.default_rng(2026)
MM = {"count": 0.0}   # full-size (N^3) matmul equivalents


def mm(a, b, scale=1.0):
    MM["count"] += scale
    return (a.astype(np.float32) @ b.astype(np.float32)).astype(np.float32)


def mk(kind):
    if kind == "wishart":
        w_ = rng.standard_normal((B, N, N)).astype(np.float32) / math.sqrt(N)
        a = w_ @ np.swapaxes(w_, -1, -2) + 0.05 * np.eye(N, dtype=np.float32)
    elif kind == "clustered":
        lam = np.sort(np.concatenate([
            rng.uniform(0.1, 0.11, (B, N // 4)),
            rng.uniform(1.0, 1.01, (B, N // 4)),
            rng.uniform(2.0, 4.0, (B, N // 2))], axis=1), axis=1)
        q, _ = np.linalg.qr(rng.standard_normal((B, N, N)))
        a = np.einsum("bik,bk,bjk->bij", q, lam, q).astype(np.float32)
        a = (a + np.swapaxes(a, -1, -2)) / 2
    else:
        lam = np.sort(np.concatenate([
            np.full((B, N // 2), 1.0),
            rng.uniform(2.0, 5.0, (B, N - N // 2))], axis=1), axis=1)
        q, _ = np.linalg.qr(rng.standard_normal((B, N, N)))
        a = np.einsum("bik,bk,bjk->bij", q, lam, q).astype(np.float32)
        a = (a + np.swapaxes(a, -1, -2)) / 2
    absa = np.abs(a)
    diag = np.einsum("bii->bi", a)
    offsum = absa.sum(-1) - np.abs(diag)
    sigma = (np.maximum(-(diag - offsum).min(-1), 0)
             + 0.01 * np.sqrt((absa ** 2).sum((1, 2))) + 1e-30)
    return (a + sigma[:, None, None] * np.eye(N, dtype=np.float32)
            ).astype(np.float32)


def field(T, metric="T"):
    n = T.shape[-1]
    if metric == "T2":
        T = np.einsum("ik,kj->ij", T.astype(np.float64),
                      T.astype(np.float64))
    d = np.sqrt(np.abs(np.diagonal(T))) + 1e-30
    c = np.abs(T) / (d[:, None] * d[None, :])
    c[np.arange(n), np.arange(n)] = 0.0
    return c


def ns_polar(Y, iters=24):
    """NS polar of a tall (n, k) Y with sigma in (0, ~1.2]: scale then
    X <- 1.5 X - 0.5 X X^T X.  f32.  Cost ~2 (n,k)x(k or n) matmuls/iter."""
    n, k = Y.shape
    # scale so top singular value <= 1 (power estimate, 3 its)
    v = rng.standard_normal((k,)).astype(np.float32)
    for _ in range(3):
        v = Y.T @ (Y @ v)
        v /= (np.linalg.norm(v) + 1e-30)
    s = math.sqrt(float(v @ (Y.T @ (Y @ v)))) * 1.05 + 1e-30
    X = (Y / s).astype(np.float32)
    for _ in range(iters):
        G = mm(X.T, X, scale=(n * k * k) / N**3)
        X = (1.5 * X - 0.5 * mm(X, G, scale=(n * k * k) / N**3)
             ).astype(np.float32)
    return X


def hard_split(T, G, lo, hi, slack=16):
    """One hard split of the (sorted) active block [lo, hi) of T at the
    best diag gap near its middle; returns updated (T, G, cut)."""
    n = T.shape[0]
    d = np.diagonal(T)[lo:hi].astype(np.float64)
    m = (hi - lo) // 2
    cands = np.arange(max(1, m - slack), min(hi - lo - 1, m + slack))
    gaps = (d[cands] - d[cands - 1]) / (abs(d).max() + 1e-30)
    c_loc = int(cands[np.argmax(gaps)])
    cut = lo + c_loc
    mu = 0.5 * (d[c_loc - 1] + d[c_loc])
    # NS sign on the active block only ((hi-lo)^3 cost)
    blk = T[lo:hi, lo:hi].astype(np.float32)
    w = hi - lo
    # bound: gershgorin
    s = float(np.abs(blk - mu * np.eye(w, dtype=np.float32)).sum(-1).max())
    X = ((blk - mu * np.eye(w, dtype=np.float32)) / s).astype(np.float32)
    it = 0
    while it < 40:
        X2 = mm(X, X, scale=w**3 / N**3)
        X = (1.5 * X - 0.5 * mm(X, X2, scale=w**3 / N**3)).astype(np.float32)
        it += 1
        if abs(float(np.trace(X2)) - w) < 1e-3 * w and it >= 8:
            # trace(X^2) ~ w  <=>  eigenvalues at +-1
            break
    P = (0.5 * (np.eye(w, dtype=np.float32) - X)).astype(np.float32)
    Q1 = ns_polar(P[:, :c_loc])
    Q2 = ns_polar((np.eye(w, dtype=np.float32) - P)[:, c_loc:])
    R = np.concatenate([Q1, Q2], axis=1)          # (w, w) orthogonal-ish
    # conjugate the FULL rows/cols (G too)
    T[lo:hi, :] = mm(R.T, T[lo:hi, :], scale=w * w * n / N**3)
    T[:, lo:hi] = mm(T[:, lo:hi], R, scale=w * w * n / N**3)
    G[lo:hi, :] = mm(R.T, G[lo:hi, :], scale=w * w * n / N**3)
    return T, G, cut, it


for kind in ("wishart", "clustered", "degenerate"):
    ash = jnp.asarray(mk(kind))
    g0, T0, _ = dc_precondition_tpu(ash, levels=LEVELS, min_seg=2,
                                    interpret=True, return_t=True,
                                    return_seg=True, refine=1)
    g0 = np.asarray(g0, np.float32)
    T0 = np.asarray(T0, np.float32)
    worst = {"T": 0.0, "T2": 0.0}
    tot_mm = 0.0
    ns_its = []
    for b in range(B):
        MM["count"] = 0.0
        T = T0[b].copy()
        G = g0[b].copy()
        order = np.argsort(np.diagonal(T))
        T = np.ascontiguousarray(T[order][:, order])
        G = np.ascontiguousarray(G[order])
        # level 0: cut near N/2; level 1: cuts near N/4, 3N/4
        T, G, c1, i0 = hard_split(T, G, 0, N)
        T, G, c0, i1 = hard_split(T, G, 0, c1)
        T, G, c2, i2 = hard_split(T, G, c1, N)
        ns_its.append((i0, i1, i2))
        cuts = [0, c0, c1, c2, N]
        # leaves: exact eigh per [cuts[k], cuts[k+1])
        for k in range(4):
            sl = slice(cuts[k], cuts[k + 1])
            blk = (T[sl, sl] + T[sl, sl].T) / 2
            _, v = np.linalg.eigh(blk.astype(np.float64))
            R = v.T.astype(np.float32)
            G[sl, :] = R @ G[sl, :]
            T[sl, :] = R @ T[sl, :]
            T[:, sl] = T[:, sl] @ R.T
        cT = field(T, "T")
        cT2 = field(T, "T2")
        worst["T"] = max(worst["T"], float(cT.max()))
        worst["T2"] = max(worst["T2"], float(cT2.max()))
        tot_mm = max(tot_mm, MM["count"])
    print("%-10s  post field: T=%.3e  T2=%.3e  (tol %.1e)  "
          "mm_equiv<=%.1f  ns_iters=%s" %
          (kind, worst["T"], worst["T2"], TOL, tot_mm, ns_its[:2]))
