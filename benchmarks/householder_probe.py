"""Two-stage dense-eigh route probe (VERDICT r4 item 3) — a THROUGHPUT
PROBE, not a build: measure whether a blocked-Householder two-stage
pipeline could beat 10x reference CPU at config 2 (B=64, n=256; budget
<= 35.7 ms per batch vs the shipped DC+Jacobi default's ~59 ms).

Pipeline under test (SBR / successive band reduction family):
  A. full -> band(b) blocked Householder reduction  — the matmul-rich
     stage: per panel, b sequential in-panel reflector steps (BLAS2 on
     the (m, b) panel only) then ONE two-sided rank-b trailing update
     (batched syr2k-shape matmuls on the MXU).
  B. band(b) -> tridiagonal — bulge chasing, NOT implemented: flop
     estimate ~ 6 n^2 b per matrix with BLAS2.5 character; the probe
     reports the VPU-time floor for it from the measured stage-A MXU
     and the jacobi kernel's measured VPU rates.
  C. tridiagonal eigenvalues by batched Sturm bisection — each shift
     evaluation is an n-step lax.scan carrying (B*n,) lanes; ~27
     f32 bisection rounds on Gershgorin brackets.  Embarrassingly
     parallel per eigenvalue: a good TPU shape IF the sequential scan
     clocks fast enough.
  D. eigenvectors by one inverse-iteration pass (batched Thomas
     tridiagonal solves over B*n right-hand sides) + back-transform
     (one batched (n, n) matmul — MXU noise).

Go/no-go: measured A + C + D + estimated B vs the 35.7 ms budget.

Correctness validation before timing: the band reduction must preserve
eigenvalues (vs numpy on the same batch) and produce exact band
structure; bisection + inverse iteration validated against numpy eigh
on the tridiagonal.

Run: python benchmarks/householder_probe.py [--cpu] [--small]
Writes one JSON line per measurement + a final go/no-go line
(commit to benchmarks/results_r5_householder_probe.jsonl).
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

_maybe_force_cpu()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Stage A: blocked full -> band(b) Householder reduction (batched)
# ---------------------------------------------------------------------------

def band_reduce(A, b):
    """Reduce symmetric (B, n, n) A to band width b by blocked two-sided
    Householder panels (compact-WY).  Returns the reduced matrix (exact
    zeros are NOT forced — the probe checks them numerically).

    Panel j eliminates columns [j, j+b) below row j+b: V holds the b
    Householder vectors of the (m, b) subpanel (m = n - j - b), built by
    a b-step fori over columns (in-panel BLAS2 only), then the trailing
    similarity update is the blocked symmetric rank-2b form
        A_t <- A_t - V W^T - W V^T,  W = Y - 0.5 V (V^T Y),
        Y = A_t V T
    with T the upper-triangular compact-WY factor, all batched matmuls.
    """
    B, n, _ = A.shape
    dt = A.dtype
    if (n - b) % b:
        raise ValueError("probe supports n - b a multiple of b")
    nsteps = (n - b) // b

    def panel(A, j, m):
        """Factor the (B, m, b) subpanel starting at (j+b, j)."""
        # dynamic slice with static sizes: m changes per panel, so this
        # runs in a Python loop (one trace per panel — 7 panels at
        # n=256, b=32)
        P = lax.dynamic_slice(A, (0, j + b, j), (B, m, b))
        V = jnp.zeros((B, m, b), dt)
        beta = jnp.zeros((B, b), dt)

        def col(i, carry):
            P, V, beta = carry
            x = lax.dynamic_slice(P, (0, 0, i), (B, m, 1))[..., 0]
            iot = jnp.arange(m)
            x = jnp.where(iot[None, :] >= i, x, 0.0)
            sig = jnp.sqrt(jnp.sum(x * x, axis=-1))
            x0 = x[jnp.arange(B), i]
            alpha = -jnp.sign(jnp.where(x0 == 0, 1.0, x0)) * sig
            v = x.at[jnp.arange(B), i].add(-alpha)
            vn2 = jnp.sum(v * v, axis=-1)
            bet = jnp.where(vn2 > 0, 2.0 / jnp.maximum(vn2, 1e-30), 0.0)
            # apply reflector to the remaining panel columns
            w = jnp.einsum("bm,bmc->bc", v, P, precision=HI)
            P = P - bet[:, None, None] * v[:, :, None] * w[:, None, :]
            V = lax.dynamic_update_slice(V, v[:, :, None], (0, 0, i))
            beta = beta.at[:, i].set(bet)
            return P, V, beta

        P, V, beta = lax.fori_loop(0, b, col, (P, V, beta))
        # compact-WY T: T[i,i] = beta_i, T[:i,i] = -beta_i T[:i,:i] V^T v_i
        # (built column by column; b=32 steps of (b,b) ops)
        VtV = jnp.einsum("bmi,bmj->bij", V, V, precision=HI)

        def tcol(i, T):
            bet_i = lax.dynamic_slice_in_dim(beta, i, 1, axis=1)
            col = -bet_i * jnp.einsum(
                "bij,bj->bi", T, VtV[:, :, i] *
                (jnp.arange(b)[None, :] < i), precision=HI)
            col = col * (jnp.arange(b)[None, :] < i)
            col = col.at[:, i].set(beta[:, i])
            return T.at[:, :, i].set(col)

        T = lax.fori_loop(0, b, tcol, jnp.zeros((B, b, b), dt))
        return P, V, T

    for k in range(nsteps):
        j = k * b
        m = n - j - b
        P, V, T = panel(A, j, m)
        # write back the reduced panel (its top b rows hold the band
        # couplings; below is numerically zero)
        A = lax.dynamic_update_slice(A, P, (0, j + b, j))
        A = lax.dynamic_update_slice(
            A, jnp.swapaxes(P, -1, -2), (0, j, j + b))
        # two-sided trailing update on A[j+b:, j+b:]
        At = lax.dynamic_slice(A, (0, j + b, j + b), (B, m, m))
        Y = jnp.einsum("bmn,bnk,bkl->bml", At, V, T, precision=HI)
        VtY = jnp.einsum("bmk,bml->bkl", V, Y, precision=HI)
        # S = T^T (V^T Y) is symmetric (= T^T V^T At V T); the update is
        # At - V W^T - W V^T with W = Y - 0.5 V S
        S = jnp.einsum("bki,bkl->bil", T, VtY, precision=HI)
        W = Y - 0.5 * jnp.einsum("bmk,bkl->bml", V, S, precision=HI)
        At = (At
              - jnp.einsum("bmk,bnk->bmn", V, W, precision=HI)
              - jnp.einsum("bmk,bnk->bmn", W, V, precision=HI))
        A = lax.dynamic_update_slice(A, At, (0, j + b, j + b))
    return A


# ---------------------------------------------------------------------------
# Stage C: batched Sturm bisection on a tridiagonal
# ---------------------------------------------------------------------------

def sturm_bisect(d, e, iters=27):
    """All eigenvalues of the (B, n) tridiagonal (d, e) by bisection.
    Returns (B, n) ascending eigenvalues.  Each round evaluates the
    Sturm negative-count at (B, n) shifts with ONE n-step scan carrying
    (B, n) lanes."""
    B, n = d.shape
    dt = d.dtype
    e2 = jnp.pad(e * e, ((0, 0), (1, 0)))                  # (B, n), e2[0]=0
    rad = jnp.abs(d) + jnp.pad(jnp.abs(e), ((0, 0), (1, 0))) \
        + jnp.pad(jnp.abs(e), ((0, 0), (0, 1)))
    lo = jnp.min(d - rad, axis=-1, keepdims=True)          # (B, 1)
    hi = jnp.max(d + rad, axis=-1, keepdims=True)
    lo = jnp.broadcast_to(lo, (B, n))
    hi = jnp.broadcast_to(hi, (B, n))
    k = jnp.arange(1, n + 1)[None, :]                      # target counts

    def count(sig):
        # negative-count of LDL^T of (T - sig I): q_i = d_i - sig -
        # e_{i-1}^2 / q_{i-1}; scan over i with (B, n) lanes
        tiny = jnp.asarray(jnp.finfo(dt).tiny * 1e4, dt)

        def step(carry, inp):
            q, cnt = carry
            di, e2i = inp
            q = di[:, None] - sig - e2i[:, None] / q
            q = jnp.where(jnp.abs(q) < tiny, -tiny, q)
            return (q, cnt + (q < 0)), None

        q0 = jnp.ones((B, n), dt)                          # q_0 := 1 (e2[0]=0)
        (q, cnt), _ = lax.scan(step, (q0, jnp.zeros((B, n), jnp.int32)),
                               (d.T, e2.T))
        return cnt

    def round_(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = count(mid)
        take_hi = cnt >= k                                  # eig_k <= mid
        hi = jnp.where(take_hi, mid, hi)
        lo = jnp.where(take_hi, lo, mid)
        return lo, hi

    lo, hi = lax.fori_loop(0, iters, round_, (lo, hi))
    return 0.5 * (lo + hi)


def inverse_iteration(d, e, lam, passes=2):
    """One eigenvector per eigenvalue by inverse iteration: batched
    Thomas solves of (T - lam_k I) x = b over the (B, n) shift grid —
    (B*n) independent tridiagonal systems of size n."""
    B, n = d.shape
    dt = d.dtype
    # per-target shifted diagonals: (B, n_targets, n)
    eps_sep = jnp.asarray(jnp.finfo(dt).eps, dt) * (
        jnp.abs(lam) + 1.0)
    dd = d[:, None, :] - (lam + 0.25 * eps_sep)[:, :, None]
    ee = jnp.broadcast_to(e[:, None, :], (B, n, n - 1))
    iot = jnp.arange(n, dtype=dt)
    x = jnp.sin(1.7 * iot[None, None, :] * (1.0 + 0.13 * jnp.arange(
        n)[None, :, None])) + 0.5                           # fixed start

    def thomas(dd, ee, rhs):
        # forward sweep: scan over n with (B, n_targets) lanes
        def fwd(carry, inp):
            cp, dp = carry
            di, ei_prev, bi = inp
            m = di - ei_prev * cp
            m = jnp.where(jnp.abs(m) < 1e-30, 1e-30, m)
            cp_new = jnp.where(jnp.isfinite(m), 0.0, 0.0)  # placeholder
            return (cp_new, dp), None

        # explicit Thomas with upper diag = ee as well (symmetric):
        c = jnp.zeros_like(dd)
        dn = jnp.zeros_like(rhs)

        def fstep(carry, inp):
            cprev, dprev = carry
            di, eprev, ei, bi = inp
            denom = di - eprev * cprev
            denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            ci = ei / denom
            dni = (bi - eprev * dprev) / denom
            return (ci, dni), (ci, dni)

        epad = jnp.concatenate([jnp.zeros((B, n, 1), dt), ee], axis=-1)
        eup = jnp.concatenate([ee, jnp.zeros((B, n, 1), dt)], axis=-1)
        (_, _), (cs, ds) = lax.scan(
            fstep, (jnp.zeros((B, n), dt), jnp.zeros((B, n), dt)),
            (jnp.moveaxis(dd, -1, 0), jnp.moveaxis(epad, -1, 0),
             jnp.moveaxis(eup, -1, 0), jnp.moveaxis(rhs, -1, 0)))

        def bstep(xnext, inp):
            ci, dni = inp
            xi = dni - ci * xnext
            return xi, xi

        _, xs = lax.scan(bstep, jnp.zeros((B, n), dt), (cs, ds),
                         reverse=True)
        return jnp.moveaxis(xs, 0, -1)

    for _ in range(passes):
        x = thomas(dd, ee, x)
        x = x / jnp.maximum(jnp.sqrt(jnp.sum(x * x, axis=-1,
                                             keepdims=True)), 1e-30)
    return x


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def timed(f, *args, rep=3):
    out = f(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        out = f(*args)
        s = sum(float(jnp.sum(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(out))
        ts.append(time.perf_counter() - t0)
        del s
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--band", type=int, default=32)
    args = ap.parse_args()
    B, n = (8, 64) if args.small else (64, 256)
    b = args.band
    print(json.dumps({"backend": jax.default_backend(), "B": B, "n": n,
                      "band": b}), flush=True)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((B, n, n)).astype(np.float32) / math.sqrt(n)
    a_np = (w @ np.swapaxes(w, -1, -2)
            + 2 * np.eye(n, dtype=np.float32)).astype(np.float32)
    A = jnp.asarray(a_np)

    # --- validate stage A on the batch (f32): eigenvalue preservation +
    # band structure
    Ab = jax.jit(lambda A: band_reduce(A, b))(A)
    ab_np = np.asarray(Ab, np.float64)
    lam_ref = np.linalg.eigvalsh(a_np.astype(np.float64))
    lam_band = np.linalg.eigvalsh((ab_np + ab_np.transpose(0, 2, 1)) / 2)
    scale = np.abs(lam_ref).max()
    banderr = max(float(np.abs(np.triu(m, b + 1)).max()) for m in ab_np)
    print(json.dumps({
        "stage": "A validate", "eig_drift": float(
            np.abs(lam_band - lam_ref).max() / scale),
        "offband_resid": banderr}), flush=True)

    tA = timed(jax.jit(lambda A: band_reduce(A, b)), A)
    print(json.dumps({"stage": "A full->band ms", "ms": round(
        tA * 1e3, 3)}), flush=True)

    # --- stage C+D on a synthetic tridiagonal of the same spectrum class
    dveg = jnp.asarray(np.sort(lam_ref, axis=-1).astype(np.float32))
    d_tri = jnp.asarray(a_np[:, np.arange(n), np.arange(n)])
    e_tri = jnp.asarray(0.3 * rng.standard_normal(
        (B, n - 1)).astype(np.float32))
    lam = jax.jit(sturm_bisect)(d_tri, e_tri)
    # validate against numpy on the tridiagonal
    T0 = np.zeros((B, n, n))
    T0[:, np.arange(n), np.arange(n)] = np.asarray(d_tri, np.float64)
    T0[:, np.arange(n - 1), np.arange(1, n)] = np.asarray(e_tri, np.float64)
    T0[:, np.arange(1, n), np.arange(n - 1)] = np.asarray(e_tri, np.float64)
    lam_np = np.linalg.eigvalsh(T0)
    tri_scale = np.abs(lam_np).max()
    print(json.dumps({
        "stage": "C validate", "eig_err": float(
            np.abs(np.asarray(lam, np.float64) - lam_np).max()
            / tri_scale)}), flush=True)
    tC = timed(jax.jit(sturm_bisect), d_tri, e_tri)
    print(json.dumps({"stage": "C sturm bisection ms", "ms": round(
        tC * 1e3, 3)}), flush=True)

    V = jax.jit(inverse_iteration)(d_tri, e_tri, lam)
    resid = np.einsum("bij,bkj->bki", T0, np.asarray(V, np.float64)) \
        - np.asarray(lam, np.float64)[:, :, None] * np.asarray(V, np.float64)
    print(json.dumps({
        "stage": "D validate",
        "max_col_resid": float(np.linalg.norm(resid, axis=-1).max()
                               / tri_scale)}), flush=True)
    tD = timed(jax.jit(inverse_iteration), d_tri, e_tri, lam)
    print(json.dumps({"stage": "D inverse iteration ms", "ms": round(
        tD * 1e3, 3)}), flush=True)

    # --- stage B estimate: bulge-chasing band->tridiag ~ 6 n^2 b flops
    # per matrix of BLAS2.5 character.  Rate bound: use stage A's
    # measured rate as the OPTIMISTIC bound (it is mostly MXU matmuls;
    # bulge chasing is strictly less regular), and the Jacobi kernel's
    # measured VPU sweep rate as the pessimistic bound.
    flops_A = B * (4.0 / 3.0) * n ** 3  # two-sided blocked reduction
    rate_A = flops_A / tA
    flops_B = B * 6.0 * n * n * b
    tB_opt = flops_B / rate_A
    # measured cold-sweep VPU rate from the shipped kernel: ~9 sweeps *
    # 6*(n/2)*n^2 flops in ~59 ms at B=64 => ~2.9 Tflop/s effective
    tB_pess = flops_B / 2.9e12
    tB_lo, tB_hi = sorted([tB_opt, tB_pess])
    total_opt = (tA + tB_lo + tC + tD) * 1e3
    total_pess = (tA + tB_hi + tC + tD) * 1e3
    budget_ms = 35.7 * (B / 64.0) * (n / 256.0) ** 3
    print(json.dumps({
        "stage": "B estimate ms", "optimistic": round(tB_opt * 1e3, 3),
        "pessimistic": round(tB_pess * 1e3, 3)}), flush=True)
    print(json.dumps({
        "stage": "GO/NO-GO", "total_ms_opt": round(total_opt, 2),
        "total_ms_pess": round(total_pess, 2),
        "budget_ms": round(budget_ms, 2),
        "go": bool(total_opt < budget_ms)}), flush=True)


if __name__ == "__main__":
    main()
