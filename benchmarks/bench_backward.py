"""Backward-pass (implicit-gradient) throughput for the linalg core —
VERDICT r4 item 2: every committed perf row was forward-only, while the
reference's entire design is its backward passes
(/root/reference/xitorch/linalg/solve.py:165-222 — grad via the
transposed solve; /root/reference/xitorch/linalg/symeig.py:291-402 —
grad via the degeneracy-projected shifted solve).

Suites (amortized chip timing, bench_symeig methodology; residual AND
gradient-parity gates before timing):

* solve  — BASELINE config 3: TridiagLowRankOperator (diag + tridiag
  coupling + rank-4), batch 512 x n=1024, ncols=1, f32.
  Row = end-to-end `grad(loss o solve)` wrt (d, V, b) with
  loss = sum(x^2): `lax.custom_linear_solve`'s transpose rule solves the
  adjoint system A^T g = dL/dx with the SAME method (structured_cg on
  TPU), then the parameter grads are one operator-JVP transpose.
  Reference: the same operator as a torch matrix-free LinearOperator
  (`_mv` + `_getparamnames`), solve(method="cg"), autograd backward.

* symeig — BASELINE config 2: (64, 256, 256) SPD, neig=8 lowest, f32.
  Row = end-to-end `grad(loss o symeig)` wrt the dense matrix with the
  gauge-invariant loss  sum_i w_i lam_i + sum_i u_i (x_i^T C x_i)
  (sign/phase-invariant, so both implementations' eigenvector
  conventions give the same value and gradient away from degeneracy).
  Ours is timed on both the dense route (native degen_eigh JVP
  transpose) and the iterative chebfsi route (the custom_jvp
  implicit-function rule — the transposed rule solves the projected
  SHIFTED system (A - lam_i I) via MINRES, the path named by the
  verdict).  Reference: symeig(method="exacteig") + autograd through
  symeig_torchfcn.backward.

Gradient-parity gate: rel L2 between our f32 grads and the reference's
f64 grads, symmetrized for the symeig suite (the well-defined object
for symmetric input).

Run alone on the chip: python benchmarks/bench_backward.py
  [--suite solve|symeig|all] [--with-ref] [--cpu]
"""
import argparse
import json
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

from xitorch_tpu import LinearOperator, TridiagLowRankOperator
from xitorch_tpu.linalg import solve, symeig

K = 16

# --- solve suite shapes (BASELINE config 3) ---
SB, SN, SR = 512, 1024, 4
# --- symeig suite shapes (BASELINE config 2) ---
EB, EN, NEIG = 64, 256, 8


def _leafsum(out):
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))


def _timed_pair(body, args, rep=3, kk=K):
    def run_k(arrs, nk):
        def chain(s, k):
            out = body(*[x + (k * 0.0) for x in arrs])
            return s + _leafsum(out).astype(jnp.float32), None
        s, _ = lax.scan(chain, jnp.asarray(0.0, jnp.float32),
                        jnp.arange(nk))
        return s

    f1 = jax.jit(lambda arrs: run_k(arrs, 1))
    fK = jax.jit(lambda arrs: run_k(arrs, kk))
    float(f1(args)); float(fK(args))

    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(fK) - t(f1)) / (kk - 1), 1e-9)


# ---------------------------------------------------------------------------
# solve suite
# ---------------------------------------------------------------------------

def make_solve_problem(B=SB, n=SN, r=SR):
    rng = np.random.default_rng(0)
    d = 4.0 + 2.0 * rng.uniform(size=(B, n))
    c = 1.0
    V = rng.standard_normal((B, n, r)) / np.sqrt(n)
    b = rng.standard_normal((B, n, 1))
    return d, c, V, b


def solve_suite(with_ref, cpu):
    d_np, c_np, V_np, b_np = make_solve_problem()
    d = jnp.asarray(d_np, jnp.float32)
    c = jnp.asarray(c_np, jnp.float32)
    V = jnp.asarray(V_np, jnp.float32)
    b = jnp.asarray(b_np, jnp.float32)
    method = "cg_ir" if cpu else "structured_cg"

    def one_solve(d_, V_, b_):
        A = TridiagLowRankOperator(d_, c, V_)
        if method == "structured_cg":
            return solve(A, b_, method="structured_cg", rtol=1e-6,
                         atol=1e-8)
        return solve(A, b_, method="cg_ir", posdef=True, rtol=1e-6,
                     atol=1e-8, inner_rtol=5e-2, inner_max_niter=60)

    def loss_fn(d_, V_, b_):
        x = one_solve(d_, V_, b_)
        return jnp.sum(x * x)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))

    # forward residual gate
    A = TridiagLowRankOperator(d, c, V)
    x0 = jax.jit(one_solve)(d, V, b)
    resid = float(jnp.max(jnp.linalg.norm(A.mm(x0) - b, axis=-2)))
    assert resid < 5e-4, "solve did not converge: resid=%g" % resid

    ref_grads = _ref_solve_grads(d_np, c_np, V_np, b_np) \
        if (with_ref or not cpu) else None
    if ref_grads is not None:
        ours = jax.jit(grad_fn)(d, V, b)
        o = np.concatenate([np.asarray(g, np.float64).ravel()
                            for g in ours])
        rg = np.concatenate([g.ravel() for g in ref_grads["grads"]])
        rel = float(np.linalg.norm(o - rg) / np.linalg.norm(rg))
        assert rel < 2e-2, "solve grad parity %g" % rel
    else:
        rel = None

    per = _timed_pair(lambda d_, V_, b_: grad_fn(d_, V_, b_), (d, V, b))
    print(json.dumps({
        "metric": "config-3 solve GRAD (d,V,b) grads/sec [%s]" % method,
        "B": SB, "n": SN, "value": round(SB / per, 1),
        "grad_rel_err": rel, "fwd_resid": resid}), flush=True)
    if ref_grads is not None:
        print(json.dumps({
            "metric": "REF config-3 solve GRAD grads/sec (torch cg CPU)",
            "B": SB, "n": SN,
            "value": round(ref_grads["rate"], 2)}), flush=True)


def _ref_solve_grads(d_np, c_np, V_np, b_np):
    """Torch reference: same matrix-free operator, solve(cg), autograd."""
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch as xtref
    import xitorch.linalg as xlref
    torch.set_num_threads(1)

    class TriLR(xtref.LinearOperator):
        def __init__(self, d, c, V):
            super().__init__(shape=(d.shape[0], d.shape[1], d.shape[1]),
                             is_hermitian=True, dtype=d.dtype)
            self.d, self.c, self.V = d, c, V

        def _getparamnames(self, prefix=""):
            return [prefix + "d", prefix + "c", prefix + "V"]

        def _mv(self, x):
            out = self.d * x
            out = out + torch.nn.functional.pad(
                self.c * x[..., 1:], (0, 1))
            out = out + torch.nn.functional.pad(
                self.c * x[..., :-1], (1, 0))
            out = out + torch.einsum(
                "...nk,...k->...n", self.V,
                torch.einsum("...nk,...n->...k", self.V, x))
            return out

    d = torch.tensor(d_np, dtype=torch.float64, requires_grad=True)
    c = torch.tensor(c_np, dtype=torch.float64, requires_grad=True)
    V = torch.tensor(V_np, dtype=torch.float64, requires_grad=True)
    b = torch.tensor(b_np, dtype=torch.float64, requires_grad=True)

    def run():
        A = TriLR(d, c, V)
        x = xlref.solve(A, b, method="cg", rtol=1e-6, atol=1e-8)
        loss = (x * x).sum()
        return torch.autograd.grad(loss, (d, V, b))

    g = run()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return {"grads": tuple(x.detach().numpy() for x in g),
            "rate": d_np.shape[0] / min(ts)}


# ---------------------------------------------------------------------------
# symeig suite
# ---------------------------------------------------------------------------

def make_symeig_problem(B=EB, n=EN):
    # GAP-CONTROLLED spectrum, same shapes/cost class as config 2.  The
    # raw Wishart batch bench_symeig times has Marchenko-Pastur
    # lower-edge gaps ~1e-3: below the f32 degeneracy threshold
    # (degen_rtol ~ eps^0.4), so BOTH implementations rightly project
    # those eigenvector rotations out of the f32 gradient — the
    # evec-dependent loss would compare noise, not backward speed.
    # Lowest NEIG gaps of 0.2 keep the implicit gradient f32-resolvable
    # (vector grad error ~ eps*||A||/gap ~ 1e-5) without changing the
    # decomposition's arithmetic cost.
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.standard_normal((B, n, n)))
    lam = np.concatenate([np.linspace(0.2, 1.6, NEIG),
                          np.linspace(2.0, 6.0, n - NEIG)])
    mats = (q * lam) @ q.transpose(0, 2, 1)
    mats = (mats + mats.transpose(0, 2, 1)) / 2
    cc = rng.standard_normal((n, n)) / np.sqrt(n)
    C = cc @ cc.T + np.eye(n)
    wl = 1.0 + 0.1 * np.arange(NEIG)
    wu = 0.5 + 0.05 * np.arange(NEIG)
    return mats, C, wl, wu


def symeig_suite(with_ref, cpu):
    a_np, C_np, wl, wu = make_symeig_problem()
    mats = jnp.asarray(a_np, jnp.float32)
    C = jnp.asarray(C_np, jnp.float32)
    wlj = jnp.asarray(wl, jnp.float32)
    wuj = jnp.asarray(wu, jnp.float32)

    def loss_of(method, opts):
        def loss_fn(m):
            ms = (m + jnp.swapaxes(m, -2, -1)) * 0.5
            A = LinearOperator.m(ms, is_hermitian=True)
            evals, evecs = symeig(A, NEIG, "lowest", method=method, **opts)
            quad = jnp.einsum("...ri,rc,...ci->...i", evecs, C, evecs)
            return jnp.sum(evals * wlj) + jnp.sum(quad * wuj)
        return loss_fn

    ref = _ref_symeig_grads(a_np, C_np, wl, wu) if (with_ref or not cpu) \
        else None

    routes = [("exacteig", {})]
    if not cpu:
        routes.append(("chebfsi", {"min_eps": 1e-3, "max_niter": 40,
                                   "nguess": 32, "degree": 24}))
    for method, opts in routes:
        grad_fn = jax.grad(loss_of(method, opts))
        g = jax.jit(grad_fn)(mats)
        rel = None
        if ref is not None:
            gs = np.asarray(g, np.float64)
            gs = (gs + gs.transpose(0, 2, 1)) * 0.5
            rel = float(np.linalg.norm(gs - ref["grads"])
                        / np.linalg.norm(ref["grads"]))
            # chebfsi converges vectors to ~sqrt(eps)||A||; its implicit
            # grads carry that grade (documented routing contract)
            lim = 2e-2 if method == "exacteig" else 5e-2
            assert rel < lim, "symeig %s grad parity %g" % (method, rel)
        per = _timed_pair(lambda m: grad_fn(m), (mats,))
        print(json.dumps({
            "metric": "config-2 symeig GRAD wrt A grads/sec [%s]" % method,
            "B": EB, "n": EN, "neig": NEIG,
            "value": round(EB / per, 1), "grad_rel_err": rel}), flush=True)
    if ref is not None:
        print(json.dumps({
            "metric": "REF config-2 symeig GRAD grads/sec "
                      "(torch exacteig CPU)",
            "B": EB, "n": EN, "value": round(ref["rate"], 2)}), flush=True)


def _ref_symeig_grads(a_np, C_np, wl, wu):
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch as xtref
    import xitorch.linalg as xlref
    torch.set_num_threads(1)
    a = torch.tensor(a_np, dtype=torch.float64, requires_grad=True)
    C = torch.tensor(C_np, dtype=torch.float64)
    wlt = torch.tensor(wl, dtype=torch.float64)
    wut = torch.tensor(wu, dtype=torch.float64)

    def run():
        A = xtref.LinearOperator.m((a + a.transpose(-2, -1)) * 0.5,
                                   is_hermitian=True)
        evals, evecs = xlref.symeig(A, NEIG, "lowest", method="exacteig")
        quad = torch.einsum("...ri,rc,...ci->...i", evecs, C, evecs)
        loss = (evals * wlt).sum() + (quad * wut).sum()
        (g,) = torch.autograd.grad(loss, (a,))
        return g

    g = run().detach().numpy()
    g = (g + g.transpose(0, 2, 1)) * 0.5
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return {"grads": g, "rate": a_np.shape[0] / min(ts)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all",
                    choices=["solve", "symeig", "all"])
    ap.add_argument("--with-ref", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    if args.suite in ("solve", "all"):
        solve_suite(args.with_ref, args.cpu)
    if args.suite in ("symeig", "all"):
        symeig_suite(args.with_ref, args.cpu)


if __name__ == "__main__":
    main()
