"""TPU throughput for the optimize family — batched rootfinder
(broyden1), equilibrium (anderson) and minimize (lbfgs/adam) — amortized
chip numbers vs the torch reference on CPU, the bench_symeig
methodology, with a FORWARD row and a GRADIENT row per suite
(VERDICT r4 items 1-2: the backward pass is the library's defining
feature and needs committed chip numbers).

Forward workload: 512 independent README-style systems y = tanh(A y + b)
with n=32 (rootfinder solves f = tanh(Ay+b) - y = 0; equilibrium solves
the fixed point directly), A = 0.45 * W / sqrt(n) row-normalized (a
contraction, so the fixed point is unique), f32 on TPU / f64 on the CPU
reference (native precisions).  Residual gate BEFORE timing on both
sides: max_b ||f(y*)||_inf < 5e-5 * sqrt(n).

Gradient rows time the END-TO-END `grad(loss o solver)` with
loss = sum(y*^2): ours is `jax.grad` through the implicit-function
custom_jvp (the IFT backward solves the transposed Jacobian system —
reference math xitorch/optimize/rootfinder.py:330-366); the reference is
`torch.autograd.grad` through `_RootFinder.backward`.  A gradient-parity
gate (rel L2 vs the reference f64 grads < 2e-2) runs before timing.

Minimize workload: batched least squares f(y) = ||A y - b||^2 with
A = I + 0.5 W / sqrt(n) (well-conditioned SPD Hessian).  Ours runs
lbfgs (beyond-reference method) gated on ||grad||_inf; the reference's
fastest minimize path is its default broyden1-on-grad — both sides gate
at the same grad tolerance.  The adam row is ISO-WORK: identical
hyperparameters and a fixed iteration budget on both sides (same
algorithm, same trajectory), so it is a pure per-iteration throughput
comparison.

The reference's solvers flatten everything into ONE joint system (its
batch semantics — SciPy-ported termination on global norms), so the
CPU side is measured BOTH ways — one joint 512*32-dim solve AND a
Python loop over 512 single systems — and the FASTER mode is reported.
Ours vmaps the per-system solver under jit.

Run alone on the chip: python benchmarks/bench_optimize.py
  [--suite root|equil|min|all] [--grad] [--with-ref] [--cpu]
"""
import argparse
import json
import math
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

_maybe_force_cpu()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xitorch_tpu.optimize import equilibrium, minimize, rootfinder

SHAPES = {"small": (512, 32), "big": (4096, 128)}
K = 16
# f_tol for BOTH sides: the f32 residual floor for tanh(Ay+b)-y is
# ~n*eps ~ 1.5e-5..4e-5 at these n, so a 1e-6 target makes the f32 side
# burn maxiter while the f64 reference exits early — 5e-5 is reachable
# by both and iso-work (measured f32 converged residuals 2.7e-5/3.8e-5)
TOL = 5e-5
# adam iso-work budget (fixed on both sides; f/x stops disabled)
ADAM_ITERS = 400
ADAM_STEP = 0.05


def make_problem(B, N, seed=7):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((B, N, N))
    a = 0.45 * w / np.abs(w).sum(-1, keepdims=True).clip(min=1e-12)
    b = 0.3 * rng.standard_normal((B, N))
    return a, b


def make_min_problem(B, N, seed=13):
    rng = np.random.default_rng(seed)
    a = (np.eye(N) + 0.5 * rng.standard_normal((B, N, N)) / math.sqrt(N))
    b = rng.standard_normal((B, N))
    return a, b


def fcn_root(y, a, b):
    return jnp.tanh(a @ y + b) - y


def fcn_fix(y, a, b):
    return jnp.tanh(a @ y + b)


def fcn_min(y, a, b):
    r = a @ y - b
    return jnp.sum(r * r)


def _leafsum(out):
    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out))


def _timed_pair(body, args, rep=3):
    # args ride as jit ARGUMENTS, not closure constants: baked-in
    # (4096, 128, 128) constants blow the remote-compile request body
    # (HTTP 413) on the tunneled TPU
    def run_k(arrs, nk):
        def chain(s, k):
            out = body(*[x + (k * 0.0) for x in arrs])
            return s + _leafsum(out).astype(jnp.float32), None
        s, _ = lax.scan(chain, jnp.asarray(0.0, jnp.float32),
                        jnp.arange(nk))
        return s

    f1 = jax.jit(lambda arrs: run_k(arrs, 1))
    fK = jax.jit(lambda arrs: run_k(arrs, K))
    float(f1(args)); float(fK(args))

    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(fK) - t(f1)) / (K - 1), 1e-9)


def _solver(kind):
    if kind == "root":
        def solve_one(ai, bi, y0i):
            return rootfinder(fcn_root, y0i, params=(ai, bi),
                              method="broyden1", f_tol=TOL, maxiter=200)
    elif kind == "equil":
        def solve_one(ai, bi, y0i):
            return equilibrium(fcn_fix, y0i, params=(ai, bi),
                               method="anderson_acc", f_tol=TOL,
                               maxiter=200)
    elif kind == "min_lbfgs":
        def solve_one(ai, bi, y0i):
            return minimize(fcn_min, y0i, params=(ai, bi),
                            method="lbfgs", gtol=1e-5, maxiter=200)
    elif kind == "min_adam":
        def solve_one(ai, bi, y0i):
            return minimize(fcn_min, y0i, params=(ai, bi),
                            method="adam", step=ADAM_STEP,
                            maxiter=ADAM_ITERS,
                            f_tol=0.0, f_rtol=0.0, x_tol=0.0, x_rtol=0.0)
    else:
        raise ValueError(kind)
    return solve_one


def _kind_label(kind):
    return {"root": "rootfinder broyden1",
            "equil": "equilibrium anderson",
            "min_lbfgs": "minimize lbfgs",
            "min_adam": "minimize adam iso-work"}[kind]


def _np_resid(kind, a_np, b_np, y):
    """Convergence residual per system, f64 host arithmetic."""
    ay = np.einsum("bij,bj->bi", a_np, y)
    if kind in ("root", "equil"):
        return np.abs(np.tanh(ay + b_np) - y)
    # minimize: grad = 2 A^T (A y - b)
    return np.abs(2.0 * np.einsum("bji,bj->bi", a_np, ay - b_np))


def _gate(kind, N):
    if kind in ("root", "equil"):
        return 5e-5 * math.sqrt(N)
    if kind == "min_lbfgs":
        return 1e-4 * math.sqrt(N)
    return None  # min_adam: iso-work, residual reported not gated


def measure(kind, B, N, grad=False, ref_grads=None):
    maker = make_problem if kind in ("root", "equil") else make_min_problem
    a_np, b_np = maker(B, N)
    a = jnp.asarray(a_np, jnp.float32)
    b = jnp.asarray(b_np, jnp.float32)
    y0 = jnp.zeros((B, N), jnp.float32)
    solve_one = _solver(kind)

    def body(a_, b_):
        return jax.vmap(solve_one)(a_, b_, y0)

    # residual gate vs the f64 stationarity condition before timing
    y = np.asarray(jax.jit(body)(a, b), np.float64)
    worst = float(_np_resid(kind, a_np, b_np, y).max())
    gate = _gate(kind, N)
    if gate is not None:
        assert worst < gate, "residual %g (gate %g)" % (worst, gate)

    rec = {"B": B, "n": N, "max_resid": worst}
    if not grad:
        per = _timed_pair(lambda a_, b_: body(a_, b_), (a, b))
        rec["metric"] = "batched %s solves/sec" % _kind_label(kind)
        rec["value"] = round(B / per, 1)
        print(json.dumps(rec), flush=True)
        return

    # gradient row: end-to-end grad(loss o solver) wrt (a, b)
    def loss_fn(a_, b_):
        yy = body(a_, b_)
        return jnp.sum(yy * yy)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1))
    if ref_grads is not None or kind == "min_lbfgs":
        ga, gb = jax.jit(grad_fn)(a, b)
        ours = np.concatenate([np.asarray(ga, np.float64).ravel(),
                               np.asarray(gb, np.float64).ravel()])
        if kind == "min_lbfgs":
            # gate against the CLOSED-FORM f64 oracle, not torch: both
            # sides converge the argmin only to their own gradient
            # floors, and at (512, 32) the torch joint broyden's argmin
            # slack alone puts torch-vs-ours at ~0.2 — each side must
            # instead be near the exact gradient.  y* = A^{-1} b for the
            # least-squares objective, so with g_b = 2 A^{-T} y*:
            # dL/db = g_b, dL/dA = -g_b y*^T.
            y = np.linalg.solve(a_np, b_np[..., None])[..., 0]
            gb_o = 2.0 * np.linalg.solve(
                np.swapaxes(a_np, -1, -2), y[..., None])[..., 0]
            ga_o = -gb_o[..., :, None] * y[..., None, :]
            oracle = np.concatenate([ga_o.ravel(), gb_o.ravel()])
            rel = float(np.linalg.norm(ours - oracle)
                        / np.linalg.norm(oracle))
            rec["grad_rel_err_vs_exact"] = rel
            if ref_grads is not None:
                ref = np.concatenate([g.ravel() for g in ref_grads])
                rec["ref_grad_rel_err_vs_exact"] = float(
                    np.linalg.norm(ref - oracle) / np.linalg.norm(oracle))
            # f32 argmin at gtol 1e-5 puts the implicit grads at ~1e-2
            assert rel < 5e-2, "gradient parity %g vs exact" % rel
        else:
            ref = np.concatenate([ref_grads[0].ravel(),
                                  ref_grads[1].ravel()])
            rel = float(np.linalg.norm(ours - ref) / np.linalg.norm(ref))
            rec["grad_rel_err"] = rel
            assert rel < 2e-2, "gradient parity %g vs reference f64" % rel
    per = _timed_pair(lambda a_, b_: grad_fn(a_, b_), (a, b))
    rec["metric"] = "batched %s GRAD (loss o solver) grads/sec" \
        % _kind_label(kind)
    rec["value"] = round(B / per, 1)
    print(json.dumps(rec), flush=True)


def _torch_setup(kind, B, N):
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch.optimize as xopt
    torch.set_num_threads(1)
    maker = make_problem if kind in ("root", "equil") else make_min_problem
    a_np, b_np = maker(B, N)
    a = torch.tensor(a_np, dtype=torch.float64)
    bb = torch.tensor(b_np, dtype=torch.float64)

    def f_root(y, a_, b_):
        return torch.tanh(torch.einsum("...ij,...j->...i", a_, y) + b_) - y

    def f_fix(y, a_, b_):
        return torch.tanh(torch.einsum("...ij,...j->...i", a_, y) + b_)

    def f_min(y, a_, b_):
        r = torch.einsum("...ij,...j->...i", a_, y) - b_
        return (r * r).sum()

    if kind == "root":
        entry, fn, kw = xopt.rootfinder, f_root, dict(
            method="broyden1", f_tol=TOL, maxiter=200)
    elif kind == "equil":
        entry, fn, kw = xopt.equilibrium, f_fix, dict(
            method="anderson_acc", f_tol=TOL, maxiter=200)
    elif kind == "min_lbfgs":
        # the reference has no lbfgs; its fastest minimize path is the
        # default broyden1 on the gradient — same task, same gate.  It
        # gets a TIGHTER f_tol and a larger budget than ours because its
        # joint/loop modes at f_tol=1e-5 land just past the gate
        # (measured loop resid 6.3e-4 vs gate 5.7e-4): the timing
        # honestly includes whatever iterations it needs to pass the
        # SAME accuracy gate
        entry, fn, kw = xopt.minimize, f_min, dict(
            method="broyden1", f_tol=3e-6, maxiter=2000)
    else:  # min_adam, iso-work
        entry, fn, kw = xopt.minimize, f_min, dict(
            method="adam", step=ADAM_STEP, maxiter=ADAM_ITERS,
            f_tol=0.0, f_rtol=0.0, x_tol=0.0, x_rtol=0.0)
    return torch, entry, fn, kw, a, bb, a_np, b_np


def ref_cpu(kind, B, N):
    torch, entry, fn, kw, a, bb, a_np, b_np = _torch_setup(kind, B, N)
    GATE = _gate(kind, N)
    # minimize joint mode: the separable sum objective makes one joint
    # minimization over the flattened (B*N) variable — the reference's
    # own batch semantics (adam's elementwise update makes it EXACTLY
    # the per-system trajectory; broyden1's joint curvature is the same
    # approximation the reference applies to root/equil).  Both modes
    # run; the residual gate decides validity and the faster wins.

    def joint():
        with torch.no_grad():
            return entry(fn, torch.zeros_like(bb), params=(a, bb), **kw)

    def loop():
        with torch.no_grad():
            outs = []
            for i in range(a.shape[0]):
                outs.append(entry(fn, torch.zeros(bb.shape[1],
                                                  dtype=torch.float64),
                                  params=(a[i], bb[i]), **kw))
            return torch.stack(outs)

    modes = [("joint", joint), ("loop", loop)]
    only = os.environ.get("XT_REF_MODES")
    if only:
        modes = [mv for mv in modes if mv[0] in only.split(",")]
    results = {}
    for tag, run in modes:
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                y = run().numpy()
            worst = float(_np_resid(kind, a_np, b_np, y).max())
            if GATE is not None and worst > GATE:
                results[tag] = ("resid %g" % worst, None)
                continue
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    run()
                ts.append(time.perf_counter() - t0)
            results[tag] = (None, a.shape[0] / min(ts))
        except Exception as e:  # noqa: BLE001 — probe records failures
            results[tag] = (repr(e)[:120], None)
    ok = {t: v for t, (err, v) in results.items() if v is not None}
    best = max(ok, key=ok.get) if ok else None
    print(json.dumps({
        "metric": "REF %s solves/sec" % _kind_label(kind),
        "B": B, "n": N,
        "value": round(ok[best], 2) if best else None,
        "mode": best,
        "detail": {t: (err if err else round(v, 2))
                   for t, (err, v) in results.items()}}), flush=True)


def ref_grad(kind, B, N, want_grads=False):
    """Reference forward+backward throughput (torch.autograd through the
    reference's implicit backward), and optionally the f64 gradients for
    the jax-side parity gate."""
    torch, entry, fn, kw, a, bb, a_np, b_np = _torch_setup(kind, B, N)
    B_ = a.shape[0]

    def grads_joint():
        av = a.clone().requires_grad_(True)
        bv = bb.clone().requires_grad_(True)
        y = entry(fn, torch.zeros_like(bb), params=(av, bv), **kw)
        loss = (y * y).sum()
        return torch.autograd.grad(loss, (av, bv))

    def grads_loop():
        av = a.clone().requires_grad_(True)
        bv = bb.clone().requires_grad_(True)
        outs = []
        for i in range(B_):
            outs.append(entry(fn, torch.zeros(bb.shape[1],
                                              dtype=torch.float64),
                              params=(av[i], bv[i]), **kw))
        loss = sum((y * y).sum() for y in outs)
        return torch.autograd.grad(loss, (av, bv))

    modes = [("joint", grads_joint), ("loop", grads_loop)]
    only = os.environ.get("XT_REF_MODES")
    if only:
        modes = [mv for mv in modes if mv[0] in only.split(",")]
    results, grads = {}, None
    for tag, run in modes:
        try:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                g = run()
            if grads is None:
                grads = tuple(x.detach().numpy() for x in g)
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    run()
                ts.append(time.perf_counter() - t0)
            results[tag] = (None, B_ / min(ts))
        except Exception as e:  # noqa: BLE001 — probe records failures
            results[tag] = (repr(e)[:120], None)
    ok = {t: v for t, (err, v) in results.items() if v is not None}
    best = max(ok, key=ok.get) if ok else None
    print(json.dumps({
        "metric": "REF %s GRAD grads/sec" % _kind_label(kind),
        "B": B_, "n": N,
        "value": round(ok[best], 2) if best else None,
        "mode": best,
        "detail": {t: (err if err else round(v, 2))
                   for t, (err, v) in results.items()}}), flush=True)
    return grads if want_grads else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="all",
                    choices=["root", "equil", "min", "all"])
    ap.add_argument("--shape", default="all",
                    choices=["small", "big", "all"])
    ap.add_argument("--grad", action="store_true",
                    help="additionally run the gradient rows")
    ap.add_argument("--with-ref", action="store_true")
    ap.add_argument("--ref-only", action="store_true")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the torch-oracle gradient parity gate "
                         "(pure timing run)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    kinds = {"root": ["root"], "equil": ["equil"],
             "min": ["min_lbfgs", "min_adam"],
             "all": ["root", "equil", "min_lbfgs", "min_adam"]}[args.suite]
    shapes = list(SHAPES.values()) if args.shape == "all" else [
        SHAPES[args.shape]]
    for B, N in shapes:
        for kind in kinds:
            if kind.startswith("min") and (B, N) != SHAPES["small"]:
                continue  # minimize rows: small shape only
            if not args.ref_only:
                measure(kind, B, N)
                if args.grad:
                    refg = None
                    if not args.no_parity:
                        refg = ref_grad(kind, B, N, want_grads=True)
                    measure(kind, B, N, grad=True, ref_grads=refg)
            if args.with_ref or args.ref_only:
                ref_cpu(kind, B, N)
                if args.grad and (args.ref_only or args.no_parity):
                    ref_grad(kind, B, N)


if __name__ == "__main__":
    main()
