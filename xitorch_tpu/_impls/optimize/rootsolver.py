"""Quasi-Newton root solvers (newton, broyden1/2, linearmixing).

TPU-native redesign of /root/reference/xitorch/_impls/optimize/root/
rootsolver.py:15-380 and _jacobian.py:10-232 (themselves SciPy-nonlin
derived).  Key structural changes for XLA:

* The main iteration is one ``lax.while_loop`` whose carry holds the
  iterate, the best-so-far iterate (returned on non-convergence — reference
  :115-121, 144-148) and the inverse-Jacobian state.
* Broyden's growing list of rank-1 pairs (reference _jacobian.py:156-199)
  becomes a **fixed-capacity ring buffer** ``(max_rank, n)`` with
  overwrite-oldest-on-overflow (the reference's "simple" reduce method);
  its mv/rmv are two skinny matmuls (MXU-friendly).
* The Armijo line search (reference :272-357) is a bounded ``while_loop``
  with quadratic-then-cubic backtracking.
* Complex roots are handled by packing real/imag into a doubled real vector
  (reference :54-68).

These run gradient-blocked; implicit differentiation lives in
``xitorch_tpu.optimize.rootfinder``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from xitorch_tpu.utils.tensor import dot_hi

__all__ = ["newton", "broyden1", "broyden2", "linearmixing", "TerminationCondition"]


def _norm(v):
    return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))


# ------------------------------------------------------------------
# termination (parity with reference TerminationCondition :359-380)
# ------------------------------------------------------------------

class TerminationCondition:
    def __init__(self, f_tol, f_rtol, f0_norm, x_tol, x_rtol):
        self.f_tol = 1e-6 if f_tol is None else f_tol
        self.f_rtol = jnp.inf if f_rtol is None else f_rtol
        self.x_tol = 1e-6 if x_tol is None else x_tol
        self.x_rtol = jnp.inf if x_rtol is None else x_rtol
        self.f0_norm = f0_norm

    def check(self, x, y, dx):
        xnorm = _norm(x)
        ynorm = _norm(y)
        dxnorm = _norm(dx)
        return ((dxnorm < self.x_tol) & (dxnorm < self.x_rtol * xnorm)
                & (ynorm < self.f_tol) & (ynorm < self.f_rtol * self.f0_norm))


# ------------------------------------------------------------------
# line search (parity with reference _nonline_line_search :272-357)
# ------------------------------------------------------------------

def _line_search_armijo(func, x, y, dx, c1=1e-4, amin=1e-2, max_niter=20):
    """Backtracking Armijo with quadratic-then-cubic interpolation.
    Returns (s, xnew, ynew, ynew_norm)."""
    phi0 = jnp.sum(jnp.abs(y) ** 2)
    derphi0 = -phi0

    def phi(s):
        return jnp.sum(jnp.abs(func(x + s * dx)) ** 2)

    alpha0 = jnp.asarray(1.0, dtype=phi0.dtype)
    phi_a0 = phi(alpha0)
    ok0 = phi_a0 <= phi0 + c1 * alpha0 * derphi0

    # quadratic interpolation candidate
    alpha1 = -derphi0 * alpha0 ** 2 / 2.0 / (phi_a0 - phi0 - derphi0 * alpha0)
    phi_a1 = phi(alpha1)
    ok1 = phi_a1 <= phi0 + c1 * alpha1 * derphi0

    # cubic loop: carry (k, a0, a1, p0, p1, s_found, found)
    def cond_fun(c):
        k, a0, a1, p0, p1, s_found, found = c
        return (~found) & (a1 > amin) & (k < max_niter)

    def body_fun(c):
        k, a0, a1, p0, p1, s_found, found = c
        factor = a0 ** 2 * a1 ** 2 * (a1 - a0)
        factor = jnp.where(factor == 0, 1e-30, factor)
        aa = (a0 ** 2 * (p1 - phi0 - derphi0 * a1)
              - a1 ** 2 * (p0 - phi0 - derphi0 * a0)) / factor
        bb = (-a0 ** 3 * (p1 - phi0 - derphi0 * a1)
              + a1 ** 3 * (p0 - phi0 - derphi0 * a0)) / factor
        aa_safe = jnp.where(aa == 0, 1e-30, aa)
        a2 = (-bb + jnp.sqrt(jnp.abs(bb ** 2 - 3 * aa * derphi0))) / (3.0 * aa_safe)
        # safeguard the cubic candidate (reference :345-346) before evaluating
        shrink = ((a1 - a2) > a1 / 2.0) | ((1 - a2 / jnp.where(a1 == 0, 1e-30, a1)) < 0.96)
        a2 = jnp.where(shrink, a1 / 2.0, a2)
        p2 = phi(a2)
        good = p2 <= phi0 + c1 * a2 * derphi0
        s_found = jnp.where(good & ~found, a2, s_found)
        found = found | good
        return (k + 1, a1, a2, p1, p2, s_found, found)

    s_cubic_init = jnp.where(ok1, alpha1, 1.0)
    init = (jnp.asarray(0), alpha0, alpha1, phi_a0, phi_a1, s_cubic_init, ok1)
    out = lax.while_loop(cond_fun, body_fun, init)
    s_cubic = jnp.where(out[6], out[5], 1.0)  # fallback: full step (reference :298-301)

    s = jnp.where(ok0, alpha0, s_cubic)
    xnew = x + s * dx
    ynew = func(xnew)
    return s, xnew, ynew, _norm(ynew)


# ------------------------------------------------------------------
# low-rank inverse-Jacobian state (Broyden)
# ------------------------------------------------------------------

def _lowrank_mv(alpha, cns, dns, count, v):
    # (alpha*I + sum_i cns[i] dns[i]^T) v  with only the first `count` pairs
    # active.  HIGHEST precision: these produce quasi-Newton update
    # directions — TPU bf16 multiplies stall the iteration (CLAUDE.md)
    w = dot_hi(dns, v)  # (max_rank,)
    mask = (jnp.arange(w.shape[0]) < count).astype(w.dtype)
    return alpha * v + dot_hi(mask * w, cns)


def _lowrank_rmv(alpha, cns, dns, count, v):
    w = dot_hi(cns, v)
    mask = (jnp.arange(w.shape[0]) < count).astype(w.dtype)
    return alpha * v + dot_hi(mask * w, dns)


# ------------------------------------------------------------------
# generic quasi-Newton driver
# ------------------------------------------------------------------

def _nonlin_solver(fcn, x0, params=(), *,
                   jac_variant: str,
                   alpha: Optional[float] = None,
                   uv0=None,
                   max_rank: Optional[int] = None,
                   # newton-specific
                   solver_method: str = "exactsolve",
                   solver_kwargs: Optional[dict] = None,
                   # stopping criteria
                   maxiter=None, f_tol=None, f_rtol=None, x_tol=None, x_rtol=None,
                   # algorithm parameters
                   line_search=True,
                   custom_terminator=None,
                   # misc
                   verbose=False,
                   return_info=False,
                   **unused):
    """
    Keyword arguments
    -----------------
    maxiter: int or None
        Maximum number of iterations (default ``100*(numel+1)``).
    f_tol, f_rtol, x_tol, x_rtol: float or None
        Stopping tolerances (AND criteria; see reference :359-380).
    line_search: bool or "armijo"
        Armijo backtracking on each step.
    alpha: float or None
        Initial inverse Jacobian is ``-alpha*I`` (broyden/linearmixing).
    max_rank: int or None
        Capacity of the rank-1 buffer; overflow overwrites the oldest
        pair.  The default is full-memory (reference-compatible), but
        the TPU apply cost is CAPACITY-proportional (zero-padded slots
        burn HBM bandwidth every iteration), so batched workloads that
        converge in ~k iterations run fastest at ``max_rank ~ k``:
        measured at (4096, 128) on a v5e, ``max_rank=16`` is 27x the
        default throughput at the identical residual, with a cliff once
        the ring is smaller than the iterations-to-converge
        (BASELINE.md optimize section, round-5 sweep).
    """
    xshape = x0.shape
    x_is_complex = jnp.issubdtype(x0.dtype, jnp.complexfloating)

    def _ravel(x):
        if x_is_complex:
            return jnp.concatenate((x.real, x.imag), axis=None).reshape(-1)
        return x.reshape(-1)

    def _pack(xf):
        if x_is_complex:
            n = xf.shape[0] // 2
            return (xf[:n] + 1j * xf[n:]).reshape(xshape)
        return xf.reshape(xshape)

    func = lambda xf: _ravel(fcn(_pack(xf), *params))
    x = _ravel(x0)
    n = x.shape[0]

    if maxiter is None:
        maxiter = 100 * (n + 1)
    if max_rank is None:
        # the reference keeps every rank-1 update (converting to a dense
        # accumulator at full rank, _jacobian.py:187-189); a fixed-capacity
        # buffer must be generous enough that pairs are rarely dropped, since
        # later pairs are corrections on top of earlier ones
        max_rank = max(min(maxiter, max(2 * n, 64)), 8)
        max_rank = min(max_rank, 4096)
    if line_search is True:
        line_search = "armijo"

    y = func(x)
    y_norm = _norm(y)
    stop_cond = custom_terminator if custom_terminator is not None \
        else TerminationCondition(f_tol, f_rtol, y_norm, x_tol, x_rtol)

    # initial alpha (reference _jacobian.py:76-82)
    if alpha is None:
        normy0 = y_norm
        alpha_v = jnp.where(normy0 > 0,
                            0.5 * jnp.maximum(_norm(x), 1.0) / jnp.where(normy0 == 0, 1.0, normy0),
                            jnp.ones_like(normy0))
    else:
        alpha_v = jnp.asarray(alpha, dtype=x.dtype)

    use_broyden = jac_variant in ("broyden1", "broyden2")
    cns = jnp.zeros((max_rank, n), dtype=x.dtype)
    dns = jnp.zeros((max_rank, n), dtype=x.dtype)
    count0 = jnp.asarray(0)
    if use_broyden and uv0 is not None:
        if uv0 == "svd":
            # 1-rank SVD warm start of the inverse Jacobian
            # (reference _jacobian.py:224-232)
            uv0 = _get_svd_uv0(func, x)
        cn0, dn0 = uv0
        cns = cns.at[0].set(_ravel(cn0) if cn0.shape != (n,) else cn0)
        dns = dns.at[0].set(_ravel(dn0) if dn0.shape != (n,) else dn0)
        count0 = jnp.asarray(1)

    if jac_variant == "newton":
        from xitorch_tpu.grad.jachess import jac as jac_op
        from xitorch_tpu.linalg.solve import solve as linsolve
        skw = dict(solver_kwargs or {})
        # Eisenstat-Walker forcing (reference rootsolver.py:85-139): the
        # inner Jacobian solve runs to the adaptive RELATIVE tolerance
        # ||J dx + f|| <= eta ||f|| instead of a fixed one — loose far from
        # the root, tight near it.  (An absolute tol can exceed the initial
        # residual and make the inner solver return a zero step, stalling
        # Newton — the relative form always forces a real reduction.)
        # User-supplied tolerances win.
        use_ew = ("rtol" not in skw) and ("atol" not in skw) \
            and solver_method != "exactsolve"

        def gm_solve(state, v):
            x_cur = state["x"]
            jl = jac_op(lambda xx: func(xx), (x_cur,), idxs=0)
            if use_ew:
                return linsolve(jl, v[:, None], method=solver_method,
                                rtol=state["eta"], atol=1e-30, **skw)[:, 0]
            return linsolve(jl, v[:, None], method=solver_method, **skw)[:, 0]
    elif jac_variant == "linearmixing":
        la = -1.0 if alpha is None else alpha

        def gm_solve(state, v):
            return -v * la
    else:
        def gm_solve(state, v):
            return _lowrank_mv(-alpha_v, state["cns"], state["dns"], state["count"], v)

    def gm_update(state, xnew, ynew):
        if not use_broyden:
            return state
        dy = ynew - state["y"]
        dx = xnew - state["x"]
        cns, dns, count = state["cns"], state["dns"], state["count"]
        nactive = jnp.minimum(count, max_rank)
        if jac_variant == "broyden1":
            v = _lowrank_rmv(-alpha_v, cns, dns, nactive, dx)
            c = dx - _lowrank_mv(-alpha_v, cns, dns, nactive, dy)
            denom = jnp.sum(dy * v)
            d = v / jnp.where(denom == 0, 1e-30, denom)
        else:  # broyden2
            v = dy
            c = dx - _lowrank_mv(-alpha_v, cns, dns, nactive, dy)
            dynorm2 = jnp.sum(dy * dy)
            d = v / jnp.where(dynorm2 == 0, 1e-30, dynorm2)
        # ring buffer: overwrite the oldest pair on overflow (the reference's
        # "simple" reduce, _jacobian.py:196-199); the sum of rank-1 terms is
        # order-independent so slot position does not matter
        slot = count % max_rank
        cns = cns.at[slot].set(c)
        dns = dns.at[slot].set(d)
        return {**state, "cns": cns, "dns": dns, "count": count + 1}

    def cond_fun(state):
        return (~state["stop"]) & (state["iter"] < maxiter)

    def body_fun(state):
        dx = -gm_solve(state, state["y"])
        if line_search:
            s, xnew, ynew, ynorm_new = _line_search_armijo(func, state["x"], state["y"], dx)
        else:
            xnew = state["x"] + dx
            ynew = func(xnew)
            ynorm_new = _norm(ynew)
        if verbose:
            jax.debug.print("{i:6d}: |dx|={dx:.3e}, |f|={f:.3e}",
                            i=state["iter"], dx=_norm(dx), f=ynorm_new)

        better = ynorm_new < state["best_ynorm"]
        best_x = jnp.where(better, xnew, state["best_x"])
        best_ynorm = jnp.where(better, ynorm_new, state["best_ynorm"])

        # Eisenstat-Walker eta adaptation (reference rootsolver.py:134-139)
        gamma = 0.9
        eta_max = 0.9999
        eta_threshold = 0.1
        eta = state["eta"]
        y_norm_safe = jnp.where(state["y_norm"] == 0, 1.0, state["y_norm"])
        eta_A = gamma * (ynorm_new / y_norm_safe) ** 2
        gamma_eta2 = gamma * eta * eta
        eta_new = jnp.where(gamma_eta2 < eta_threshold,
                            jnp.minimum(eta_max, eta_A),
                            jnp.minimum(eta_max, jnp.maximum(eta_A, gamma_eta2)))

        state2 = gm_update(state, xnew, ynew)
        stop = stop_cond.check(xnew, ynew, dx)
        return {**state2, "x": xnew, "y": ynew, "y_norm": ynorm_new,
                "best_x": best_x, "best_ynorm": best_ynorm, "eta": eta_new,
                "iter": state["iter"] + 1, "stop": stop}

    state0 = {
        "x": x, "y": y, "y_norm": y_norm,
        "best_x": x, "best_ynorm": y_norm,
        "cns": cns, "dns": dns, "count": count0,
        "eta": jnp.asarray(1e-3, y_norm.dtype),
        "iter": jnp.asarray(0), "stop": y_norm == 0,
    }
    out = lax.while_loop(cond_fun, body_fun, state0)
    xfin = jnp.where(out["stop"], out["x"], out["best_x"])
    if return_info:
        # jit-safe convergence info (all-float leaves; SURVEY §5 convention)
        info = {
            "converged": out["stop"].astype(jnp.float32),
            "iterations": out["iter"].astype(jnp.float32),
            "best_fnorm": out["best_ynorm"].astype(jnp.float32),
        }
        return _pack(xfin), info
    return _pack(xfin)


# ------------------------------------------------------------------
# public methods (parity with reference newton/broyden1/broyden2/linearmixing)
# ------------------------------------------------------------------

def newton(fcn, x0, params=(), *, solver_method: str = "exactsolve",
           solver_kwargs: Optional[dict] = None, **kwargs):
    """Newton's method: ``x_{n+1} = x_n - J^{-1}(x_n) f(x_n)`` with the exact
    Jacobian applied matrix-free (reference rootsolver.py:151-174)."""
    return _nonlin_solver(fcn, x0, params, jac_variant="newton",
                          solver_method=solver_method,
                          solver_kwargs=solver_kwargs, **kwargs)


def broyden1(fcn, x0, params=(), *, alpha=None, uv0=None, max_rank=None, **kwargs):
    """Broyden's first (good) method with fixed-capacity low-rank inverse
    Jacobian (reference rootsolver.py:176-206)."""
    return _nonlin_solver(fcn, x0, params, jac_variant="broyden1",
                          alpha=alpha, uv0=uv0, max_rank=max_rank, **kwargs)


def broyden2(fcn, x0, params=(), *, alpha=None, uv0=None, max_rank=None, **kwargs):
    """Broyden's second (bad) method (reference rootsolver.py:209-239)."""
    return _nonlin_solver(fcn, x0, params, jac_variant="broyden2",
                          alpha=alpha, uv0=uv0, max_rank=max_rank, **kwargs)


def linearmixing(fcn, x0, params=(), *, alpha=None, **kwargs):
    """Constant-scalar inverse Jacobian ``-alpha*I`` (reference :241-256)."""
    return _nonlin_solver(fcn, x0, params, jac_variant="linearmixing",
                          alpha=alpha, **kwargs)


def _get_svd_uv0(func, x0):
    """1-rank lowest-SVD warm start for the inverse Jacobian
    (reference _jacobian.py:224-232): J ≈ u s v^H at x0 ->
    Gm gains the pair (v/sqrt(s), u/sqrt(s))."""
    from xitorch_tpu.grad.jachess import jac as jac_op
    from xitorch_tpu.linalg.symeig import svd

    fjac = jac_op(lambda xx: func(xx), (x0,), idxs=0)
    u, s, vh = svd(fjac, k=1, mode="lowest", method="davidson", min_eps=1e-3)
    sinv_sqrt = 1.0 / jnp.sqrt(jnp.clip(s, min=0.1))
    return (sinv_sqrt * vh[..., 0, :], sinv_sqrt * u[..., :, 0])
