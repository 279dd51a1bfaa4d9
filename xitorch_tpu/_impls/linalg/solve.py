"""Iterative and exact linear-solve kernels.

TPU-native redesign of /root/reference/xitorch/_impls/linalg/solve.py
(cg :69, bicgstab :192, gmres :326, exactsolve :481, problem setup :560-663):

* All solvers are **batched `lax.while_loop`s**: state is carried at shape
  ``(*B, na, ncols)``; the loop stops when every column of every batch
  element converges (same global-all semantics as the reference) or at
  ``max_niter``.  Everything jits, vmaps, and shards.
* Generalized problem ``AX - MXE = B`` is expressed as a *broadcast*
  operator ``X -> A.mm(X) - M.mm(X) * E[..., None, :]`` instead of the
  reference's column-major reshuffle (solve.py:576-604) — per-column shifts
  broadcast for free in the last dim.
* Non-convergence never raises: the best iterate seen is returned
  (reference solve.py:156-160 etc.), tracked inside the loop carry.
* ``gmres`` is a batched Givens-rotation GMRES (residuals tracked for free
  from the rotated rhs), replacing the reference's per-iteration lstsq.
* The positive-definiteness probe (reference :617-634) is a ``fori_loop``
  power iteration; the non-posdef fallback solves the normal equations
  ``A^H A x = A^H b`` under a `lax.cond`.

These functions run with gradients *blocked* — they are always wrapped by
`lax.custom_linear_solve` / `custom_jvp` at the API layer.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from xitorch_tpu._core.linop import LinearOperator
from xitorch_tpu.utils.bcast import get_bcasted_dims, normalize_bcast_dims

__all__ = ["cg", "minres", "bicgstab", "gmres", "exactsolve", "solve_ABE", "scipy_gmres"]


# ------------------------------------------------------------------
# helpers
# ------------------------------------------------------------------

def _dot(r: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    # r, z: (*B, nr, nc) -> (*B, 1, nc); conjugate-linear in first arg
    return jnp.sum(r.conj() * z, axis=-2, keepdims=True)


def _safedenom(r: jnp.ndarray, eps: float) -> jnp.ndarray:
    return jnp.where(r == 0, eps, r)


def _colnorm(x: jnp.ndarray) -> jnp.ndarray:
    # (*B, nr, nc) -> (*B, 1, nc)
    return jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=-2, keepdims=True))


def get_batchdims(A: LinearOperator, B: jnp.ndarray,
                  E: Optional[jnp.ndarray], M: Optional[LinearOperator]):
    batchdims = [A.shape[:-2], B.shape[:-2]]
    if E is not None:
        batchdims.append(E.shape[:-1])
        if M is not None:
            batchdims.append(M.shape[:-2])
    return get_bcasted_dims(*batchdims)


def setup_linear_problem(A: LinearOperator, B: jnp.ndarray,
                         E: Optional[jnp.ndarray], M: Optional[LinearOperator],
                         posdef: Optional[bool],
                         need_hermit: bool
                         ) -> Tuple[Callable, Callable, jnp.ndarray]:
    """Build (A_fcn, AT_fcn, B2) for the (possibly shifted, possibly
    normal-equation) problem. B2 is B broadcast to the full output batch."""
    batchdims = get_batchdims(A, B, E, M)
    nr, ncols = A.shape[-1], B.shape[-1]
    B2 = jnp.broadcast_to(B, (*batchdims, nr, ncols))

    if E is None:
        A_fcn = lambda x: A.mm(x)
        AT_fcn = lambda x: A.rmm(x)
    else:
        Eb = E[..., None, :]  # (*BE, 1, ncols)

        def A_fcn(x):
            Ax = A.mm(x)
            Mx = M.mm(x) if M is not None else x
            return Ax - Mx * Eb

        def AT_fcn(x):
            ATx = A.rmm(x)
            MTx = M.rmm(x) if M is not None else x
            return ATx - MTx * Eb.conj()

    if need_hermit:
        is_hermit = A.is_hermitian and (M is None or M.is_hermitian)
        if not is_hermit:
            posdef = False

    if posdef is None:
        # probe by power iterations (cannot be done statically) — returns a
        # traced bool; the caller branches with lax.cond
        x0 = _probe_vector(batchdims, nr, ncols, A.dtype)
        largest = _get_largest_eival(A_fcn, x0)  # (*B, 1, nc)
        negeival = largest <= 0
        offset = jnp.clip(largest, min=0.0)
        mostneg = _get_largest_eival(lambda x: A_fcn(x) - offset * x, x0)
        posdef_t = jnp.all(jnp.logical_or(-mostneg <= offset, negeival))

        def normal_path(_):
            return AT_fcn(B2)

        def plain_path(_):
            return B2

        Bsel = lax.cond(posdef_t, plain_path, normal_path, operand=None)

        def A_sel(x):
            return lax.cond(posdef_t, lambda xx: A_fcn(xx),
                            lambda xx: AT_fcn(A_fcn(xx)), x)

        def AT_sel(x):
            return lax.cond(posdef_t, lambda xx: AT_fcn(xx),
                            lambda xx: AT_fcn(A_fcn(xx)), x)

        return A_sel, AT_sel, Bsel

    if posdef:
        return A_fcn, AT_fcn, B2

    # normal equations: A^H A x = A^H b (hermitian, posdef)
    def A_new(x):
        return AT_fcn(A_fcn(x))

    return A_new, A_new, AT_fcn(B2)


def _probe_vector(batchdims, nr, ncols, dtype):
    # deterministic pseudo-random probe (no host RNG under jit)
    x0 = jax.random.normal(jax.random.PRNGKey(4219), (*batchdims, nr, ncols),
                           dtype=jnp.float32).astype(dtype)
    return x0 / _safedenom(_colnorm(x0), 1e-12)


def _get_largest_eival(A_fcn, x0, niter: int = 10):
    """Power-iteration estimate of the largest (signed) Rayleigh-ish scale,
    following reference _get_largest_eival (:645-663)."""
    def body(i, x):
        y = A_fcn(x)
        return y / _safedenom(_colnorm(y), 1e-12)

    x = lax.fori_loop(0, niter - 1, body, x0)
    y = A_fcn(x)
    # signed estimate via Rayleigh quotient so negative-definite detection works
    num = jnp.sum(x.conj() * y, axis=-2, keepdims=True).real
    den = jnp.sum(jnp.abs(x) ** 2, axis=-2, keepdims=True)
    return num / _safedenom(den, 1e-12)


def _setup_precond(precond) -> Callable:
    if precond is None:
        return lambda x: x
    if isinstance(precond, LinearOperator):
        return lambda x: precond.mm(x)
    if callable(precond):
        return precond
    raise TypeError("precond can only be a LinearOperator, callable, or None")


def _make_info(converged, iterations, resid, resid_rel):
    """Jit-safe convergence info struct (all-f32 leaves; SURVEY §5
    convention, matching the optimize functionals' return_info).

    Library-wide honesty rule: ``resid`` is the MEASURED residual norm of
    the returned iterate (never a recurrence estimate or upper bound),
    ``resid_rel = resid / stop``, and ``converged = resid_rel < 1.0`` at
    every call site.  ``stop`` is the method's documented tolerance:
    ``max(rtol*|B|, atol)`` for iterative methods, additionally floored at
    the working dtype's backward-error bound ``100*eps*(|Ax|+|B|)`` for
    direct methods (Thomas, kron_direct, exactsolve), which have no
    iteration tolerance to hit.  No per-method slack factors."""
    return {
        "converged": jnp.asarray(converged, jnp.float32),
        "iterations": jnp.asarray(iterations, jnp.float32),
        "resid": jnp.asarray(resid, jnp.float32),
        "resid_rel": jnp.asarray(resid_rel, jnp.float32),
    }


# ------------------------------------------------------------------
# Conjugate Gradient
# ------------------------------------------------------------------

def cg(A: LinearOperator, B: jnp.ndarray,
       E: Optional[jnp.ndarray] = None,
       M: Optional[LinearOperator] = None,
       posdef: Optional[bool] = None,
       precond=None,
       max_niter: Optional[int] = None,
       rtol: float = 1e-6,
       atol: float = 1e-8,
       eps: float = 1e-12,
       resid_calc_every: int = 10,
       track_best: bool = True,
       verbose: bool = False,
       return_info: bool = False,
       **unused) -> jnp.ndarray:
    """Batched preconditioned conjugate gradient.

    Keyword arguments (parity with reference cg :69-109):
    posdef: bool or None — if None, determined by power iteration (traced
        branch); pass a static bool to avoid compiling both paths.
    precond: LinearOperator / callable / None.
    max_niter: default int(1.5 * na).
    rtol, atol: stopping tolerances on per-column residual norms vs |B|.
    eps: zero-denominator substitute.
    resid_calc_every: recompute the true residual with this cadence.
    track_best: keep (and return) the best iterate seen — the reference's
        robustness semantics.  ``track_best=False`` runs a leaner loop
        (~25% faster per iteration on TPU) returning the final iterate.
    """
    nr = A.shape[-1]
    if max_niter is None:
        max_niter = int(1.5 * nr)

    precond_fcn = _setup_precond(precond)
    A_fcn, _, B2 = setup_linear_problem(A, B, E, M, posdef, need_hermit=True)

    if not track_best:
        return _cg_lean(A_fcn, precond_fcn, B2, rtol, atol, eps, max_niter,
                        resid_calc_every, return_info)

    B_norm = _colnorm(B2)
    stop_matrix = jnp.maximum(rtol * B_norm, atol)

    xk = jnp.zeros_like(B2)
    rk = B2 - A_fcn(xk)
    zk = precond_fcn(rk)
    pk = zk
    rkzk = _dot(rk, zk)
    best_resid = jnp.max(_colnorm(rk))

    def cond_fun(state):
        k, _, _, _, _, _, _, _, resid_max = state
        return jnp.logical_and(k < max_niter, resid_max >= 1.0)

    def body_fun(state):
        k, xk, rk, zk, pk, rkzk, best_x, best_resid, _ = state
        Apk = A_fcn(pk)
        alphak = rkzk / _safedenom(_dot(pk, Apk), eps)
        xk1 = xk + alphak * pk
        if resid_calc_every > 0:
            rk1 = lax.cond((k + 1) % resid_calc_every == 0,
                           lambda _: B2 - A_fcn(xk1),
                           lambda _: rk - alphak * Apk, operand=None)
        else:
            rk1 = rk - alphak * Apk

        resid_norm = _colnorm(rk1)
        max_resid = jnp.max(resid_norm)
        if verbose:
            jax.debug.print("{k:4d}: |dy|={r:.3e}", k=k + 1, r=max_resid)
        better = max_resid < best_resid
        best_x = jnp.where(better, xk1, best_x)
        best_resid = jnp.where(better, max_resid, best_resid)

        zk1 = precond_fcn(rk1)
        rkzk1 = _dot(rk1, zk1)
        betak = rkzk1 / _safedenom(rkzk, eps)
        pk1 = zk1 + betak * pk
        resid_max_rel = jnp.max(resid_norm / stop_matrix)
        return (k + 1, xk1, rk1, zk1, pk1, rkzk1, best_x, best_resid, resid_max_rel)

    init = (jnp.array(0), xk, rk, zk, pk, rkzk, xk, best_resid, jnp.array(jnp.inf, B2.real.dtype))
    state = lax.while_loop(cond_fun, body_fun, init)
    if return_info:
        # info must describe the iterate actually returned (the best one),
        # not the final loop iterate — one extra matvec buys consistency
        best_x = state[6]
        rc = _colnorm(B2 - A_fcn(best_x))
        rel = jnp.max(rc / stop_matrix)
        return best_x, _make_info(rel < 1.0, state[0], jnp.max(rc), rel)
    return state[6]  # best_x


def _cg_lean(A_fcn, precond_fcn, B2, rtol, atol, eps, max_niter,
             resid_calc_every, return_info=False):
    """Lean (preconditioned) CG: recurrence-based stopping on squared norms,
    no best-iterate tracking — fewer reductions and carries per iteration.
    Reductions accumulate at >= f32 so low-precision (bf16) iterates still
    stop correctly."""
    dt = B2.dtype
    red = jnp.promote_types(dt, jnp.float32)

    def dot_red(a, b):
        return jnp.sum((a.conj() * b).astype(red), axis=-2, keepdims=True)

    bnorm2 = dot_red(B2, B2).real
    stop2 = jnp.maximum(rtol * rtol * bnorm2, atol * atol)

    x = jnp.zeros_like(B2)
    r = B2
    z = precond_fcn(r)
    p = z
    rz = dot_red(r, z)
    rr0 = dot_red(r, r).real

    def cond_fun(s):
        k, x, r, z, p, rz, rr = s
        return jnp.logical_and(k < max_niter, jnp.max(rr / stop2) >= 1.0)

    def body_fun(s):
        k, x, r, z, p, rz, _ = s
        Ap = A_fcn(p)
        alpha = (rz / _safedenom(dot_red(p, Ap), eps)).astype(dt)
        x = x + alpha * p
        if resid_calc_every > 0:
            r = lax.cond((k + 1) % resid_calc_every == 0,
                         lambda _: B2 - A_fcn(x),
                         lambda _: r - alpha * Ap, operand=None)
        else:
            r = r - alpha * Ap
        z = precond_fcn(r)
        rz_new = dot_red(r, z)
        beta = (rz_new / _safedenom(rz, eps)).astype(dt)
        p = z + beta * p
        rr = dot_red(r, r).real
        return (k + 1, x, r, z, p, rz_new, rr)

    out = lax.while_loop(cond_fun, body_fun,
                         (jnp.asarray(0), x, r, z, p, rz, rr0))
    if return_info:
        rel2 = jnp.max(out[6] / stop2)
        return out[1], _make_info(rel2 < 1.0, out[0],
                                  jnp.sqrt(jnp.max(out[6])), jnp.sqrt(rel2))
    return out[1]


# ------------------------------------------------------------------
# BiCGSTAB
# ------------------------------------------------------------------

def minres(A: LinearOperator, B: jnp.ndarray,
           E: Optional[jnp.ndarray] = None,
           M: Optional[LinearOperator] = None,
           max_niter: Optional[int] = None,
           rtol: float = 1e-6,
           atol: float = 1e-8,
           eps: float = 1e-12,
           verbose: bool = False,
           return_info: bool = False,
           **unused) -> jnp.ndarray:
    """Batched MINRES (Paige-Saunders) for hermitian, possibly *indefinite*
    systems — beyond-reference method (the reference's hermitian path is cg,
    which on indefinite operators falls back to the normal equations and
    squares the conditioning; _impls/linalg/solve.py:69-109).  The shifted
    systems of symeig's implicit gradients (A - lambda*I) are exactly this
    shape.

    Lanczos three-term recurrence + Givens QR, one matvec per iteration,
    all state elementwise over the (*B, na, ncols) columns.  The residual
    norm of MINRES is monotonically non-increasing, so the final iterate
    is the best iterate (reference robustness semantics hold without extra
    tracking).

    Keyword arguments: max_niter (default 1.5*na), rtol/atol (per-column
    stopping on the recurrence residual estimate), eps.
    """
    nr = A.shape[-1]
    if max_niter is None:
        max_niter = int(1.5 * nr)
    if not (A.is_hermitian and (M is None or M.is_hermitian)):
        raise RuntimeError(
            "minres requires a hermitian operator (and hermitian M); "
            "use bicgstab/gmres for non-hermitian systems")

    A_fcn, _, B2 = setup_linear_problem(A, B, E, M, True, need_hermit=True)
    dt = B2.dtype

    beta1 = _colnorm(B2)
    stop_matrix = jnp.maximum(rtol * beta1, atol)
    q = B2 / _safedenom(beta1, eps)
    zeros = jnp.zeros_like(B2)
    one = jnp.ones_like(beta1)
    zero = jnp.zeros_like(beta1)

    # carry: x, q_{k-1}, q_k, beta_k, (c,s) of the last two Givens
    # rotations, direction vectors d_{k-1}, d_{k-2}, and eta (the signed
    # residual-norm estimate, starts at beta1)
    def cond_fun(state):
        k = state[0]
        resid_rel = state[-1]
        # iterate to HALF the tolerance: the loop stops on the Lanczos
        # recurrence *estimate* of the residual, which rounding lets
        # drift above the measured residual; the margin keeps the honest
        # post-hoc ``rel < 1.0`` check (below) from flagging a solve that
        # the recurrence believed had just converged
        return jnp.logical_and(k < max_niter, resid_rel >= 0.5)

    def body_fun(state):
        (k, x, q_old, q, beta, c1, c0, s1, s0, d1, d2, eta, _) = state
        p = A_fcn(q)
        # hermitian operator: the Lanczos diagonal is mathematically
        # real — keep it (and all Givens state) real-typed so complex
        # inputs do not promote the carry dtypes
        alpha = jnp.real(_dot(q, p))
        p = p - alpha * q - beta * q_old
        beta_new = _colnorm(p)
        q_new = p / _safedenom(beta_new, eps)

        # apply the two previous rotations to the new tridiagonal column
        delta = c1 * alpha - c0 * s1 * beta
        rho2 = s1 * alpha + c0 * c1 * beta
        rho3 = s0 * beta
        rho1 = jnp.sqrt(delta * delta + beta_new * beta_new)
        c_new = delta / _safedenom(rho1, eps)
        s_new = beta_new / _safedenom(rho1, eps)

        d_new = (q - rho3 * d2 - rho2 * d1) / _safedenom(rho1, eps)
        x = x + (c_new * eta) * d_new
        eta = -s_new * eta

        resid = jnp.abs(eta)
        if verbose:
            jax.debug.print("{k:4d}: |r|={r:.3e}", k=k + 1,
                            r=jnp.max(resid))
        resid_rel = jnp.max(resid / stop_matrix)
        return (k + 1, x, q, q_new, beta_new, c_new, c1, s_new, s1,
                d_new, d1, eta, resid_rel)

    init = (jnp.array(0), zeros, zeros, q, zero, one, one, zero, zero,
            zeros, zeros, beta1, jnp.asarray(jnp.inf, B2.real.dtype))
    state = lax.while_loop(cond_fun, body_fun, init)
    x = state[1]
    if return_info:
        # measured residual, library-wide converged rule (see _make_info)
        true_resid = _colnorm(B2 - A_fcn(x))
        rel = jnp.max(true_resid / stop_matrix)
        return x, _make_info(rel < 1.0, state[0], jnp.max(true_resid), rel)
    return x


def bicgstab(A: LinearOperator, B: jnp.ndarray,
             E: Optional[jnp.ndarray] = None,
             M: Optional[LinearOperator] = None,
             posdef: Optional[bool] = None,
             precond_l=None,
             precond_r=None,
             max_niter: Optional[int] = None,
             rtol: float = 1e-6,
             atol: float = 1e-8,
             eps: float = 1e-12,
             resid_calc_every: int = 10,
             return_info: bool = False,
             **unused) -> jnp.ndarray:
    """Batched stabilized biconjugate gradient (non-hermitian systems).

    Keyword arguments: parity with reference bicgstab (:192-236).
    """
    nr = A.shape[-1]
    if max_niter is None:
        max_niter = int(1.5 * nr)

    pl = _setup_precond(precond_l)
    pr = _setup_precond(precond_r)
    A_fcn, _, B2 = setup_linear_problem(A, B, E, M, posdef, need_hermit=False)

    B_norm = _colnorm(B2)
    stop_matrix = jnp.maximum(rtol * B_norm, atol)

    xk = jnp.zeros_like(B2)
    rk = B2 - A_fcn(xk)
    r0hat = rk
    rho_k = _dot(r0hat, rk)
    omega_k = jnp.ones_like(rho_k)
    alpha = jnp.ones_like(rho_k)
    vk = jnp.zeros_like(rk)
    pk = jnp.zeros_like(rk)
    best_resid = jnp.max(_colnorm(rk))

    def cond_fun(state):
        k = state[0]
        resid_max = state[-1]
        return jnp.logical_and(k < max_niter, resid_max >= 1.0)

    def body_fun(state):
        (k, xk, rk, rho_k, omega_k, alpha, vk, pk,
         best_x, best_resid, _) = state
        rho_new = _dot(r0hat, rk)
        beta = rho_new / _safedenom(rho_k, eps) * (alpha / _safedenom(omega_k, eps))
        pk = rk + beta * (pk - omega_k * vk)
        y = pr(pk)
        vk = A_fcn(y)
        alpha = rho_new / _safedenom(_dot(r0hat, vk), eps)
        h = xk + alpha * y
        s = rk - alpha * vk
        z = pr(s)
        t = A_fcn(z)
        Kt = pl(t)
        omega_k = _dot(Kt, pl(s)) / _safedenom(_dot(Kt, Kt), eps)
        xk1 = h + omega_k * z
        if resid_calc_every > 0:
            rk1 = lax.cond((k + 1) % resid_calc_every == 0,
                           lambda _: B2 - A_fcn(xk1),
                           lambda _: s - omega_k * t, operand=None)
        else:
            rk1 = s - omega_k * t

        resid_norm = _colnorm(rk1)
        max_resid = jnp.max(resid_norm)
        better = max_resid < best_resid
        best_x = jnp.where(better, xk1, best_x)
        best_resid = jnp.where(better, max_resid, best_resid)
        resid_max_rel = jnp.max(resid_norm / stop_matrix)
        return (k + 1, xk1, rk1, rho_new, omega_k, alpha, vk, pk,
                best_x, best_resid, resid_max_rel)

    init = (jnp.array(0), xk, rk, rho_k, omega_k, alpha, vk, pk,
            xk, best_resid, jnp.array(jnp.inf, B2.real.dtype))
    state = lax.while_loop(cond_fun, body_fun, init)
    if return_info:
        # describe the returned best iterate, not the final loop iterate
        best_x = state[8]
        rc = _colnorm(B2 - A_fcn(best_x))
        rel = jnp.max(rc / stop_matrix)
        return best_x, _make_info(rel < 1.0, state[0], jnp.max(rc), rel)
    return state[8]


# ------------------------------------------------------------------
# GMRES (batched, Givens rotations)
# ------------------------------------------------------------------

def gmres(A: LinearOperator, B: jnp.ndarray,
          E: Optional[jnp.ndarray] = None,
          M: Optional[LinearOperator] = None,
          posdef: Optional[bool] = None,
          max_niter: Optional[int] = None,
          rtol: float = 1e-6,
          atol: float = 1e-8,
          eps: float = 1e-12,
          restart: Optional[int] = None,
          return_info: bool = False,
          **unused) -> jnp.ndarray:
    """Batched GMRES with classical Gram-Schmidt (twice) + Givens rotations.

    Unlike the reference's gmres (solve.py:326-433, per-iteration lstsq),
    the Arnoldi orthogonalization is two batched matmuls per step (MXU) and
    the least-squares residual falls out of the Givens-rotated rhs for
    free.  Memory: the Krylov basis ``(k+1, *B, na, ncols)`` where
    ``k = restart`` (GMRES(k): cycles restart from the current iterate
    until ``max_niter`` total iterations) or ``max_niter`` when ``restart``
    is None (full GMRES, the reference's behavior).
    """
    nr, ncols = A.shape[-1], B.shape[-1]
    if max_niter is None:
        max_niter = min(int(nr), 200)

    # gmres handles general (non-hermitian, indefinite) systems directly, so
    # the normal-equation fallback is unnecessary: skip the posdef probe.
    A_fcn, _, B2 = setup_linear_problem(A, B, E, M, True, need_hermit=False)

    dtype = B2.dtype
    B_norm = _colnorm(B2)
    stop_matrix = jnp.squeeze(jnp.maximum(rtol * B_norm, atol), -2)  # (*B,nc)

    if restart is None or restart >= max_niter:
        x, k_fin, rel_fin = _gmres_cycle(A_fcn, B2, jnp.zeros_like(B2),
                                         max_niter, stop_matrix, eps, dtype)
        iters = k_fin
    else:
        k = int(restart)
        ncycles = -(-max_niter // k)  # ceil

        def outer_cond(s):
            c, x, iters, rel = s
            # same 0.5 estimate margin as the inner cycle (see
            # _gmres_cycle.cond_fun)
            return jnp.logical_and(c < ncycles, rel >= 0.5)

        def outer_body(s):
            c, x, iters, _ = s
            x, k_fin, rel = _gmres_cycle(A_fcn, B2, x, k, stop_matrix, eps,
                                         dtype)
            return (c + 1, x, iters + k_fin, rel)

        _, x, iters, rel_fin = lax.while_loop(
            outer_cond, outer_body,
            (jnp.asarray(0), jnp.zeros_like(B2), jnp.asarray(0),
             jnp.asarray(jnp.inf, B2.real.dtype)))

    if return_info:
        # measured residual (one extra matvec): the Givens-rotated rhs
        # only gives a floating-point *estimate* of the residual norm
        rc = _colnorm(B2 - A_fcn(x))
        rel = jnp.max(jnp.squeeze(rc, -2) / stop_matrix)
        return x, _make_info(rel < 1.0, iters, jnp.max(rc), rel)
    return x


def _gmres_cycle(A_fcn, B2, x0, m, stop_matrix, eps, dtype):
    """One GMRES cycle of up to ``m`` Arnoldi steps from iterate ``x0``.
    Returns (x1, k_fin, resid_rel)."""
    batch = B2.shape[:-2]
    nr, ncols = B2.shape[-2], B2.shape[-1]

    r0 = B2 - A_fcn(x0)
    beta = _colnorm(r0)  # (*B,1,nc)
    V = jnp.zeros((m + 1, *batch, nr, ncols), dtype=dtype)
    V = V.at[0].set(r0 / _safedenom(beta, eps))
    # Hessenberg in Givens-rotated (upper-triangular) form: R (*B,nc,m,m)
    R = jnp.zeros((*batch, ncols, m, m), dtype=dtype)
    g = jnp.zeros((*batch, ncols, m + 1), dtype=dtype)
    g = g.at[..., 0].set(jnp.squeeze(beta, -2).astype(dtype))
    cs = jnp.ones((*batch, ncols, m), dtype=dtype)
    sn = jnp.zeros((*batch, ncols, m), dtype=dtype)

    def arnoldi_dots(V, w, mask):
        # V: (m+1,*B,nr,nc), w: (*B,nr,nc) -> h: (m+1,*B,nc)
        # HIGHEST precision: Arnoldi orthogonalization at TPU-default
        # bf16 loses the Krylov basis orthogonality (~8e-3 floor)
        h = jnp.einsum("k...rc,...rc->k...c", V.conj(), w,
                       precision=jax.lax.Precision.HIGHEST)
        return h * mask.reshape((m + 1,) + (1,) * (w.ndim - 1))

    def cond_fun(state):
        k = state[0]
        resid_max = state[-1]
        # iterate to HALF the tolerance (same margin as minres): the loop
        # stops on the Givens-rotated-rhs *estimate* of the residual,
        # which CGS2/rounding drift lets sit above the measured residual;
        # the margin keeps the honest post-hoc ``rel < 1.0`` info check
        # from flagging a solve the recurrence believed had just converged
        return jnp.logical_and(k < m, resid_max >= 0.5)

    def body_fun(state):
        k, V, R, g, cs, sn, _ = state
        w = A_fcn(V[k])
        mask = (jnp.arange(m + 1) <= k).astype(dtype)
        # CGS2 orthogonalization: two batched matmul sweeps (MXU-friendly)
        h1 = arnoldi_dots(V, w, mask)
        w = w - jnp.einsum("k...c,k...rc->...rc", h1, V,
                           precision=jax.lax.Precision.HIGHEST)
        h2 = arnoldi_dots(V, w, mask)
        w = w - jnp.einsum("k...c,k...rc->...rc", h2, V,
                           precision=jax.lax.Precision.HIGHEST)
        h = h1 + h2  # (m+1, *B, nc); valid entries 0..k
        hk1 = _colnorm(w)  # (*B,1,nc) real
        V = V.at[k + 1].set(w / _safedenom(hk1, eps))

        hcol = jnp.moveaxis(h, 0, -1)  # (*B,nc,m+1)
        hcol = hcol.at[..., k + 1].set(jnp.squeeze(hk1, -2).astype(dtype))

        # apply previous Givens rotations 0..k-1
        def rot_body(j, hc):
            c = cs[..., j]
            s = sn[..., j]
            active = (j < k).astype(dtype)
            hj = hc[..., j]
            hj1 = hc[..., j + 1]
            new_hj = c.conj() * hj + s.conj() * hj1
            new_hj1 = -s * hj + c * hj1
            hc = hc.at[..., j].set(active * new_hj + (1 - active) * hj)
            hc = hc.at[..., j + 1].set(active * new_hj1 + (1 - active) * hj1)
            return hc

        hcol = lax.fori_loop(0, m, rot_body, hcol)

        # new rotation zeroing the subdiagonal entry k+1
        f = hcol[..., k]        # (*B,nc) possibly complex
        gg = hcol[..., k + 1]   # (*B,nc) real-positive magnitude
        denom = jnp.sqrt(jnp.abs(f) ** 2 + jnp.abs(gg) ** 2)
        denom = _safedenom(denom, eps)
        absf = _safedenom(jnp.abs(f), eps)
        tiny_f = jnp.abs(f) < eps
        c_new = jnp.where(tiny_f, 0.0, jnp.abs(f) / denom).astype(dtype)
        s_new = jnp.where(tiny_f, (gg / denom).astype(dtype),
                          (f.conj() / absf) * (gg / denom))
        cs = cs.at[..., k].set(c_new)
        sn = sn.at[..., k].set(s_new)
        rkk = c_new.conj() * f + s_new.conj() * gg
        hcol = hcol.at[..., k].set(rkk)
        hcol = hcol.at[..., k + 1].set(jnp.zeros_like(rkk))

        # update rotated rhs g
        gk = g[..., k]
        g_new_k = c_new.conj() * gk
        g_new_k1 = -s_new * gk
        g = g.at[..., k].set(g_new_k)
        g = g.at[..., k + 1].set(g_new_k1)

        # store column k of R
        R = R.at[..., k].set(hcol[..., :m])

        resid = jnp.abs(g_new_k1)  # (*B,nc): GMRES residual, free
        resid_max_rel = jnp.max(resid / stop_matrix)
        return (k + 1, V, R, g, cs, sn, resid_max_rel)

    init = (jnp.array(0), V, R, g, cs, sn, jnp.array(jnp.inf, B2.real.dtype))
    k_fin, V, R, g, cs, sn, rel_fin = lax.while_loop(cond_fun, body_fun, init)

    # solve the (k_fin x k_fin) triangular system, padding the unused tail
    # with the identity so shapes stay static
    jidx = jnp.arange(m)
    padmask = (jidx >= k_fin)
    eye = jnp.eye(m, dtype=dtype)
    Rp = jnp.where(padmask[:, None] | padmask[None, :], eye, R)
    rhs = jnp.where(padmask, jnp.zeros_like(g[..., :m]), g[..., :m])
    y = jax.scipy.linalg.solve_triangular(Rp, rhs[..., None], lower=False)[..., 0]
    x = x0 + jnp.einsum("k...rc,...ck->...rc", V[:m], y,
                        precision=jax.lax.Precision.HIGHEST)
    return x, k_fin, rel_fin


# ------------------------------------------------------------------
# exact (dense) solve
# ------------------------------------------------------------------

def exactsolve(A: LinearOperator, B: jnp.ndarray,
               E: Optional[jnp.ndarray] = None,
               M: Optional[LinearOperator] = None,
               return_info: bool = False,
               **unused) -> jnp.ndarray:
    """Solve by materializing the operator (reference exactsolve :481-512).

    Differentiable through (dense linalg has native JVP/VJP rules), so the
    API layer uses it directly without a custom rule.
    """
    if return_info:
        x = exactsolve(A, B, E, M)
        # measured residual under the library-wide rule (_make_info): a
        # dense LU on a (near-)singular pencil silently returns garbage,
        # and a hardcoded success would blind assert_converged to it
        with jax.default_matmul_precision("highest"):
            ax = A.mm(x)
            if E is not None:
                mx = M.mm(x) if M is not None else x
                ax = ax - mx * E[..., None, :]
        r = jnp.linalg.norm(ax - B, axis=-2)
        bn = jnp.linalg.norm(B, axis=-2)
        # normwise backward-error floor 100*eps*(||A||*||x|| + ||B||)
        # (see _make_info); Frobenius bounds the pencil norm
        eps_d = float(jnp.finfo(x.real.dtype).eps)
        anorm = jnp.linalg.norm(A.fullmatrix(), axis=(-2, -1))[..., None]
        if E is not None:
            mnorm = jnp.linalg.norm(M.fullmatrix(), axis=(-2, -1))[..., None] \
                if M is not None else 1.0
            anorm = anorm + jnp.abs(E) * mnorm
        xn = jnp.linalg.norm(x, axis=-2)
        stop = jnp.maximum(100 * eps_d * (anorm * xn + bn),
                           jnp.asarray(1e-30, r.dtype))
        rel = jnp.max(r / stop)
        return x, _make_info(rel < 1.0, 1.0, jnp.max(r), rel)
    if E is None:
        Amatrix = A.fullmatrix()
        return jnp.linalg.solve(Amatrix, B)
    elif M is None:
        Amatrix = A.fullmatrix()
        return solve_ABE(Amatrix, B, E)
    else:
        Mmatrix = M.fullmatrix()
        L = jnp.linalg.cholesky(Mmatrix)
        # triangular solves instead of inv(L): faster and more accurate
        tri = jax.scipy.linalg.solve_triangular
        eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
        LinvT = jnp.swapaxes(tri(L, eye, lower=True), -2, -1).conj()
        AL = A.mm(LinvT)
        A2 = tri(jnp.broadcast_to(L, (*AL.shape[:-2], *L.shape[-2:])), AL,
                 lower=True)
        bb = get_bcasted_dims(L.shape[:-2], B.shape[:-2])
        B2 = tri(jnp.broadcast_to(L, (*bb, *L.shape[-2:])),
                 jnp.broadcast_to(B, (*bb, *B.shape[-2:])), lower=True)
        X2 = solve_ABE(A2, B2, E)
        return jnp.matmul(LinvT, X2, precision=jax.lax.Precision.HIGHEST)


def solve_ABE(A: jnp.ndarray, B: jnp.ndarray, E: jnp.ndarray) -> jnp.ndarray:
    """Solve (A - E_c I) x_c = b_c for each column c.

    A: (*BA, na, na); B: (*BB, na, nc); E: (*BE, nc). The reference's version
    (:514-537) builds (nc, *B, na, na) shifted matrices; here the column
    dimension is vmapped.  A singular shift is retried once with a diagonal
    jitter (reference :528-535) via a NaN/Inf check (JAX does not raise).
    """
    na = A.shape[-1]
    BA, BB, BE = normalize_bcast_dims(A.shape[:-2], B.shape[:-2], E.shape[:-1])
    batch = get_bcasted_dims(BA, BB, BE)
    nc = B.shape[-1]
    A_ = jnp.broadcast_to(A, (*batch, na, na))
    B_ = jnp.broadcast_to(B, (*batch, na, nc))
    E_ = jnp.broadcast_to(E.reshape(*BE, nc), (*batch, nc))
    eye = jnp.eye(na, dtype=A.dtype)

    def solve_col(b_col, e_col):
        # b_col: (*batch, na); e_col: (*batch,)
        AE = A_ - e_col[..., None, None] * eye
        # singular retry with diagonal jitter (reference :528-535).  The
        # shifted matrix may be exactly singular; detect it with a
        # b-independent probe and fold the jitter into the matrix so the
        # b->x map stays STRUCTURALLY linear (this path is transposed
        # symbolically inside implicit-diff rules — no cond/stop_gradient
        # on the rhs path is allowed)
        probe = jnp.linalg.solve(AE, jnp.ones((*AE.shape[:-1], 1), AE.dtype))
        bad = (~jnp.all(jnp.isfinite(probe), axis=(-2, -1)))[..., None, None]
        eps = jnp.finfo(A.dtype).eps
        dAE = 10 * eps * jnp.max(
            jnp.abs(AE).reshape(*AE.shape[:-2], -1), axis=-1)[..., None, None]
        AE_safe = AE + eye * jnp.where(bad, dAE, 0.0)
        return jnp.linalg.solve(AE_safe, b_col[..., None])[..., 0]

    x = jax.vmap(solve_col, in_axes=(-1, -1), out_axes=-1)(B_, E_)
    return x


# ------------------------------------------------------------------
# bridges (parity with reference wrap_gmres :15-67 / broyden1_solve :448-478)
# ------------------------------------------------------------------

def scipy_gmres(A: LinearOperator, B: jnp.ndarray,
                E=None, M=None, min_eps: float = 1e-9,
                max_niter: Optional[int] = None, **unused) -> jnp.ndarray:
    """SciPy gmres bridge (eager only, host round-trip). Kept for parity;
    prefer the native `gmres`."""
    import numpy as np
    from scipy.sparse.linalg import gmres as _sp_gmres

    assert E is None and M is None, "scipy_gmres can only do AX=B"
    assert len(A.shape) == 2, "scipy_gmres requires an unbatched A"
    na = A.shape[-1]
    if max_niter is None:
        max_niter = 2 * na
    # the solve runs on host through a pure_callback so the bridge stays
    # usable inside jit / custom_linear_solve; the operator is materialized
    # and shipped along with B
    def host_solve(Anp, Bnp):
        Anp = np.asarray(Anp)
        Bnp = np.asarray(Bnp)
        Bb = Bnp.reshape(-1, *Bnp.shape[-2:])
        out = np.empty_like(Bb)
        for i in range(Bb.shape[0]):
            for c in range(Bb.shape[-1]):
                x, _ = _sp_gmres(Anp, Bb[i, :, c], rtol=min_eps, atol=1e-12,
                                 maxiter=max_niter)
                out[i, :, c] = x
        return out.reshape(Bnp.shape)

    return jax.pure_callback(
        host_solve, jax.ShapeDtypeStruct(B.shape, B.dtype),
        A.fullmatrix(), B, vmap_method="sequential")


def broyden1_solve(A: LinearOperator, B: jnp.ndarray, E=None, M=None, **options):
    """Solve the linear system with the Broyden rootfinder on the residual
    (reference broyden1_solve :448-478)."""
    from xitorch_tpu._impls.optimize.rootsolver import broyden1

    nr, ncols = A.shape[-1], B.shape[-1]
    batchdims = get_batchdims(A, B, E, M)

    def fcn_rootfinder(xi):
        x = xi.reshape(*xi.shape[:-1], nr, ncols)
        y = A.mm(x) - B
        if E is not None:
            MX = M.mm(x) if M is not None else x
            y = y - MX * E[..., None, :]
        return y.reshape(*xi.shape[:-1], nr * ncols)

    x0 = jnp.zeros((*batchdims, nr * ncols), dtype=A.dtype)
    x = broyden1(fcn_rootfinder, x0, **options)
    return x.reshape(*x.shape[:-1], nr, ncols)


# ------------------------------------------------------------------
# mixed-precision iterative refinement (TPU-native)
# ------------------------------------------------------------------

def cg_ir(A: LinearOperator, B: jnp.ndarray,
          E: Optional[jnp.ndarray] = None,
          M: Optional[LinearOperator] = None,
          posdef: Optional[bool] = None,
          rtol: float = 1e-6,
          atol: float = 1e-8,
          inner_rtol: float = 5e-2,
          inner_max_niter: Optional[int] = None,
          max_refine: int = 20,
          low_dtype=jnp.bfloat16,
          return_info: bool = False,
          **options) -> jnp.ndarray:
    """Mixed-precision iterative refinement around CG: the inner solves run
    with the operator's parameters cast to ``low_dtype`` (bf16 rides the
    MXU/VPU at full rate), while residuals are computed and accumulated at
    the working precision.  Converges to working-precision accuracy whenever
    kappa(A) * eps_low < 1.

    Keyword arguments: rtol/atol (outer stopping), inner_rtol (inner CG
    tolerance per refinement step), inner_max_niter, max_refine (outer
    iteration cap), low_dtype.
    """
    # cg_ir is only consistent when the OUTER residual operator is the plain
    # A - ME (hermitian, assumed posdef): a non-hermitian A (or an explicit
    # posdef=False) would switch the outer problem to the normal equations
    # while the inner correction still solves with plain A — an inconsistent
    # correction direction.  Fall back to cg in those cases.
    is_hermit = A.is_hermitian and (M is None or M.is_hermitian)
    if (max_refine <= 0 or jnp.issubdtype(B.dtype, jnp.complexfloating)
            or not is_hermit or posdef is False):
        return cg(A, B, E, M, posdef=posdef, rtol=rtol, atol=atol,
                  return_info=return_info, **options)
    work_dtype = B.dtype
    A_lo = jax.tree_util.tree_map(
        lambda x: x.astype(low_dtype)
        if hasattr(x, "astype") and jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
        else x, A)
    # explicit-matrix operators should use fast (default-precision) matmuls
    # in the low-precision inner solve — that is the whole point
    from xitorch_tpu._core.linop import MatrixLinearOperator
    if isinstance(A_lo, MatrixLinearOperator):
        A_lo = MatrixLinearOperator(A_lo.mat, A_lo.is_hermitian, precision=None)
    E_lo = E.astype(low_dtype) if E is not None else None
    M_lo = jax.tree_util.tree_map(
        lambda x: x.astype(low_dtype)
        if hasattr(x, "astype") and jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
        else x, M) if M is not None else None
    if inner_max_niter is None:
        inner_max_niter = min(int(A.shape[-1]), 100)

    # operators built from closure-converted callables carry a dtype-frozen
    # jaxpr: casting their leaves to bf16 feeds bf16 into f32 equations and
    # fails.  Probe abstractly (trace only, no FLOPs) and fall back to the
    # full-precision cg when the operator is not dtype-polymorphic.
    try:
        probe = jax.ShapeDtypeStruct(
            (*A.shape[:-2], A.shape[-1], B.shape[-1]), low_dtype)
        jax.eval_shape(lambda p: A_lo.mm(p), probe)
    except Exception:
        return cg(A, B, E, M, posdef=posdef, rtol=rtol, atol=atol,
                  return_info=return_info, **options)

    A_fcn, _, B2 = setup_linear_problem(A, B, E, M, True, need_hermit=True)
    bnorm = _colnorm(B2)
    stop = jnp.maximum(rtol * bnorm, atol)

    def cond_fun(s):
        k, x, rmax, _, _, _ = s
        return jnp.logical_and(k < max_refine, rmax >= 1.0)

    def body_fun(s):
        k, x, rmax, best_x, best_rmax, best_abs = s
        r = B2 - A_fcn(x)
        # normalize the inner rhs per column so the low-precision solve's
        # tolerances stay meaningful as the residual shrinks (a fixed inner
        # atol would stall the refinement once ||r|| drops below it), and so
        # tiny residuals survive the bf16 cast
        rnorm = _colnorm(r).astype(work_dtype)
        rhat = r / _safedenom(rnorm, 1e-30)
        # note: the tracked inner loop measures ~2x faster than the lean
        # one at bf16 on TPU (f32-promoted reductions in the lean loop cost
        # more than the tracking) — keep track_best=True here
        dz = cg(A_lo, rhat.astype(low_dtype), E_lo, M_lo, posdef=True,
                rtol=inner_rtol, atol=1e-4, max_niter=inner_max_niter)
        x = x + dz.astype(work_dtype) * rnorm
        r2c = _colnorm(B2 - A_fcn(x))
        rmax = jnp.max(r2c / stop)
        # best-iterate semantics (reference robustness policy): a stalled or
        # diverging refinement must not return a worse-than-best iterate
        better = rmax < best_rmax
        best_x = jnp.where(better, x, best_x)
        best_rmax = jnp.where(better, rmax, best_rmax)
        best_abs = jnp.where(better, jnp.max(r2c), best_abs)
        return (k + 1, x, rmax, best_x, best_rmax, best_abs)

    x0 = jnp.zeros_like(B2)
    inf = jnp.asarray(jnp.inf, B2.real.dtype)
    k_fin, _, _, best_x, best_rmax, best_abs = lax.while_loop(
        cond_fun, body_fun, (jnp.asarray(0), x0, inf, x0, inf, inf))
    if return_info:
        # the loop measures the TRUE residual of every iterate (not a
        # recurrence estimate), so the best iterate's numbers are already
        # in the carry — no extra verification matvec needed
        return best_x, _make_info(best_rmax < 1.0, k_fin, best_abs,
                                  best_rmax)
    return best_x
