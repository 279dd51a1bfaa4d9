"""Partial symmetric eigendecomposition ``AX = MXE`` and SVD.

API parity with /root/reference/xitorch/linalg/symeig.py:17-250.  The
autograd adapter (symeig_torchfcn :252-402) is replaced by a
``jax.custom_jvp`` on the iterative path:

* dλ_i = x_i^H (dA - λ_i dM) x_i
* (A - λ_i M) dx_i = -P_i (dA x_i - dλ_i M x_i - λ_i dM x_i), the projected
  shifted solve — the same generalized ``solve(A, -B, E=evals, M)`` the
  reference backward uses (:365-367), including the degeneracy projection
  ``_ortho`` with the degeneracy map (:316-322, 404-448) and the complex
  eigenvalue offset (:360-363).  Reverse mode and 2nd order come from
  transposition of this linear rule.

The dense path ("exacteig") differentiates natively through the
degeneracy-safe ``degen_eigh``.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from xitorch_tpu._core.linop import LinearOperator
from xitorch_tpu._impls.linalg.symeig import (
    chebfsi, davidson, exacteig, kron_exacteig,
)
from xitorch_tpu.debug.modes import is_debug_enabled
from xitorch_tpu.linalg.solve import solve
from xitorch_tpu.utils.misc import get_method

__all__ = ["lsymeig", "usymeig", "symeig", "svd"]

_SYMEIG_METHODS = {
    "davidson": davidson,
    "chebfsi": chebfsi,
    "exacteig": exacteig,
    "custom_exacteig": exacteig,
    "kron_exact": kron_exacteig,
}


def lsymeig(A: LinearOperator, neig: Optional[int] = None,
            M: Optional[LinearOperator] = None,
            bck_options: Mapping[str, Any] = {},
            method: Union[str, Callable, None] = None,
            return_info: bool = False,
            **fwd_options) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return symeig(A, neig, "lowest", M, bck_options=bck_options,
                  method=method, return_info=return_info, **fwd_options)


def usymeig(A: LinearOperator, neig: Optional[int] = None,
            M: Optional[LinearOperator] = None,
            bck_options: Mapping[str, Any] = {},
            method: Union[str, Callable, None] = None,
            return_info: bool = False,
            **fwd_options) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return symeig(A, neig, "uppest", M, bck_options=bck_options,
                  method=method, return_info=return_info, **fwd_options)


def symeig(A: LinearOperator, neig: Optional[int] = None,
           mode: str = "lowest", M: Optional[LinearOperator] = None,
           bck_options: Mapping[str, Any] = {},
           method: Union[str, Callable, None] = None,
           return_info: bool = False,
           **fwd_options) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r"""Obtain ``neig`` lowest/uppermost eigenpairs of :math:`\mathbf{AX=MXE}`.

    Parity: reference symeig (symeig.py:31-144).  A (and M, if given) must
    be hermitian LinearOperators of shape ``(*B, q, q)``.  Returns
    ``(evals (*BAM, neig), evecs (*BAM, q, neig))``, M-orthonormal, with
    degeneracy-safe 1st/2nd-order gradients.  ``bck_options`` may carry
    ``degen_atol``/``degen_rtol`` (and solve options for the iterative path).

    With ``return_info=True``, returns ``(evals, evecs, info)`` where
    ``info`` is a jit-safe pytree ``{"converged", "iterations", "resid",
    "resid_rel"}`` (f32 scalars, zero gradients); in eager mode a
    :class:`ConvergenceWarning` is emitted on non-convergence.

    .. note:: **Default-routing residual grade.** With ``method=None`` on
       a TPU backend and an extreme-k ask (``neig*16 <= n``, ``n >= 128``,
       real, ``M is None``), the default routes to the iterative
       ``chebfsi`` targeting ``sqrt(eps)*||A||`` eigenvector residuals —
       this matches the dense route's eigenVALUE accuracy (value error is
       quadratic in the residual) but is a looser eigenVECTOR grade than
       ``exacteig``'s ``~eps*||A||`` (~3e-4 vs ~1e-7 relative in f32), and
       implicit-function gradients inherit the vector grade.  Pass
       ``min_eps`` for tighter residuals or ``method="exacteig"`` for the
       reference default; see ``_auto_symeig_method`` for the full
       contract.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import xitorch_tpu as xt
    >>> A = xt.LinearOperator.m(jnp.array([[2.0, 1.0], [1.0, 4.0]]),
    ...                         is_hermitian=True)
    >>> evals, evecs = xt.linalg.symeig(A, 1, "lowest")
    >>> resid = A.mm(evecs) - evecs * evals[..., None, :]
    >>> bool(jnp.max(jnp.abs(resid)) < 1e-6)
    True
    """
    if not A.is_hermitian:
        raise RuntimeError("The linear operator A must be Hermitian")
    if M is not None:
        if not M.is_hermitian:
            raise RuntimeError("The linear operator M must be Hermitian")
        if M.shape[-1] != A.shape[-1]:
            raise RuntimeError(
                "The shape of A & M must match (A: %s, M: %s)" % (A.shape, M.shape))
    mode = mode.lower()
    if mode == "uppermost":
        mode = "uppest"
    if mode not in ("lowest", "uppest"):
        raise RuntimeError("mode must be 'lowest' or 'uppest'/'uppermost'")
    if neig is None:
        neig = A.shape[-1]
    auto_routed = None
    if method is None:
        from xitorch_tpu._core.kron import KronOperator, KronSumOperator

        # Kronecker-structured hermitian operators: exact eigenpairs
        # from the factor decompositions — exacteig would materialize
        # the O((prod n_i)^2) dense matrix
        if M is None and A.is_hermitian and isinstance(
                A, (KronOperator, KronSumOperator)):
            method = "kron_exact"
        elif isinstance(A, (KronOperator, KronSumOperator)) or (
                M is not None
                and isinstance(M, (KronOperator, KronSumOperator))):
            # Kron operators outside the kron_exact guard (M-generalized
            # pencils) must NOT hit exacteig: materializing a Kronecker
            # structure is O(N^2) memory (a 3-factor 64^3 KronSum is
            # ~275 GB dense).  davidson stays matrix-free.  This is a
            # silent iterative route, so mark it auto-routed: the
            # always-compute-info + eager non-convergence warning
            # contract below then covers it.
            method = "davidson"
            auto_routed = "davidson"
            if "min_eps" not in fwd_options:
                # same scale-aware default as the dense generalized
                # route: a fixed absolute 1e-6 on a large-||A|| f32 Kron
                # pencil is unreachable and burns max_niter
                fwd_options["min_eps"] = None
        else:
            method = _auto_symeig_method(A, neig, M)
            auto_routed = method if method != "exacteig" else None
            if (auto_routed in ("chebfsi", "davidson")
                    and "min_eps" not in fwd_options):
                # scale-aware tolerance on the silent route (see chebfsi:
                # min_eps is absolute; a fixed 1e-6 would be unreachable
                # for large-||A|| f32 operators and burn max_niter)
                fwd_options["min_eps"] = None

    if is_debug_enabled():
        A.check()
        if M is not None:
            M.check()

    if method == "exacteig":
        return exacteig(A, neig, mode, M, return_info=return_info)
    if method == "kron_exact":
        # natively differentiable like exacteig (built on degen_eigh)
        return kron_exacteig(A, neig, mode, M, return_info=return_info)

    method_fcn = get_method("symeig", _SYMEIG_METHODS, method)
    # auto-routed iterative path: always compute the convergence info so
    # a silent routing decision can never silently return a bad iterate —
    # in eager mode non-convergence warns, and callers can always force
    # method="exacteig" (the reference default) back on
    want_info = return_info or auto_routed is not None
    out = _symeig_implicit(A, M, neig, mode, method_fcn, dict(fwd_options),
                           dict(bck_options), return_info=want_info)
    if want_info and not return_info:
        from xitorch_tpu.linalg.solve import _warn_nonconverged_eager
        _warn_nonconverged_eager("symeig", method, out[2])
        out = out[:2]
    if is_debug_enabled():
        # debug-only observer: checks the degeneracy requirement on the
        # incoming evecs cotangent and warns (reference symeig.py:335-347).
        # Uses custom_vjp, so under debug mode the iterative path is
        # first-order reverse only — debug trades capability for checks.
        evals_c, evecs_c = _attach_degen_requirement_check(
            out[0], out[1], dict(bck_options))
        out = (evals_c, evecs_c, *out[2:]) if return_info \
            else (evals_c, evecs_c)
    if return_info:
        from xitorch_tpu.linalg.solve import _warn_nonconverged_eager
        _warn_nonconverged_eager("symeig", method, out[2])
    return out


def _auto_symeig_method(A: LinearOperator, neig: int,
                        M: Optional[LinearOperator]) -> str:
    """Shape-aware default method selection for ``symeig`` — the TPU-first
    analog of the reference's own shape-based default heuristic for
    ``solve`` (/root/reference/xitorch/linalg/solve.py:96-104; for symeig
    the reference always defaults to exacteig).

    Routing rules (the documented contract):

    * default = ``"exacteig"`` (the reference default) everywhere, EXCEPT
    * ``"davidson"`` for GENERALIZED pencils (``M`` given) under the same
      extreme-k/real/TPU gates below — after the round-5 small_eigh
      subspace solve it is the measured generalized winner (3,941 vs
      1,010 decomps/s for the M-Cholesky dense route at config-2 shapes;
      the generalized chebfsi's M⁻¹A filter keeps it at 728), with the
      same scale-aware ``min_eps=None`` tolerance contract, and EXCEPT
    * ``"chebfsi"`` when ALL of these hold — the measured win region:
        - standard problem (``M is None``; the generalized chebfsi is
          measured SLOWER than davidson's subspace iteration),
        - extreme-k ask with k << n: ``neig * 16 <= n`` and ``n >= 128``
          (config-2: k=8, n=256 — chebfsi 10.1k decomps/s vs ~1.1k for
          the full dense route after the round-5 small_eigh RR fix; at
          k ~ n the dense route wins trivially),
        - real dtype (this image's TPU has no complex support; the
          complex dense route is the validated path),
        - TPU backend (on CPU, iterative loses to LAPACK: the reference's
          own davidson measures 12.9/s vs 179/s exacteig there, so CPU
          keeps the reference default).

    The routed path always computes convergence info and warns eagerly on
    non-convergence (best iterate is still returned).  The scale-aware
    ``min_eps=None`` default targets ``sqrt(eps)*||A||`` residuals, which
    matches the dense route's eigenVALUE accuracy (value error is
    quadratic in the residual); pass ``min_eps`` explicitly for tighter
    eigenvector residuals, or ``method="exacteig"`` to force the dense
    route.  Gradients keep the
    degeneracy-safe contract on either path (native ``degen_eigh`` JVP on
    the dense route, the degeneracy-projected implicit-function rule on
    the iterative route).

    The routing optimizes FORWARD throughput.  For gradient-dominated
    workloads the dense route's native JVP transpose is measured FASTER
    than the iterative route's adjoint shifted solves (config-2 chip
    rows: exacteig-route grad 1,202/s vs chebfsi-route 316/s,
    bench_backward.py) — prefer ``method="exacteig"`` when most calls
    are differentiated.
    """
    na = A.shape[-1]
    if (not jnp.issubdtype(A.dtype, jnp.complexfloating)
            and na >= 128 and neig * 16 <= na
            and jax.default_backend() == "tpu"
            and (M is None
                 or not jnp.issubdtype(M.dtype, jnp.complexfloating))):
        return "chebfsi" if M is None else "davidson"
    return "exacteig"


def _warn_degen_requirement(violated, evals, reqmax):
    if bool(violated):
        import warnings

        from xitorch_tpu.utils.exceptions import MathWarning

        warnings.warn(MathWarning(
            "Degeneracy appears but the loss function seems to depend "
            "strongly on the eigenvectors: the gradient might be incorrect "
            "(max requirement violation %.3e; it should be ~0).\n"
            "Eigenvalues:\n%s" % (float(reqmax), evals)))


def _attach_degen_requirement_check(evals, evecs, bck_options):
    """Identity on (evals, evecs) whose VJP inspects the evecs cotangent:
    if eigenvalues are (near-)degenerate, the derivative is well-defined
    only when D * (X^H G - (X^H G)^H) ~ 0 (reference symeig.py:335-347);
    otherwise a MathWarning is emitted at runtime via jax.debug.callback."""
    datol = bck_options.get("degen_atol", None)
    drtol = bck_options.get("degen_rtol", None)
    if datol is None:
        datol = float(jnp.finfo(evals.dtype).eps) ** 0.6
    if drtol is None:
        drtol = float(jnp.finfo(evals.dtype).eps) ** 0.4

    @jax.custom_vjp
    def observer(evals, evecs):
        return evals, evecs

    def fwd(evals, evecs):
        return (evals, evecs), (evals, evecs)

    def bwd(res, cot):
        evals, evecs = res
        _, gevecs = cot
        D = _check_degen(evals, datol, drtol)
        eye = jnp.eye(D.shape[-1], dtype=D.dtype)
        isdegen = jnp.any((D - eye) != 0)
        xtg = jnp.swapaxes(evecs, -2, -1).conj() @ gevecs
        req1 = D * (xtg - jnp.swapaxes(xtg, -2, -1).conj())
        reqtol = jnp.max(jnp.abs(xtg)) * evecs.shape[-2] \
            * jnp.finfo(evecs.dtype).eps
        reqmax = jnp.max(jnp.abs(req1))
        violated = isdegen & (reqmax > reqtol)
        jax.debug.callback(_warn_degen_requirement, violated, evals, reqmax)
        return cot

    observer.defvjp(fwd, bwd)
    return observer(evals, evecs)


def _check_degen(evals: jnp.ndarray, degen_atol: float, degen_rtol: float):
    """Degeneracy map D (*B, neig, neig): D_ij = 1 if λ_i, λ_j degenerate
    (reference _check_degen :404-414)."""
    evals_diff = jnp.abs(evals[..., None, :] - evals[..., :, None])
    degen_thrsh = degen_atol + degen_rtol * jnp.abs(evals)[..., :, None]
    return (evals_diff < degen_thrsh).astype(evals.dtype)


def _ortho(A: jnp.ndarray, B: jnp.ndarray, *, D: Optional[jnp.ndarray],
           M: Optional[LinearOperator], mright: bool) -> jnp.ndarray:
    """Orthogonalize columns of A against columns of B under the degeneracy
    map D (reference _ortho :416-448)."""
    if D is None:
        str1 = "...rc,...rc->...c"
        Bconj = B.conj()
        if M is None:
            return A - jnp.einsum(str1, A, Bconj)[..., None, :] * B
        elif mright:
            return A - jnp.einsum(str1, M.mm(A), Bconj)[..., None, :] * B
        else:
            return A - M.mm(jnp.einsum(str1, A, Bconj)[..., None, :] * B)
    else:
        BH = jnp.swapaxes(B, -2, -1).conj()
        if M is None:
            return A - B @ (D * (BH @ A))
        elif mright:
            return A - B @ (D * (BH @ M.mm(A)))
        else:
            return A - M.mm(B @ (D * (BH @ A)))


def _symeig_implicit(A: LinearOperator, M: Optional[LinearOperator],
                     neig: int, mode: str, method_fcn: Callable,
                     fwd_options: dict, bck_options: dict,
                     return_info: bool = False):
    degen_atol = bck_options.pop("degen_atol", None)
    degen_rtol = bck_options.pop("degen_rtol", None)
    bck_cfg = bck_options
    # Default the shifted backward solve to CG (matrix-free, indefinite
    # tolerated) unless the user chose a method.  The system
    # (A - lam_i M) dx = -P rhs is SINGULAR at the computed eigenvalue,
    # and the iterative forward's eigenpairs carry f32-grade error, so
    # the projected rhs retains a ~vector-grade component along the TRUE
    # near-null direction whose shifted eigenvalue is only the
    # eigenVALUE error (~1e-5 in f32).  A direct LU (the old dense
    # default, exactsolve) amplifies that component by its full 1/gap
    # (measured on a v5e: 9.5x||z|| null junk, grad rel err 0.94 on the
    # chebfsi route); over-iterated MINRES drifts the same way (its
    # residual objective is blind to null components — measured 0.28
    # null drift at rtol=1e-7).  CG's A-norm error minimization barely
    # excites the near-null direction at matched tolerances (measured
    # null component 0.000, grad rel err 1.6e-3 = the forward grade) —
    # early termination IS the correct regularization for
    # implicit-function gradients at an approximate solution.
    if "method" not in bck_cfg:
        bck_cfg = dict(bck_cfg)
        bck_cfg["method"] = "cg"
        bck_cfg["posdef"] = False
    has_m = M is not None

    @jax.custom_jvp
    def _eigsolve(A, M):
        if return_info:
            return method_fcn(A, neig, mode, M, return_info=True,
                              **fwd_options)
        evals, evecs = method_fcn(A, neig, mode, M, **fwd_options)
        return evals, evecs

    @_eigsolve.defjvp
    def _eigsolve_jvp(primals, tangents):
        A, M = primals
        dA, dM = tangents
        out = _eigsolve(A, M)
        evals, evecs = out[0], out[1]

        datol = jnp.finfo(evals.dtype).eps ** 0.6 if degen_atol is None else degen_atol
        drtol = jnp.finfo(evals.dtype).eps ** 0.4 if degen_rtol is None else degen_rtol
        D = _check_degen(evals, datol, drtol) if (datol > 0 or drtol > 0) else None

        # dA·X and dM·X via jvp of the operator application
        _, dAX = jax.jvp(lambda a: a.mm(evecs), (A,), (dA,))
        if has_m:
            _, dMX = jax.jvp(lambda m: m.mm(evecs), (M,), (dM,))
            MX = M.mm(evecs)
        else:
            dMX = jnp.zeros_like(dAX)
            MX = evecs

        W = dAX - dMX * evals[..., None, :]  # (*B, na, neig)
        # dλ_i = x_i^H W_i (real for hermitian pencils)
        devals = jnp.real(jnp.einsum("...rc,...rc->...c", evecs.conj(), W)
                          ).astype(evals.dtype)

        # rhs for the shifted solve: -(W - dλ M x); project out (degenerate)
        # eigvector components to keep the singular directions out
        rhs = W - MX * devals[..., None, :].astype(MX.dtype)
        rhs = _ortho(rhs, evecs, D=D, M=M, mright=False)

        if jnp.issubdtype(evecs.dtype, jnp.complexfloating):
            evals_offset = evals + 1e-14  # reference :360-363
        else:
            evals_offset = evals
        dX = solve(A, -rhs, evals_offset, M, bck_options=bck_cfg, **bck_cfg)
        # remove the per-column self component (arbitrary phase/scale) AND
        # every component along degenerate partners: the shifted system is
        # singular on the whole degenerate cluster, so the solve returns
        # amplified junk there (the ~eps projected residual divided by the
        # ~eps numerical gap — deterministic O(1) garbage, caught by the
        # degenerate parity cells vs live torch).  Projecting dX with the
        # D map is the exact transpose of the reference's reverse rule
        # (B = _ortho(grad_evecs, D=idx_degen) BEFORE its solve,
        # reference symeig.py:355-371), so reverse mode matches torch and
        # the dropped intra-cluster rotation is the documented convention.
        # D includes the diagonal, so for non-degenerate spectra this is
        # exactly the old self-component removal.
        dX = _ortho(dX, evecs, D=D, M=M, mright=True)
        if has_m:
            # M-normalization: x^H M x = 1 under perturbed M
            xdMx = jnp.einsum("...rc,...rc->...c", evecs.conj(), dMX)
            dX = dX - 0.5 * xdMx[..., None, :] * evecs

        if return_info:
            dinfo = jax.tree_util.tree_map(jnp.zeros_like, out[2])
            return out, (devals, dX, dinfo)
        return (evals, evecs), (devals, dX)

    return _eigsolve(A, M)


def svd(A: LinearOperator, k: Optional[int] = None,
        mode: str = "uppest", bck_options: Mapping[str, Any] = {},
        method: Union[str, Callable, None] = None,
        **fwd_options) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    r"""Partial singular value decomposition ``A = U S V^H``.

    Parity: reference svd (symeig.py:146-250).  Returns ``(u (*BA, m, k),
    s (*BA, k), vh (*BA, k, n))`` with degeneracy-safe gradients.

    Routing (documented contract; ``method`` forces a route):

    * default for dense input (real or complex) is the native
      ``degen_svd`` path — direct Hestenes one-sided Jacobi on the
      columns of A (the TPU Pallas kernel when available — complex via
      the packed-plane complex-pair kernel — XLA svd elsewhere), no Gram
      matrix, so singular values keep ~eps*kappa(A) error instead of the
      Gram path's ~eps*kappa(A)^2.  ``fwd_options``/``bck_options`` do
      not apply here (it is a direct decomposition, natively
      differentiable at any order; complex gradients follow the
      phase-gauge-invariant convention, see ``degen_svd``).
    * EXCEPT top-k asks with k << min(m, n) on TPU (``k*16 <= r``,
      ``r >= 128``, ``mode="uppest"``): these route through ``symeig``
      of the Gram (``A A^H`` or ``A^H A``, whichever is smaller), whose
      own shape-aware default picks the iterative chebfsi winner there
      (measured 5,366 vs 712 decomps/s at (64, 256, 256) k=8,
      BASELINE.md) with an eager non-convergence warning.  The Gram
      route squares kappa, which for the TOP singular values costs
      ~nothing (their relative error is ~resid/s_max).
    * Kron-structured operators or an explicit iterative ``method=``
      always use the Gram + symeig route, where
      ``fwd_options``/``bck_options`` apply (reference behavior).
    """
    if is_debug_enabled():
        A.check()
    m = A.shape[-2]
    n = A.shape[-1]
    if k is None:
        k = min(m, n)
    mode = mode.lower()
    if mode == "uppermost":
        mode = "uppest"
    if mode not in ("lowest", "uppest"):
        raise RuntimeError("mode must be 'lowest' or 'uppest'/'uppermost'")

    # native SVD path (no Gram matrix): for real input on the dense
    # exacteig route, degen_svd keeps singular-value error at
    # ~eps*kappa(A) instead of the Gram path's ~eps*kappa(A)^2 and runs
    # the Hestenes Jacobi kernel on TPU (ops/jacobi_eigh.jacobi_svd).
    # Kron-structured operators keep the Gram route (their symeig
    # dispatches to the O(sum n_i^3) kron_exact factorization instead of
    # materializing the dense matrix).
    from xitorch_tpu._core.kron import KronOperator, KronSumOperator
    r = min(m, n)
    # top-k with k << r on TPU: skip the full native decomposition and
    # fall through to the Gram route, whose symeig default routes to the
    # iterative chebfsi winner (see the routing contract above)
    topk_iterative = (method is None and mode == "uppest"
                      and k * 16 <= r and r >= 128
                      and jax.default_backend() == "tpu")
    if (method in (None, "exacteig") and not topk_iterative
            and not isinstance(A, (KronOperator, KronSumOperator))):
        from xitorch_tpu._impls.linalg.symeig import degen_svd
        u, s, v = degen_svd(A.fullmatrix())
        sl = slice(None, k) if mode == "lowest" else slice(-k, None)
        u, s, v = u[..., sl], s[..., sl], v[..., sl]
        return u, s, jnp.swapaxes(v, -2, -1).conj()

    if m < n:
        AAsym = A.matmul(A.H, is_hermitian=True)
    else:
        AAsym = A.H.matmul(A, is_hermitian=True)

    eivals, eivecs = symeig(AAsym, k, mode, bck_options=bck_options,
                            method=method, **fwd_options)
    eivals = jnp.clip(eivals, min=0.0)
    s = jnp.sqrt(eivals)  # (*BA, k)
    sdiv = jnp.clip(s, min=1e-12)[..., None, :]  # (*BA, 1, k)
    if m < n:
        u = eivecs
        v = A.rmm(u) / sdiv
    else:
        v = eivecs
        u = A.mm(v) / sdiv
    vh = jnp.swapaxes(v, -2, -1).conj()
    return u, s, vh


# docstring completion (parity: reference symeig.py:454-461)
from xitorch_tpu._docstr.api_docstr import get_methods_docstr  # noqa: E402

symeig.__doc__ = get_methods_docstr(symeig, _SYMEIG_METHODS, ignore_kwargs=["M"])
svd.__doc__ = get_methods_docstr(svd, _SYMEIG_METHODS)
