"""Differentiable linear solve ``AX = B`` / ``AX - MXE = B``.

API parity with /root/reference/xitorch/linalg/solve.py:13-116, but the
autograd adapter (solve_torchfcn :118-222) is replaced by
``lax.custom_linear_solve``:

* forward: the selected iterative kernel runs as a black box (gradients
  never flow through solver iterations);
* backward: JAX transposes the solve — the cotangent solve on ``A^H``
  (reference bwd :178-185) is our ``transpose_solve`` callback, and the
  parameter/E/M gradients (reference :188-219) fall out of differentiating
  the matvec closure, to arbitrary order (``gradgradcheck`` parity).
"""
from __future__ import annotations

import warnings
from typing import Any, Callable, Mapping, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from xitorch_tpu._core.linop import LinearOperator, MatrixLinearOperator
from xitorch_tpu._impls.linalg.solve import (
    _make_info, bicgstab, broyden1_solve, cg, cg_ir, exactsolve,
    get_batchdims, gmres, minres, scipy_gmres,
)
from xitorch_tpu.debug.modes import is_debug_enabled
from xitorch_tpu.utils.exceptions import ConvergenceWarning
from xitorch_tpu.utils.misc import get_method

__all__ = ["solve"]

def _fused_cg(A, B, E=None, M=None, rtol: float = 1e-6, atol: float = 1e-8,
              max_niter=None, **options):
    """Pallas VMEM-resident CG for explicit hermitian A (falls back to the
    XLA cg for matrix-free/complex/f64/too-large operators or E/M shifts)."""
    from xitorch_tpu.ops.fused_cg import fits_fused_cg, fused_cg_dense

    if (E is None and M is None and isinstance(A, MatrixLinearOperator)
            and A.is_hermitian
            and fits_fused_cg(A.shape[-1], B.shape[-1], A.dtype)
            and jax.default_backend() == "tpu"):
        return fused_cg_dense(A.fullmatrix(), B, rtol=rtol, atol=atol,
                              max_niter=max_niter)
    return cg(A, B, E, M, rtol=rtol, atol=atol, max_niter=max_niter, **options)


def _structured_cg(A, B, E=None, M=None, rtol: float = 1e-6,
                   atol: float = 1e-8, max_niter=None,
                   return_info: bool = False, **options):
    """Fused Pallas solve for :class:`TridiagLowRankOperator`: the whole
    CG state and operator data live in VMEM (ops/structured_cg.py), so
    per-iteration HBM traffic is zero.  Pure tridiagonal operators
    (V is None) get a *direct* Thomas solve instead of CG.  Per-column
    diagonal shifts E (M=None) keep the structure — ``A - e_j I`` just
    shifts d — so symeig's implicit-gradient shifted solves stay on the
    fused path.  Falls back to the XLA cg for any other operator/
    backend/dtype or for M-generalized shifts."""
    from xitorch_tpu._core.structured import (
        BandedLowRankOperator, TridiagLowRankOperator,
    )
    from xitorch_tpu.ops.structured_cg import (
        fits_structured_cg, structured_cg_pallas,
    )

    interpret = options.pop("interpret", False)
    on_tpu = interpret or jax.default_backend() == "tpu"
    if not (M is None and on_tpu
            and isinstance(A, (TridiagLowRankOperator, BandedLowRankOperator))
            and jnp.dtype(A.dtype) == jnp.dtype(jnp.float32)):
        return cg(A, B, E, M, rtol=rtol, atol=atol, max_niter=max_niter,
                  return_info=return_info, **options)

    if isinstance(A, TridiagLowRankOperator):
        cl, cu = A.full_couplings()
        bl = cl[..., None, :]
        bu = cu[..., None, :]
        offsets = (1,)
        pure_tridiag = A.V is None
    else:
        offsets = A.offsets
        if not offsets:  # diagonal-only: give it one zero band for layout
            # (checked BEFORE full_bands(), which cannot stack zero bands)
            bl = jnp.zeros((*A.shape[:-2], 1, A.shape[-1]), A.dtype)
            bu = bl
            offsets = (1,)
        else:
            bl, bu = A.full_bands()
        pure_tridiag = A.V is None and offsets == (1,)

    bT = jnp.swapaxes(B, -1, -2)  # (*B, ncols, n): columns into batch
    # per-column diagonal: columns are batch rows of bT, so E (*BE, ncols)
    # becomes a shift of d along that axis
    dcol = A.d[..., None, :]
    if E is not None:
        dcol = dcol - E[..., :, None]

    if pure_tridiag:
        from xitorch_tpu.ops.tridiag import tridiag_matvec, tridiag_solve_pallas
        xT = tridiag_solve_pallas(bl[..., 0, :][..., None, :], dcol,
                                  bu[..., 0, :][..., None, :], bT,
                                  interpret=interpret)
        x = jnp.swapaxes(xT, -1, -2)
        if return_info:
            # honest residual: the non-pivoting Thomas sweep silently
            # returns garbage on (near-)singular shifted systems (e.g. an
            # E at an eigenvalue) — a hardcoded success would blind
            # assert_converged on exactly the failure it exists to catch
            ax = tridiag_matvec(bl[..., 0, :][..., None, :], dcol,
                                bu[..., 0, :][..., None, :], xT)
            r = jnp.linalg.norm(ax - bT, axis=-1)
            bn = jnp.linalg.norm(bT, axis=-1)
            # deliberately FORWARD semantics (residual vs ||B||, floored
            # only at 100*eps*(||Ax||+||B||)) — NOT the ||A||*||x||
            # backward-error scale that kron_direct/exactsolve use: the
            # non-pivoting Thomas sweep is unstable off diagonal
            # dominance, and on a singular shifted system its huge-||x||
            # output can look backward-small while being forward garbage;
            # converged still follows the ``rel < 1.0`` rule (_make_info)
            eps_d = float(jnp.finfo(x.real.dtype).eps)
            scale = jnp.linalg.norm(ax, axis=-1) + bn
            stop = jnp.maximum(jnp.maximum(rtol * bn, atol),
                               100 * eps_d * scale)
            rel = jnp.max(r / stop)
            return x, _make_info(rel < 1.0, 1.0, jnp.max(r), rel)
        return x

    rank = A.V.shape[-1] if A.V is not None else 1
    if not fits_structured_cg(A.shape[-1], rank, A.dtype, nb=len(offsets)):
        return cg(A, B, E, M, rtol=rtol, atol=atol, max_niter=max_niter,
                  return_info=return_info, **options)
    V = A.V if A.V is not None \
        else jnp.zeros((*A.shape[:-2], A.shape[-1], 1), A.dtype)

    x, it, res = structured_cg_pallas(
        dcol, bl[..., None, :, :], bu[..., None, :, :],
        V[..., None, :, :], bT, offsets=offsets, rtol=rtol, atol=atol,
        max_niter=max_niter, interpret=interpret)
    x = jnp.swapaxes(x, -1, -2)
    if return_info:
        # measured residual of the returned iterate (the kernel's ``res``
        # is the CG *recurrence* estimate, which rounding lets drift) —
        # one extra XLA matvec, only on the return_info path
        ax = A.mm(x)
        if E is not None:
            ax = ax - x * E[..., None, :]
        rT = jnp.swapaxes(ax, -1, -2) - bT
        rc = jnp.linalg.norm(rT, axis=-1)
        bnorm = jnp.linalg.norm(bT, axis=-1)
        stop = jnp.maximum(rtol * bnorm, atol)
        rel = jnp.max(rc / stop)
        return x, _make_info(rel < 1.0, jnp.max(it), jnp.max(rc), rel)
    return x


def _kron_direct(A, B, E=None, M=None, return_info: bool = False,
                 refine: int = 1, **options):
    """Direct eigenbasis solve for hermitian Kronecker-structured
    operators (:class:`KronSumOperator` / :class:`KronOperator`): eigh
    the two small factors (the Pallas Jacobi kernel on TPU), transform B
    into the product eigenbasis, divide by the combined eigenvalues
    (sums for the Kronecker sum, products for the Kronecker product,
    minus the per-column shifts E), and transform back — the classic
    "fast Poisson" route, O(n^3) in the factor sizes instead of
    O((n1*n2)^3) dense.  M-generalized problems and non-hermitian
    factors fall back to cg."""
    from xitorch_tpu._core.kron import KronOperator, KronSumOperator

    if not (M is None and isinstance(A, (KronOperator, KronSumOperator))
            and A.is_hermitian):
        return cg(A, B, E, M, return_info=return_info, **options)

    comb, Vs = A.combined_eigendecomposition()

    ncols = B.shape[-1]
    N = A.shape[-1]
    denom = comb.reshape(*comb.shape[:-len(A.dims)], N, 1)
    if E is not None:
        denom = denom - E[..., None, :]
    # singular pencils (an E shift hitting an eigenvalue sum exactly)
    # must not emit Inf/NaN: floor the denominator at eps * spectral
    # scale (keeping x bounded by ~1/eps) and remember which entries
    # saturated — info reports converged=0 for them, since the residual
    # of an ~1/eps-sized x is numerically meaningless
    eps_c = float(jnp.finfo(comb.real.dtype).eps)
    # per-batch scale: a global max would inflate the floor (and the
    # backward-error stop below) for small-scale batch elements
    abs_flat = jnp.abs(comb).reshape(*comb.shape[:-len(A.dims)], N)
    anorm_b = jnp.max(abs_flat, axis=-1)  # (*batch,) spectral norm
    floor = eps_c * (anorm_b[..., None, None] + 1e-300)
    singular = jnp.abs(denom) < floor
    denom = jnp.where(singular, jnp.where(denom < 0, -floor, floor), denom)

    def eig_solve(rhs):
        # fold the rhs columns into the flattened vector (row-major:
        # they ride along as trailing "extra" in every axis transform)
        c = rhs.reshape(*rhs.shape[:-2], N * ncols)
        for i, V in enumerate(Vs):  # into the product eigenbasis
            VH = jnp.swapaxes(V, -2, -1).conj()
            c = A._apply_axis(c, VH, i, extra=ncols, hi=True)
        c = c.reshape(*c.shape[:-1], N, ncols) / denom
        c = c.reshape(*c.shape[:-2], N * ncols)
        for i, V in enumerate(Vs):  # and back
            c = A._apply_axis(c, V, i, extra=ncols, hi=True)
        return c.reshape(*c.shape[:-1], N, ncols)

    def mv_hi(x):
        # operator application at HIGHEST precision: the refinement
        # residual must be more accurate than the error it corrects
        # (the default matvec uses the fast bf16 MXU path on TPU)
        c = x.reshape(*x.shape[:-2], N * ncols)
        if isinstance(A, KronSumOperator):
            acc = None
            for i, m in enumerate(A.factors):
                t = A._apply_axis(c, m, i, extra=ncols, hi=True)
                acc = t if acc is None else acc + t
        else:
            acc = c
            for i, m in enumerate(A.factors):
                acc = A._apply_axis(acc, m, i, extra=ncols, hi=True)
        return acc.reshape(*x.shape[:-2], N, ncols)

    def residual(x):
        r = B - mv_hi(x)
        if E is not None:
            r = r + x * E[..., None, :]
        return r

    x = eig_solve(B)
    # iterative refinement: the factor eigh's are the accuracy bottleneck
    # (f32 eigenvector error ~eps/gap on clustered spectra); each pass
    # costs two transform sweeps + one (cheap) structured matvec and
    # multiplies the residual by ~eps*kappa
    for _ in range(max(int(refine), 0)):
        x = x + eig_solve(residual(x))
    if return_info:
        # honest residual (one extra HIGHEST-precision matvec): a
        # singular pencil — an E shift at an eigenvalue sum — must
        # surface as converged=0, not a hardcoded success
        r = jnp.linalg.norm(residual(x), axis=-2)
        bn = jnp.linalg.norm(B, axis=-2)
        # direct solve: converged follows the library-wide ``rel < 1.0``
        # rule (see _make_info) against the normwise backward-error floor
        # 100*eps*(||A||*||x|| + ||B||) of the working dtype (a direct
        # method has no iteration tolerance to compare against; ||A||*||x||
        # — not ||Ax|| — is the standard scale, which matters exactly on
        # the ill-conditioned systems where x has large null-ish modes)
        eps_d = float(jnp.finfo(x.real.dtype).eps)
        anorm = anorm_b[..., None]  # (*batch, 1): exact per-batch
        # spectral norm for Kron (max |combined eigenvalue|)
        if E is not None:  # per-column pencil norm ||A - e_j||
            anorm = anorm + jnp.abs(E)
        xn = jnp.linalg.norm(x, axis=-2)
        stop = jnp.maximum(100 * eps_d * (bn + anorm * xn),
                           jnp.asarray(1e-30, r.dtype))
        rel = jnp.max(r / stop)
        ok = (rel < 1.0) & jnp.logical_not(jnp.any(singular))
        info = {"converged": ok.astype(jnp.float32),
                "iterations": jnp.asarray(1.0 + refine, jnp.float32),
                "resid": jnp.max(r).astype(jnp.float32),
                "resid_rel": rel.astype(jnp.float32)}
        return x, info
    return x


_SOLVE_METHODS = {
    "cg": cg,
    "cg_ir": cg_ir,
    "fused_cg": _fused_cg,
    "structured_cg": _structured_cg,
    "kron_direct": _kron_direct,
    "minres": minres,
    "bicgstab": bicgstab,
    "gmres": gmres,
    "exactsolve": exactsolve,
    "custom_exactsolve": exactsolve,
    "scipy_gmres": scipy_gmres,
    "broyden1": broyden1_solve,
}

# methods whose impl supports the (x, info) return convention
_INFO_METHODS = {"cg", "cg_ir", "minres", "bicgstab", "gmres", "exactsolve",
                 "custom_exactsolve", "structured_cg", "kron_direct"}


def solve(A: LinearOperator, B: jnp.ndarray,
          E: Optional[jnp.ndarray] = None,
          M: Optional[LinearOperator] = None,
          bck_options: Mapping[str, Any] = {},
          method: Union[str, Callable, None] = None,
          return_info: bool = False,
          **fwd_options) -> jnp.ndarray:
    r"""Solve :math:`\mathbf{AX=B}` or :math:`\mathbf{AX-MXE=B}` (E diagonal,
    per column) for a (batched, matrix-free) LinearOperator.

    Arguments follow the reference API (solve.py:13-69): ``A (*BA, na, na)``,
    ``B (*BB, na, ncols)``, ``E (*BE, ncols)`` or None, ``M (*BM, na, na)``
    hermitian or None.  ``method`` is a registry string ("cg", "bicgstab",
    "gmres", "exactsolve", "broyden1", "scipy_gmres") or a custom callable;
    None picks exactsolve for explicit/small operators, else cg for
    hermitian and bicgstab otherwise.

    Returns ``X (*BABEM, na, ncols)``; first and second order gradients flow
    to B, E, and the parameters of A and M via implicit differentiation.

    With ``return_info=True``, returns ``(X, info)`` where ``info`` is a
    jit-safe pytree ``{"converged", "iterations", "resid", "resid_rel"}``
    (f32 scalars; gradients of info are zero).  One rule across every
    method: ``resid`` is the MEASURED residual norm of the returned
    iterate and ``converged = resid_rel < 1.0`` with
    ``resid_rel = resid / stop``, where ``stop = max(rtol*|B|, atol)``
    for iterative methods and the normwise backward-error floor
    ``100*eps*(|A|*|X| + |B|)`` for the stable direct methods
    (exactsolve, kron_direct — which additionally flags singular
    pencils); the non-pivoting tridiagonal Thomas path keeps the forward
    ``max(rtol*|B|, atol)`` scale (floored at ``100*eps*(|AX|+|B|)``) so
    singular-shift garbage is flagged.  In eager mode a
    :class:`ConvergenceWarning` is emitted when the solve did not converge
    (the reference warns from inside its solvers, e.g.
    _impls/linalg/solve.py:156-160).  The eager check costs one extra
    full-precision verification matvec + norms per call; wrap hot eager
    loops in ``jax.jit`` (where tracing skips the check, and the info
    struct / :func:`xitorch_tpu.utils.assert_converged` take over) to
    avoid it.

    Performance note: for cg/cg_ir, pass a **static** ``posdef`` bool
    whenever you know it.  ``posdef=None`` compiles a runtime
    power-iteration probe plus *both* the plain and normal-equation
    branches under ``lax.cond`` — roughly double the compile time and one
    probe per solve.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import xitorch_tpu as xt
    >>> A = xt.LinearOperator.m(jnp.array([[3.0, 1.0], [1.0, 2.0]]),
    ...                         is_hermitian=True)
    >>> B = jnp.array([[4.0], [3.0]])
    >>> X = xt.linalg.solve(A, B, method="cg")
    >>> bool(jnp.max(jnp.abs(A.mm(X) - B)) < 1e-6)
    True
    >>> X, info = xt.linalg.solve(A, B, return_info=True)
    >>> float(info["converged"])
    1.0
    """
    if A.shape[-1] != A.shape[-2]:
        raise RuntimeError("The linear operator A must have a square shape")
    if A.shape[-1] != B.shape[-2]:
        raise RuntimeError(
            "Mismatch shape of A & B (A: %s, B: %s)" % (A.shape, B.shape))
    if M is not None:
        if M.shape[-1] != M.shape[-2]:
            raise RuntimeError("The linear operator M must have a square shape")
        if M.shape[-1] != A.shape[-1]:
            raise RuntimeError(
                "The shape of A & M must match (A: %s, M: %s)" % (A.shape, M.shape))
        if not M.is_hermitian:
            raise RuntimeError("The linear operator M must be a Hermitian matrix")
    if E is not None and E.shape[-1] != B.shape[-1]:
        raise RuntimeError(
            "The last dimension of E & B must match (E: %s, B: %s)"
            % (E.shape, B.shape))
    if E is None and M is not None:
        warnings.warn("M is supplied but will be ignored because E is not supplied")

    if is_debug_enabled():
        A.check()
        if M is not None:
            M.check()

    if method is None:
        from xitorch_tpu._core.kron import KronOperator, KronSumOperator

        # reference heuristic (solve.py:96-104): exactsolve when the
        # operator(s) can materialize cheaply — keyed on the capability
        # flag, not the concrete type, so custom subclasses implementing
        # _fullmatrix get the dense path too.  Kronecker-structured
        # hermitian operators route to their factor-eigenbasis direct
        # solve first: materializing them is O((prod n_i)^2) memory.
        from xitorch_tpu._core.structured import (
            BandedLowRankOperator, TridiagLowRankOperator,
        )

        kron_like = isinstance(A, (KronOperator, KronSumOperator)) or (
            M is not None and isinstance(M, (KronOperator, KronSumOperator)))

        if (M is None and A.is_hermitian
                and isinstance(A, (KronOperator, KronSumOperator))):
            method = "kron_direct"
        elif kron_like:
            # Kron operators outside the kron_direct guard (M-generalized
            # or non-hermitian factors) must NOT hit the fullmatrix branch
            # below: materializing a Kronecker structure is O(N^2) memory
            # (a 3-factor 64^3 KronSum is ~275 GB dense).  Stay matrix-free.
            is_hermit = A.is_hermitian and (M is None or M.is_hermitian)
            method = ("cg" if E is None else "minres") if is_hermit \
                else "bicgstab"
        elif isinstance(A, (TridiagLowRankOperator, BandedLowRankOperator)):
            # structured operators implement _fullmatrix for testing, but
            # materializing them defeats their purpose (B=512, n=1024 is
            # ~2 GB dense); structured_cg falls back to matrix-free cg
            # off-TPU or for M-generalized shifts
            pure_tridiag = A.V is None and (
                isinstance(A, TridiagLowRankOperator)
                or A.offsets in ((), (1,)))
            if E is not None and not pure_tridiag:
                # symeig's implicit-gradient shifts sit inside the
                # spectrum, so A - eI is indefinite; the fused Pallas CG
                # kernel has no posdef probe or best-iterate tracking and
                # would silently return an inaccurate last iterate under
                # jit.  minres handles indefinite hermitian systems
                # directly (still matrix-free via _mv).  Pure tridiagonal
                # shifts keep the direct Thomas path, whose info reports
                # an honest measured residual.
                method = "minres"
            else:
                method = "structured_cg"
        elif A.is_fullmatrix_implemented and \
           (M is None or M.is_fullmatrix_implemented):
            method = "exactsolve"
        elif A.shape[-1] <= 5:
            method = "exactsolve"
        else:
            is_hermit = A.is_hermitian and (M is None or M.is_hermitian)
            if is_hermit:
                # E-shifted hermitian pencils (A - ME) — symeig's
                # implicit-gradient solves — are indefinite by
                # construction (the shifts sit inside the spectrum):
                # minres handles them directly, where cg would run the
                # posdef probe and fall back to the squared-conditioning
                # normal equations
                method = "cg" if E is None else "minres"
            else:
                method = "bicgstab"

    if method == "exactsolve":
        # dense path: differentiable natively (incl. higher order)
        if return_info:
            return exactsolve(A, B, E, M, return_info=True)
        return exactsolve(A, B, E, M)

    method_fcn = get_method("solve", _SOLVE_METHODS, method)
    bck_cfg = dict(bck_options)
    bck_method = bck_cfg.pop("method", method)
    bck_fcn = get_method("solve", _SOLVE_METHODS, bck_method)

    # broadcast B to the full output batch so matvec is shape-preserving
    batchdims = get_batchdims(A, B, E, M)
    nr, ncols = A.shape[-1], B.shape[-1]
    B2 = jnp.broadcast_to(B, (*batchdims, nr, ncols))

    iscomplex = jnp.issubdtype(B2.dtype, jnp.complexfloating) or \
        jnp.issubdtype(A.dtype, jnp.complexfloating)
    symmetric = A.is_hermitian and (M is None or M.is_hermitian) and not iscomplex

    if E is None:
        def matvec(x):
            return A.mm(x)
    else:
        def matvec(x):
            Mx = M.mm(x) if M is not None else x
            return A.mm(x) - Mx * E[..., None, :]

    def solve_fcn(_, b):
        return method_fcn(A, b, E, M, **fwd_options)

    def transpose_solve_fcn(_, b):
        # solve A^T x = b (non-conjugating transpose, JAX convention) via the
        # hermitian-adjoint solve: x = conj(solve(A^H, conj(b), E^*, M^H))
        AH = A.H
        MH = M.H if M is not None else None
        if iscomplex:
            z = bck_fcn(AH, b.conj(), E.conj() if E is not None else None,
                        MH, **bck_cfg)
            return z.conj()
        return bck_fcn(AH, b, E, MH, **bck_cfg)

    if return_info:
        if isinstance(method, str) and method not in _INFO_METHODS:
            raise RuntimeError(
                "return_info=True is not supported for method %r "
                "(supported: %s, or a custom callable returning (x, info))"
                % (method, sorted(_INFO_METHODS)))
        x, info = _solve_with_info(A, B2, E, M, method_fcn, fwd_options,
                                   bck_method, bck_cfg)
        _warn_nonconverged_eager("solve", method, info)
        return x, info

    x = lax.custom_linear_solve(matvec, B2, solve_fcn,
                                transpose_solve=transpose_solve_fcn,
                                symmetric=symmetric)
    # eager-mode convergence warning (reference solvers warn on
    # non-convergence, _impls/linalg/solve.py:156-160); one extra matvec,
    # skipped under jit/vmap/grad tracing where values are abstract
    if not isinstance(x, jax.core.Tracer):
        rtol = fwd_options.get("rtol", 1e-6)
        atol = fwd_options.get("atol", 1e-8)
        # verification matvec at full precision: the TPU default (bf16
        # multiplies) would measure ~1e-3 noise, not the solve
        with jax.default_matmul_precision("highest"):
            Ax = matvec(x)
        resid = jnp.linalg.norm(Ax - B2, axis=-2)
        stop = jnp.maximum(rtol * jnp.linalg.norm(B2, axis=-2), atol)
        if isinstance(method, str) and method in (
                "exactsolve", "custom_exactsolve", "kron_direct"):
            # direct methods have no iteration tolerance: their residual
            # floor is the backward-error bound ~eps*(|Ax| + |B|) of the
            # working dtype (e.g. f32 on a conditioned Laplacian), not
            # the iterative rtol
            eps_d = float(jnp.finfo(x.dtype).eps)
            scale = (jnp.linalg.norm(Ax, axis=-2)
                     + jnp.linalg.norm(B2, axis=-2))
            stop = jnp.maximum(stop, 100 * eps_d * scale)
        # broyden1/scipy bridges have their own tolerance semantics; use a
        # loose factor so the warning only fires on genuine failures
        if bool(jnp.any(resid > 10 * stop)):
            warnings.warn(ConvergenceWarning(
                "solve (method=%s) did not converge: max residual %.3e "
                "(tolerance %.3e); the best iterate is returned"
                % (method, float(jnp.max(resid)), float(jnp.max(stop)))))
    return x


def _warn_nonconverged_eager(what: str, method, info) -> None:
    conv = info.get("converged", None)
    if conv is None or isinstance(conv, jax.core.Tracer):
        return
    if float(conv) < 1.0:
        warnings.warn(ConvergenceWarning(
            "%s (method=%s) did not converge after %d iterations "
            "(final residual %.3e, %.1fx the tolerance); the best iterate "
            "is returned" % (what, method, int(info["iterations"]),
                             float(info["resid"]), float(info["resid_rel"]))))


def _solve_with_info(A, B2, E, M, method_fcn, fwd_options, bck_method,
                     bck_cfg):
    """Differentiable (solution, info) solve: the primal runs the impl once
    (which reports its convergence info); the tangent rule solves the
    linearized system ``A dX - M dX E = dB - dA X + dM X E + M X dE`` with
    the (re-differentiable) public solve — the same linear-in-tangents +
    custom_linear_solve structure used everywhere else, so reverse mode and
    second order come from transposition.  Info tangents are zero."""
    has_e = E is not None
    has_m = M is not None

    @jax.custom_jvp
    def run(A, B, E, M):
        return method_fcn(A, B, E, M, return_info=True, **fwd_options)

    @run.defjvp
    def run_jvp(primals, tangents):
        A, B, E, M = primals
        dA, dB, dE, dM = tangents
        x, info = run(A, B, E, M)
        _, dAX = jax.jvp(lambda a: a.mm(x), (A,), (dA,))
        rhs = dB - dAX
        if has_e:
            MX = M.mm(x) if has_m else x
            if has_m:
                _, dMX = jax.jvp(lambda m: m.mm(x), (M,), (dM,))
                rhs = rhs + dMX * E[..., None, :]
            rhs = rhs + MX * dE[..., None, :]
        dx = solve(A, rhs, E, M, bck_options=bck_cfg, method=bck_method,
                   **bck_cfg)
        dinfo = jax.tree_util.tree_map(jnp.zeros_like, info)
        return (x, info), (dx, dinfo)

    return run(A, B2, E, M)


# docstring completion (parity: reference solve.py:233-243)
from xitorch_tpu._docstr.api_docstr import get_methods_docstr  # noqa: E402

solve.__doc__ = get_methods_docstr(solve, _SOLVE_METHODS, ignore_kwargs=["E", "M"])
