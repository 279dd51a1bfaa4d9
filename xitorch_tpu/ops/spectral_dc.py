"""MXU spectral divide-and-conquer preconditioner for the Jacobi eigh kernel.

Motivation: the one-sided Jacobi kernel (``ops/jacobi_eigh.py``) is
VPU-bound and spends ~9 sweeps on a random dense symmetric matrix; the
sweeps are the entire cost, and the MXU (two orders of magnitude more
flops) idles while they run.  This module burns MXU flops to shrink the
VPU work: it computes an orthonormal basis ``Q`` such that ``Q^T A Q``
is nearly block-diagonal with small, roughly eigenvalue-sorted blocks.
Warm-started on ``G0 = Q^T (A + sigma I)``, the Jacobi kernel converges
in ~2-3 sweeps instead of ~9.  The preconditioner only needs to be
*roughly* right: the Jacobi finisher is the accuracy-bearing stage and
converges unconditionally from any input, so soft projectors, rank
mis-counts and leaked couplings merely cost finisher sweeps.

Hardware shape (measured, v5e): at (64, 256, 256) f32 every XLA-level
batched op is HBM-bound — gemm 17 us, cholesky 56 us, triangular_solve
38 us per matrix — while one VPU Jacobi sweep is ~140 us/matrix.  An
XLA-level preconditioner therefore costs more than the sweeps it saves;
the only viable home is a VMEM-resident Pallas kernel, where a 256^3
MXU matmul costs ~0.2 us.  That dictates the algorithm: **matmuls only**
— no Cholesky, no triangular solve, no sort, no pivoting:

* sign(X) and polar orthonormalization both use the quintic
  Newton-Schulz schedule x <- a x + b x^3 + c x^5 with
  (a, b, c) = (3.4445, -4.7750, 2.0315) (the Muon/polar-express
  coefficients; public technique) followed by cubic NS polish steps.
  On [0, 1] the iterate stays bounded by 1.21 and six quintic + three
  cubic steps map every eigenvalue/singular value in [1e-3, 1] to
  1 +- 1e-3; inputs are pre-scaled by a segmented row-1-norm bound so
  the spectrum starts strictly inside [0, 1].
* per-segment medians / ranks / sizes use comparison matrices and
  masked row reductions (O(n^2) VPU work, no sort).
* recursion over "levels" splits every segment in two around the
  median of its diagonal; segment membership, split ranks and shifts
  are traced *values* (masks), never shapes, so one jit covers a batch
  with per-matrix split topology.

This file holds the XLA reference implementation (runs anywhere, used
by the CPU tests and as the semantic spec); the Pallas port used on TPU
(``_dc_kernel`` / ``_dc_level_kernel``) lives in ``ops/dc_kernel.py``.
The level loop:

  1. ``sigma_s`` = per-segment median of ``diag(T)`` (after one level
     the diagonal approximates eigenvalues, so splits self-balance).
  2. ``E ~ sign(T - Sigma)`` via quintic NS on the segment-scaled
     matrix; ``P = (I - E)/2`` soft-projects onto below-median
     subspaces.
  3. Slot assignment: the first ``r_s = round(trace_s P)`` positions of
     each segment take columns ``P omega_j``, the rest
     ``(I - P) omega_j`` (omega = fixed random mixer, segment-masked;
     cross-group Grams are ~``P(I-P) ~ 0``).  Quintic-NS polar
     orthonormalizes the result into ``Q_level``.
  4. ``T <- Q^T T Q`` masked back to block-diagonal (legitimate: the
     finisher re-derives everything from the original ``A``),
     ``Q_tot <- Q_tot Q``, segment ids split.

Reference scope: performance-only stage under the exact dense
decomposition semantics of /root/reference/xitorch/_impls/linalg/
symeig.py:11-44 (exacteig); no reference analog exists.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["spectral_sort_basis", "dc_precondition"]

# quintic Newton-Schulz coefficients (Muon/polar-express; public), used
# for both msign and polar orthonormalization.  8 quintic + 3 cubic steps
# map [8e-5, 1] -> 1 +- 1e-3 with intermediate values bounded by 1.21.
# The ramp length sets the sign-transition halfwidth (the band of
# eigenvalues around the split that stay soft and leak cross-block
# coupling): 6 steps left it at ~1e-3 of the scaled bound — comparable
# to the median eigenvalue SPACING at n=256, so most matrices had one
# boundary eigenvalue smear into a "bad slot" coupled to ~100 others at
# cos^2 ~ 1e-3 (measured; the dominant warm-sweep driver).  Two extra
# quintic steps shrink the width 3.44x each (+6 matmuls/level, ~8% DC
# cost) and drop the worst-case warm-start max cos^2 to ~1e-4.
_QUINTIC = (3.4445, -4.7750, 2.0315)
_N_QUINTIC = 8
# rank-safety probe blend for the slot split (see comment at the Y
# construction); shared by the single-shot Pallas kernel in
# dc_kernel.py.  Measured (CPU f32, 4 spectrum families at n=256): the
# blend floors the warm-start coupling at cos ~ beta, so beta = 0.02
# cost ~2 finisher sweeps; 0.002 keeps the rank rescue (sigma_min ~
# beta/scale ~ 4e-5 is inside the 10-step quintic polar basin) at a
# coupling floor below the structural leak.  The per-level kernel keeps
# its own stronger blend (dc_kernel._RANK_SAFE_BETA_LEAN): its
# cubic-only sign is softer and its n=704/768 range is where
# rank-deficiency was actually observed.
_RANK_SAFE_BETA = 0.002
_N_CUBIC = 3


def _msign(X, blockmask, n_quintic=_N_QUINTIC, n_cubic=_N_CUBIC):
    """sign(X) for symmetric X with spectrum in [-1, 1], matmuls only.
    Odd polynomial iterations act directly on eigenvalues; ``blockmask``
    re-zeroes cross-segment entries each step (they are exactly zero in
    exact arithmetic; re-masking stops bf16 dust from coupling
    segments)."""
    a, b, c = _QUINTIC
    for _ in range(n_quintic):
        X2 = jnp.matmul(X, X)
        X4 = jnp.matmul(X2, X2)
        X = jnp.matmul(X, a * jnp.eye(X.shape[-1], dtype=X.dtype)
                       + b * X2 + c * X4)
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2)) * blockmask
    for _ in range(n_cubic):
        X2 = jnp.matmul(X, X)
        X = 1.5 * X - 0.5 * jnp.matmul(X, X2)
        X = 0.5 * (X + jnp.swapaxes(X, -1, -2)) * blockmask
    return X


def _polar_orth(Y, n_quintic=10, n_cubic=5, hi_last=True):
    """Orthogonal polar factor of Y (square, sigma <= 1 after the
    caller's scaling), matmuls only: quintic ramp + cubic polish.  The
    final cubic steps run the Gram at HIGHEST precision so the returned
    Q is orthonormal to f32 accuracy, not bf16."""
    a, b, c = _QUINTIC
    eye = jnp.eye(Y.shape[-1], dtype=Y.dtype)
    Q = Y
    for _ in range(n_quintic):
        G = jnp.matmul(jnp.swapaxes(Q, -1, -2), Q)
        G2 = jnp.matmul(G, G)
        Q = jnp.matmul(Q, a * eye + b * G + c * G2)
    prec = lax.Precision.HIGHEST if hi_last else None
    for _ in range(n_cubic):
        G = jnp.matmul(jnp.swapaxes(Q, -1, -2), Q, precision=prec)
        Q = 1.5 * Q - 0.5 * jnp.matmul(Q, G, precision=prec)
    return Q


def _seg_reduce(x, seg_eq):
    """Per-position segment sum of x: (B, n) -> (B, n) via the (B, n, n)
    membership mask (matmul-free: masked row reduction)."""
    return jnp.sum(seg_eq * x[:, None, :], axis=-1)


def _seg_median(d, seg_eq, sizes):
    """Per-position median of d over its segment via comparison-matrix
    ranking (no sort): rank_i = #{j in seg(i): (d_j, j) < (d_i, i)};
    the median is the value whose rank equals the middle target."""
    lt = (d[:, None, :] < d[:, :, None])
    iot = jnp.arange(d.shape[-1])
    tie = (d[:, None, :] == d[:, :, None]) & (iot[None, None, :]
                                              < iot[None, :, None])
    rank = jnp.sum(seg_eq * (lt | tie), axis=-1)           # (B, n)
    lo_t = (sizes - 1) // 2
    hi_t = sizes // 2
    # value with rank == target, summed over the segment (exactly one hit)
    is_lo = seg_eq * (rank[:, None, :] == lo_t[:, :, None])
    is_hi = seg_eq * (rank[:, None, :] == hi_t[:, :, None])
    lo = jnp.sum(is_lo * d[:, None, :], axis=-1)
    hi = jnp.sum(is_hi * d[:, None, :], axis=-1)
    return 0.5 * (lo + hi)


def _dc_level(T, Qtot, seg, om, min_seg, dt):
    """One divide level on (B, n, n) state; returns updated (T, Qtot,
    seg)."""
    B, n, _ = T.shape
    eye = jnp.eye(n, dtype=dt)
    iot = jnp.arange(n)
    seg_eq_b = (seg[:, :, None] == seg[:, None, :])
    seg_eq = seg_eq_b.astype(dt)
    starts = jnp.sum((seg[:, None, :] < seg[:, :, None]).astype(jnp.int32),
                     axis=-1)
    sizes = jnp.sum(seg_eq, axis=-1).astype(jnp.int32)
    frozen = sizes <= min_seg
    live = (~(frozen[:, :, None] | frozen[:, None, :])).astype(dt)

    d = jnp.diagonal(T, axis1=-2, axis2=-1)
    sigma = _seg_median(d, seg_eq, sizes)
    C = (T - sigma[:, :, None] * eye) * seg_eq
    # segmented row-1-norm bound on the block spectral radius; strict
    # pre-scaling into [0, 1] (the quintic diverges above ~1.2)
    row1 = jnp.sum(jnp.abs(C), axis=-1)
    bound = jnp.max(jnp.where(seg_eq_b, row1[:, None, :], 0.0), axis=-1)
    X = C / (1.01 * bound[:, :, None] + jnp.asarray(1e-30, dt))

    E = _msign(X, seg_eq * live)
    P = 0.5 * (eye * seg_eq - E) * live

    pdiag = jnp.diagonal(P, axis1=-2, axis2=-1)
    r = jnp.round(_seg_reduce(pdiag, seg_eq)).astype(jnp.int32)
    r = jnp.clip(r, 0, sizes)
    local = iot[None, :] - starts
    low = (local < r) & ~frozen

    omb = jnp.where(frozen[:, :, None] | frozen[:, None, :],
                    eye, om[None]) * seg_eq
    POm = jnp.matmul(P, omb)
    # rank-safety blend: when a soft projector's trace rounds to the
    # wrong rank, the hard slot split leaves more low (or high) columns
    # than range(P) (or its complement) has dimensions — the block goes
    # rank-deficient and the polar ramp cannot restore orthogonality
    # (null directions stay null), silently breaking the G-invariant.
    # Mixing beta of the raw probe back in makes Y full-rank almost
    # surely at an O(beta) subspace-alignment cost the Jacobi finisher
    # sweeps away (quadratically: beta couplings -> beta^2 after one
    # sweep).  beta/scale ~ 4e-5 stays inside the quintic polar basin
    # (sigma grows ~3.4x/step over 10 steps, covering ~1e-5).
    Y = ((1.0 - _RANK_SAFE_BETA)
         * jnp.where(low[:, None, :], POm, omb - POm)
         + _RANK_SAFE_BETA * omb)
    # scale into sigma <= 1 for the polar ramp: column-normalize, then a
    # segmented Schur bound ||Y_s||_2 <= sqrt(||Y_s||_1 ||Y_s||_inf)
    # (much tighter than sqrt(block size): random normalized blocks sit
    # at ~2-3, so the ramp does not waste iterations regrowing a
    # needlessly squashed spectrum).  The polar ramp itself runs 10
    # quintic steps: square random blocks have a heavy small-sigma_min
    # tail (~1e-4..1e-5 across thousands of blocks) and the quintic
    # grows sigma by ~3.4x/step, so 10 steps cover the tail where 6 left
    # O(1) non-orthogonality.
    coln = jnp.sqrt(jnp.sum(Y * Y, axis=-2, keepdims=True))
    Y = Y / (coln + jnp.asarray(1e-20, dt))
    rsum = jnp.sum(jnp.abs(Y), axis=-1)                 # (B, n) row 1-norms
    csum = jnp.sum(jnp.abs(Y), axis=-2)                 # (B, n) col 1-norms
    rmax = jnp.max(jnp.where(seg_eq_b, rsum[:, None, :], 0.0), axis=-1)
    cmax = jnp.max(jnp.where(seg_eq_b, csum[:, None, :], 0.0), axis=-1)
    Y = Y / (1.01 * jnp.sqrt(rmax * cmax)[:, :, None]
             + jnp.asarray(1e-30, dt))
    Q = _polar_orth(Y)

    TQ = jnp.matmul(T, Q, precision=lax.Precision.HIGHEST)
    T = jnp.matmul(jnp.swapaxes(Q, -1, -2), TQ,
                   precision=lax.Precision.HIGHEST)
    T = 0.5 * (T + jnp.swapaxes(T, -1, -2)) * seg_eq
    Qtot = jnp.matmul(Qtot, Q, precision=lax.Precision.HIGHEST)
    seg = seg * 2 + jnp.where(low | frozen, 0, 1).astype(jnp.int32)
    return T, Qtot, seg


@partial(jax.jit, static_argnames=("levels", "min_seg"))
def spectral_sort_basis(A: jnp.ndarray, *, levels: int = 5,
                        min_seg: int = 4) -> jnp.ndarray:
    """Orthonormal ``Q`` (B, n, n) with ``Q^T A Q`` near block-diagonal
    in ~``n / 2**levels``-sized, eigenvalue-sorted segments.

    XLA reference implementation (slow on TPU — HBM-bound; the Pallas
    port is the production path).  ``A``: (B, n, n) real symmetric.
    """
    B, n, _ = A.shape
    dt = A.dtype
    om = jax.random.normal(jax.random.PRNGKey(1803), (n, n), dt)
    T = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    Qtot = jnp.broadcast_to(jnp.eye(n, dtype=dt), (B, n, n))
    seg = jnp.zeros((B, n), jnp.int32)
    for _ in range(levels):
        T, Qtot, seg = _dc_level(T, Qtot, seg, om, min_seg, dt)
    return Qtot


def dc_precondition(a_shift: jnp.ndarray, *, levels: int = 5,
                    min_seg: int = 4) -> jnp.ndarray:
    """``G0 = Q^T a_shift`` with Q from the spectral sort — the
    warm-start panel for the one-sided Jacobi kernel (its rows are
    ``q_i^T A_shift``; the kernel's G-only invariant is preserved
    because G0 = (Q R_jac)^T A_shift at every later stage).

    XLA composition, runs anywhere — the production TPU path is
    ``ops.dc_kernel.dc_precondition_tpu`` (the fused Pallas port), which
    ``jacobi_eigh`` dispatches directly.
    """
    Q = spectral_sort_basis(a_shift, levels=levels, min_seg=min_seg)
    return jnp.matmul(jnp.swapaxes(Q, -1, -2), a_shift,
                      precision=lax.Precision.HIGHEST)
