"""Pallas TPU kernel: batched one-sided Jacobi symmetric eigendecomposition.

Motivation (BASELINE.md config 2): the dense ``exacteig`` path is bound by
XLA's TPU ``eigh`` on (64, 256, 256) — ~116 ms per batch, ~200x off the
chip's speed of light.  This kernel keeps each matrix VMEM-resident and
runs the classic *one-sided* Jacobi iteration, whose inner loop is pure
(n/2, n) VPU row arithmetic with no lane permutes and no host/HBM traffic:

* Layout: ``G^T`` is stored rows-as-sublanes, so a "column rotation" of
  the implicit G = A·V is a *row pair* rotation here.
* **No V panel** (the round-2b kernel carried ``[G^T | V^T]``): for the
  Gershgorin-shifted PSD input, G's columns at convergence ARE the scaled
  eigenvectors — G = A·V with orthogonal columns forces G = Q·diag(lam')
  up to a rotation inside degenerate eigenspaces, so ``v_i = g_i/|g_i|``
  and ``lam'_i = |g_i|``.  Dropping V halves the rotation arithmetic.
  The cost: eigenvector noise is ~eps*sigma*sqrt(#rotations) *absolute*,
  so the direction error of column i scales as eps*sqrt(R)*sigma/lam'_i;
  the shift margin (sigma >= -lambda_min + 0.01*frob) floors lam' at 1%
  of ||A||_F, bounding the worst case at ~1e-3 relative in f32 — and the
  worst case (lambda_min AT the Gershgorin bound) only occurs for
  near-diagonal matrices, where the iteration converges in O(1) sweeps
  and the noise never accumulates.  Measured quality after the polish is
  unchanged vs the V-carrying kernel (orth ~2e-7, residual ~2e-5).
* **Carried column norms**: |g_i|^2 rides along with each row through the
  tournament as a (h, 1) sidecar, updated analytically after each
  rotation (|c g_p - s g_q|^2 = c^2 a - 2csg + s^2 b) and refreshed by a
  full reduction once per sweep to kill fp drift.  Each round then needs
  ONE n-wide reduction (gamma = <g_p, g_q>) instead of three — the lane
  reductions were ~half the round cost.
* Pairing: Brent–Luk round-robin tournament.  The active pairs are always
  (row i of the top half, row i of the bottom half), and between rounds a
  fixed sublane shuffle (two static-slice concatenates per plane)
  rotates every player except player 0 — after n-1 rounds all n(n-1)/2
  pairs have met exactly once and the ordering returns to the start.
* Sign ambiguity: one-sided Jacobi implicitly diagonalizes A^2, which
  cannot distinguish +-lambda pairs.  We pre-shift A by sigma >=
  -lambda_min (one-sided Gershgorin) + 1% margin, so A + sigma*I is PSD
  with eigenvalues in [0.01*frob, sigma + lam_max]; eigenvectors are
  unchanged and eigenvalues shift back exactly.  On PSD matrices
  one-sided Jacobi is famously *relative-accuracy*; the only loss is the
  ~eps*sigma cancellation in lambda - sigma, the same order as eigh's
  backward error (and the Rayleigh-quotient polish recomputes lambda on
  the unshifted input anyway).
* Multiple matrices per grid program (``mats_per_program``): rotations
  of different matrices are independent, so stacking them grows the VPU
  op shapes and amortizes the sweep/round loop bookkeeping.
* Complex hermitian input is packed as two real planes ``[Re G^T|Im G^T]``
  (n, 2n); the pair rotation first aligns the phase of g_q with
  exp(-i*arg(gamma)) (an elementwise plane rotation), then applies the
  same real Jacobi rotation to both planes.  Column phases are arbitrary
  eigenvector phases and need no unwinding.
* Convergence: quadratic; after each sweep an MXU Gram check (G G^T, ~2
  orders cheaper than a VPU sweep) measures the true max_pairs
  cos^2(g_p, g_q) of the post-sweep state and the sweep while_loop exits
  once it drops below ``tol2``.  The old per-round running max certified
  only the *previous* sweep's output (a sweep that found nothing to
  rotate), so every matrix stack paid one full ~12 ms "observation"
  sweep after converging; the ~0.1 ms Gram gauge exits on the true
  state the moment it is reached.  (A more aggressive exit at cos ~
  sqrt(tol) with an iterative first-order MXU polish was prototyped and
  rejected: on Wishart-like spectra the leftover mixing concentrates in
  wide mid-gap eigenvalue clusters whose couplings sit beyond any fixed
  rotation stride, and clipped/damped corrections stall at ~1e-3
  eigenvalue error — 40x the quality gate.)

Measured (v5e single chip, f32, same-session back-to-back): B=64 n=256
SPD 790 decomps/s with the Gram-gauge exit vs 731/s for the lagged
running-max exit and 533/s for XLA's eigh (1.5x), B=8 n=700 17.3/s vs
7.9/s XLA (2.2x), quality after the MXU polish better than XLA's f32
eigh (orth 2.4e-7, eigenpair residual ~2e-5, lam err 5.7e-6 at n=256).
Round-4 HEAD numbers for the full default path (DC warm start +
`_rot_correct` + guard): 1,083.4 decomps/s warm vs 868.5 cold at B=64
n=256 (deflate_e2e_probe.py 2026-08-20); the opt-in `deflate=True`
pipeline (exact first-power T-block leaf solves) measures 907.6/s at
equal quality — see benchmarks/FINISHER_NOTES.md "Round-4 closure" for
why the finisher's interference-limited ~2.4x/sweep decay caps every
warm-start family at ~5 sweeps.
The flat one-sided iteration is VPU-bound; blocked/MXU variants were
analyzed and rejected (the (2b,2b)-Gram inner problem still costs
~1.2*b/n of the flat VPU work plus lane-permute overhead — no win at
n<=1024 on 128-lane vregs).

Reference spec: exact dense decomposition semantics of
/root/reference/xitorch/_impls/linalg/symeig.py:11-44 (exacteig) — same
(ascending eigenvalues, column eigenvectors) contract as jnp.linalg.eigh.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["jacobi_eigh", "jacobi_svd", "use_jacobi_for",
           "use_jacobi_svd_for"]

# global switch: xitorch_tpu._impls.linalg.symeig.degen_eigh dispatches the
# dense decomposition here when `use_jacobi_for` approves (TPU, f32 real
# n <= 848 — the VMEM-budget cap; c64 hermitian n <= 512 — the
# hardware-probed complex window under the raised scoped-VMEM limit)
ENABLED = True


_UNROLL = 6  # tournament rounds fused per fori_loop iteration
# (measured on v5e, B=64 n=256: 1 -> 706.5, 3 -> 736.3, 6 -> 749.0 decomps/s
# with the old kernel; the same plateau holds for the norm-carrying one)

_M_CAP = 8  # max matrices stacked per grid program
_VMEM_BUDGET = 14 * 1024 * 1024  # of the ~16 MB scoped VMEM

# Complex-pair calls raise the scoped-VMEM limit instead of shrinking the
# window: the complex round's Re/Im quarter temporaries defeat Mosaic's
# buffer reuse, and the measured scoped allocation at m=1 is roughly
# n-independent (16.2-22.0 MB across n in [288, 512] under the 16 MiB
# default cap; n <= 256 fits even that).  The allocator also EXPANDS
# into whatever cap it is given (n=512 wanted 18.59 MB under 16 MiB,
# 33.04 under 30 MiB, fits at 40 MiB — hardware probes 2026-08-20), so
# the shipped cap is the probed fit-everything value, well inside the
# v5e's 128 MiB VMEM.
_CX_VMEM_LIMIT = 40 * 1024 * 1024
_CX_NMAX = 512  # hardware-probed complex window cap (see use_jacobi_for)

# Runtime guard on the DC warm start (see _guard_warm_start): relative
# ||G0^T G0 - A_shift^2||_F threshold above which a matrix falls back to
# the cold sweep.  Healthy panels measure ~eps*sqrt(n) here (HIGHEST
# matmul noise, ~2e-6 at n=768, measured 1.2e-6 at n=256 on a v5e); the
# rank-deficiency failure mode this guards against measured 1e-5..1e-3.
_GUARD_RTOL = 5e-6

# Auto window (lo, hi) for the DC-deflated path (None = opt-in only via
# deflate=True).  Set from on-chip measurement: the deflated pipeline
# must beat BOTH the cold sweep and the DC warm start on throughput at
# matched quality before it becomes a default.
_DEFLATE_WIN: Optional[Tuple[int, int]] = None


def _guard_warm_start(a_shift: jnp.ndarray, g0: jnp.ndarray,
                      rtol: float = _GUARD_RTOL) -> jnp.ndarray:
    """Per-matrix orthogonality guard for the DC preconditioner output.

    The sweep kernel's correctness rests on the G-invariant: its input
    panel must be ``R^T A_shift`` for an *orthogonal* R (then columns of
    G at convergence are scaled eigenvectors).  A healthy DC panel is
    ``Q^T A_shift`` with Q orthogonal to f32, so ``G0^T G0 == A_shift^2``
    exactly; a rank-deficient Q (the soft-projector failure mode — a
    wrongly-rounded slot split the polar ramp cannot repair) breaks that
    identity by 1e-5..1e-3 against the ~eps*sqrt(n) healthy floor.  Any
    matrix above ``rtol`` falls back to the cold start ``A_shift`` itself
    (R = I): the DC cost is already sunk, but correctness never depends
    on the preconditioner.  Cost: 2 batched (n, n) matmuls — ~3% of the
    ~70 the DC itself runs.
    """
    hi = jax.lax.Precision.HIGHEST
    gtg = jnp.matmul(jnp.swapaxes(g0, -2, -1), g0, precision=hi)
    a2 = jnp.matmul(a_shift, a_shift, precision=hi)
    num = jnp.sqrt(jnp.sum((gtg - a2) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(a2 * a2, axis=(-2, -1)))
    # negated <= so a NaN-poisoned panel (num = NaN compares False both
    # ways) is FLAGGED and falls back to the cold start instead of
    # sailing through to the kernel
    bad = jnp.logical_not(num <= rtol * den)
    return jnp.where(bad[:, None, None], a_shift, g0), bad


_ROT_EMAX = 0.1  # |E_ij| clip for the first-order rotational correction


def _rot_correct(g0: jnp.ndarray, passes: int = 2,
                 emax: float = _ROT_EMAX) -> jnp.ndarray:
    """Gap-clipped first-order rotational correction of a warm panel —
    MXU matmuls replacing VPU Jacobi sweeps for the *well-gapped*
    leftover couplings.

    The warm panel is ``P = Q^T A_shift`` (rows ``p_i = A q_i``) with Q
    near the true eigenbasis; ``T = P P^T = Q^T A^2 Q`` is then nearly
    diagonal.  The first-order rotation that zeroes coupling (i, j) of T
    is ``R = I + E`` with antisymmetric ``E_ij = T_ij / (t_j - t_i)``
    (divided differences on the squared shifted eigenvalues).  Entries
    with ``|E_ij| > emax`` — couplings between near-degenerate pairs,
    where first-order correction is invalid (this is exactly the
    failure mode that sank the cold-path MXU-polish prototype, see the
    module docstring) — are clipped to zero and left for the Jacobi
    finisher, whose 2x2 rotations solve them exactly.  R is made
    *exactly* orthogonal by 3 Newton-Schulz polar steps (for antisym E,
    ``polar(I+E) = exp(E) + O(E^3)``, so the first-order kill is
    preserved), hence the sweep kernel's G-invariant survives to f32
    rounding and a bad correction can cost sweeps, never correctness —
    additionally the orthogonality guard runs AFTER this correction, so
    even an NS-divergent R (``||E|| ~ 1`` would need more steps) only
    diverts that matrix to the cold sweep.

    Cost: ``8 * passes`` batched (n, n) HIGHEST matmuls ~ 0.5 ms at
    B=64, n=256 — vs ~8 ms for one VPU sweep of the same batch.
    """
    hi = jax.lax.Precision.HIGHEST
    n = g0.shape[-1]
    dt = g0.dtype
    eye = jnp.eye(n, dtype=dt)
    for _ in range(passes):
        T = jnp.matmul(g0, jnp.swapaxes(g0, -2, -1), precision=hi)
        t = jnp.diagonal(T, axis1=-2, axis2=-1)
        denom = t[..., None, :] - t[..., :, None]           # t_j - t_i
        # clip: |T_ij| <= emax * |denom| keeps |E| <= emax; the diagonal
        # (denom = 0, |T_ii| > 0) and near-degenerate pairs fall out.
        # denom == 0 must be excluded EXPLICITLY: an exactly-degenerate
        # uncoupled pair (T_ij = 0 — identical padding rows, or a broken
        # preconditioner's zero rows) passes the clip test and 0/0 would
        # NaN-poison the panel before the guard can catch it
        live = jnp.logical_and(
            jnp.abs(T) <= emax * jnp.abs(denom),
            jnp.abs(denom) > jnp.asarray(jnp.finfo(dt).tiny * 16, dt))
        E = jnp.where(live, T / jnp.where(live, denom, 1.0),
                      jnp.asarray(0.0, dt))
        R = eye + E
        for _ns in range(3):
            RtR = jnp.matmul(jnp.swapaxes(R, -2, -1), R, precision=hi)
            R = jnp.matmul(R, 1.5 * eye - 0.5 * RtR, precision=hi)
        g0 = jnp.matmul(jnp.swapaxes(R, -2, -1), g0, precision=hi)
    return g0


def _panel_bytes(n: int, width: int) -> int:
    """Modeled VMEM footprint of ONE matrix in the REAL sweep kernel:
    in + out blocks with pipeline double-buffering (~4 n*width planes)
    plus the round loop's live top/bot temporaries (~1 plane).
    Validated by the measured 18.7 MB OOM at n=704, m=2 (model:
    19.8 MB).

    The complex-pair kernel does NOT follow a plane model: its measured
    scoped allocation at m=1 is roughly n-independent (16.2-22.0 MB
    across n in [288, 512], hardware probe 2026-08-20 — the phase-
    aligned Re/Im quarter temporaries and reconcatenations defeat
    Mosaic's buffer reuse across the unrolled rounds).  Complex calls
    are therefore gated by the probed `_CX_NMAX` window at m=1 under
    the raised `_CX_VMEM_LIMIT` instead of this model."""
    return 5 * n * width * 4


def _mats_per_program(n: int, width: int, batch: int,
                      m_cap: Optional[int] = None) -> int:
    """How many matrices to stack per grid program: grow the VPU op shapes
    for small n, stay within the 16 MB scoped-VMEM limit for large n.
    Per-matrix footprint: in + out blocks with pipeline double-buffering
    (~4 n*width planes) plus the round loop's live top/bot temporaries
    (~1 more plane) — the old 3-plane estimate OOMed at n=704, m=2
    (18.7 MB measured vs the 16 MB limit).  ``width`` is the TRUE panel
    width (== n for square eigh panels, 2n for complex-pair planes, the
    long side m for SVD panels, the source n for windowed sub-panels) —
    modeling it as n undercounted rectangular panels by width/n and
    could stack an OOM.  Never stack more matrices than the batch
    actually has: the batch pad rides through every sweep, so m > B
    multiplies the VPU work by m/B for nothing (B=1 grid points paid
    8x).  ``m_cap`` overrides the default ``_M_CAP`` stack bound — the
    windowed local phase stacks many narrow (2w, n) sub-panels per
    program to keep the grid short."""
    bytes_per_mat = _panel_bytes(n, width)
    cap = _M_CAP if m_cap is None else m_cap
    m = max(1, min(cap, _VMEM_BUDGET // max(bytes_per_mat, 1)))
    return min(m, max(batch, 1))


def _rot_coeffs(nt, nb, gam_abs2, gam_for_zeta, tol2, dt, eps_floor):
    """Jacobi rotation (c, s) for column pairs with carried squared norms
    ``nt``/``nb`` and pair dot ``gam_for_zeta`` (|gamma| for the complex
    path).  Returns (c, s, ratio); dead pairs (ratio below the skip
    threshold) get the identity rotation."""
    ab = nt * nb
    ratio = gam_abs2 / jnp.maximum(ab, eps_floor)      # cos^2 angle
    # skip already-orthogonal (or zero) pairs
    live = ratio > jnp.asarray(tol2 * 0.01, dt)
    zeta = (nb - nt) / jnp.where(live, 2.0 * gam_for_zeta, 1.0)
    t = jnp.where(zeta >= 0, 1.0, -1.0) / (
        jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
    # raw hardware rsqrt (~1e-4 relative): its error is a COMMON scale on
    # (c, s) since s = c*t, so the rotated pair keeps exact directions
    # (rows are only jointly rescaled), the analytic norm updates below
    # stay self-consistent (they use the same c, s), and the per-sweep
    # norm refresh caps the accumulated row-scale drift at ~sqrt(n)*1e-4;
    # eigenvalues come from the Rayleigh polish on the unshifted input,
    # not from row norms.  The previous Newton correction step bought
    # nothing measurable and cost 3 VPU ops per round.
    c = lax.rsqrt(1.0 + t * t)
    s = c * t
    c = jnp.where(live, c, jnp.asarray(1.0, dt))
    s = jnp.where(live, s, jnp.asarray(0.0, dt))
    return c, s, ratio


def _shuffle(h, ntop, nbot):
    """Brent-Luk tournament shuffle along the pair axis (-2):
    new_top = [top0, bot0, top1..top_{h-2}],
    new_bot = [bot1..bot_{h-1}, top_{h-1}].

    Written as two static-slice concatenates — one sublane-realigning
    copy per plane.  (The original roll-and-select form cost 3 rolls +
    3 selects per round, ~45% of the round's panel ops.)"""
    new_top = jnp.concatenate(
        [ntop[..., 0:1, :], nbot[..., 0:1, :], ntop[..., 1:h - 1, :]],
        axis=-2)
    new_bot = jnp.concatenate(
        [nbot[..., 1:h, :], ntop[..., h - 1:h, :]], axis=-2)
    return new_top, new_bot


def _jacobi_kernel(a_ref, g_ref, sweeps_ref=None, *, n: int, m: int,
                   max_sweeps: int, tol2: float):
    """``m`` matrices per grid program.  a_ref: (m, n, width) input
    panel — (m, n, n) shifted-PSD symmetric for eigh, rectangular
    (m, n, width) with rows = columns of A for Hestenes SVD; g_ref:
    same-shape output G^T (G = A·V; at convergence row i is
    lambda'_i v_i^T / s_i u_i^T).  ``sweeps_ref`` (optional): the FULL
    (nprog, 1) int32 SMEM block shared across grid programs (the TPU
    lowering rejects per-program partial blocks); each program writes
    its own executed sweep count at row ``pl.program_id(0)`` — the
    while_loop exits on the max leftover cos^2 over all m stacked
    matrices, so this is the max over the stack (diagnostics only)."""
    h = n // 2
    dt = a_ref.dtype
    eps_floor = jnp.asarray(jnp.finfo(dt).tiny * 16.0, dt)

    g_ref[...] = a_ref[...]  # G^T := A (A symmetric so A^T = A)

    def _one_round(top, bot, nt, nb):
        gam = jnp.sum(top * bot, axis=-1, keepdims=True)   # (m, h, 1)
        c, s, _ = _rot_coeffs(nt, nb, gam * gam, gam, tol2, dt,
                              eps_floor)
        ntop = c * top - s * bot
        nbot = s * top + c * bot
        # norms follow analytically (the rotation orthogonalizes the pair,
        # |c g_p - s g_q|^2 = c^2 a - 2csg + s^2 b); refreshed per sweep
        cs2 = 2.0 * c * s * gam
        nt_new = c * c * nt + s * s * nb - cs2
        nb_new = s * s * nt + c * c * nb + cs2
        new_top, new_bot = _shuffle(h, ntop, nbot)
        new_nt, new_nb = _shuffle(h, nt_new, nb_new)
        return new_top, new_bot, new_nt, new_nb

    # a "sweep" is ceil((n-1)/U)*U rounds: >= n-1 consecutive rounds visit
    # every pair at least once (the tournament has period n-1); the <=U-1
    # overshoot rounds are harmless extra rotations
    n_iters = -(-(n - 1) // _UNROLL)

    def round_block(r, carry):
        nt, nb = carry
        top = g_ref[:, :h, :]
        bot = g_ref[:, h:, :]
        for _ in range(_UNROLL):
            top, bot, nt, nb = _one_round(top, bot, nt, nb)
        g_ref[:, :h, :] = top
        g_ref[:, h:, :] = bot
        return nt, nb

    def _max_cos2():
        # convergence gauge on the MXU: one Gram matmul per sweep
        # (~0.1 ms) against ~12 ms for a VPU sweep, so exiting on the
        # TRUE post-sweep state costs nothing — the old per-round
        # running-max always spent one extra full sweep just observing
        # that the previous one had converged.  Unrolled over the m
        # stacked matrices with plain 2D dots (Mosaic-safe), in static
        # row chunks so the gauge temporaries stay ~1 MB at any n (full
        # (n, n) temps blow the 16 MB scoped-VMEM limit at n >= 704).
        chunk = n if n <= 512 else 128
        worst = jnp.asarray(0.0, jnp.float32)
        for k in range(m):
            g = g_ref[k, :, :]
            nrm = jnp.sum(g * g, axis=-1)                  # (n,)
            for lo in range(0, n, chunk):
                hi_ = min(lo + chunk, n)
                gc = g_ref[k, lo:hi_, :]
                # HIGHEST precision: the default bf16 MXU path floors
                # the measured cos at ~4e-3 input-rounding noise, far
                # above tol (7.6e-6 at n=256) — the loop would burn
                # max_sweeps blind
                gram = jax.lax.dot_general(
                    gc, g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # (c, n)
                c_ = hi_ - lo
                denom = jnp.maximum(nrm[lo:hi_][:, None] * nrm[None, :],
                                    eps_floor)
                ratio = gram * gram / denom
                iot_r = lax.broadcasted_iota(jnp.int32, (c_, n), 0) + lo
                iot_c = lax.broadcasted_iota(jnp.int32, (c_, n), 1)
                ratio = jnp.where(iot_r == iot_c, 0.0, ratio)
                worst = jnp.maximum(worst, jnp.max(ratio))
        return worst

    def sweep_cond(carry):
        sweep, ratio = carry
        # `ratio` is the Gram-gauge-measured TRUE max cos^2 of the current
        # state (not a lagged running max), so converging stacks exit the
        # moment tol2 is reached
        return jnp.logical_and(sweep < max_sweeps,
                               ratio > jnp.asarray(tol2, dt))

    def sweep_body(carry):
        sweep, _ = carry
        # fresh norms once per sweep: kills the analytic-update fp drift
        nt = jnp.sum(g_ref[:, :h, :] * g_ref[:, :h, :], axis=-1,
                     keepdims=True)
        nb = jnp.sum(g_ref[:, h:, :] * g_ref[:, h:, :], axis=-1,
                     keepdims=True)
        lax.fori_loop(0, n_iters, round_block, (nt, nb))
        return sweep + 1, _max_cos2()

    # initial gauge instead of inf: a panel already below tol (a fully
    # corrected warm start) exits with ZERO sweeps; cold panels pay one
    # ~0.1 ms gauge to learn they must sweep
    final = lax.while_loop(sweep_cond, sweep_body,
                           (jnp.asarray(0, jnp.int32),
                            _max_cos2().astype(dt)))
    if sweeps_ref is not None:
        from jax.experimental import pallas as pl
        sweeps_ref[pl.program_id(0), 0] = final[0]


def _jacobi_kernel_complex(a_ref, g_ref, *, n: int, m: int, max_sweeps: int,
                           tol2: float, width: int):
    """Complex variant: a_ref/g_ref are (m, n, width) real planes
    ``[Re G^T | Im G^T]`` (row i holds the complex vector g_i packed as
    its Re half then its Im half, ``width = 2 * len(g_i)``).  For the
    hermitian eigh path g_i is column i of G (square, width = 2n); the
    complex Hestenes SVD path passes the rectangular panel of A's
    columns.  Each pair rotation phase-aligns g_q by exp(-i arg(gamma))
    so the Jacobi rotation itself stays real and applies to both planes
    at once."""
    h = n // 2
    hw = width // 2
    dt = a_ref.dtype
    eps_floor = jnp.asarray(jnp.finfo(dt).tiny * 16.0, dt)

    g_ref[...] = a_ref[...]

    def _one_round(top, bot, nt, nb):
        rt, it = top[..., :hw], top[..., hw:]
        rb, ib = bot[..., :hw], bot[..., hw:]
        # gamma = <g_p, g_q> (hermitian inner product), two reductions
        g_re = jnp.sum(rt * rb + it * ib, axis=-1, keepdims=True)
        g_im = jnp.sum(rt * ib - it * rb, axis=-1, keepdims=True)
        gam2 = g_re * g_re + g_im * g_im
        gam_abs = jnp.sqrt(gam2)
        c, s, _ = _rot_coeffs(nt, nb, gam2, gam_abs, tol2, dt, eps_floor)
        # phase-align g_q: q ~= exp(-i*theta) g_q with theta = arg(gamma);
        # gamma == 0 (already-orthogonal pair) must fall back to the
        # IDENTITY phase — dividing 0/eps_floor would zero the factor and
        # annihilate the whole bottom row
        safe = gam_abs > eps_floor
        denom = jnp.maximum(gam_abs, eps_floor)
        ph_c = jnp.where(safe, g_re / denom, jnp.asarray(1.0, dt))
        ph_s = jnp.where(safe, g_im / denom, jnp.asarray(0.0, dt))
        qr = ph_c * rb + ph_s * ib
        qi = ph_c * ib - ph_s * rb
        nrt = c * rt - s * qr
        nit = c * it - s * qi
        nqr = s * rt + c * qr
        nqi = s * it + c * qi
        ntop = jnp.concatenate([nrt, nit], axis=-1)
        nbot = jnp.concatenate([nqr, nqi], axis=-1)
        cs2 = 2.0 * c * s * gam_abs
        nt_new = c * c * nt + s * s * nb - cs2
        nb_new = s * s * nt + c * c * nb + cs2
        new_top, new_bot = _shuffle(h, ntop, nbot)
        new_nt, new_nb = _shuffle(h, nt_new, nb_new)
        return new_top, new_bot, new_nt, new_nb

    n_iters = -(-(n - 1) // _UNROLL)

    def round_block(r, carry):
        nt, nb = carry
        top = g_ref[:, :h, :]
        bot = g_ref[:, h:, :]
        for _ in range(_UNROLL):
            top, bot, nt, nb = _one_round(top, bot, nt, nb)
        g_ref[:, :h, :] = top
        g_ref[:, h:, :] = bot
        return nt, nb

    def _max_cos2():
        # MXU Gram convergence gauge, as in the real kernel; hermitian
        # |<g_i, g_j>|^2 from the two planes: Re = g_i . g_j over the
        # full 2n row, Im = g_i . swap(g_j) with swap = [Im | -Re].
        # Unrolled over the m stacked matrices with 2D dots (Mosaic-safe),
        # chunked over rows to bound the gauge temporaries (see the real
        # kernel).
        chunk = n if n <= 256 else 128
        worst = jnp.asarray(0.0, jnp.float32)
        for k in range(m):
            g = g_ref[k, :, :]
            gsw = jnp.concatenate([g[:, hw:], -g[:, :hw]], axis=-1)
            nrm = jnp.sum(g * g, axis=-1)
            for lo in range(0, n, chunk):
                hi_ = min(lo + chunk, n)
                gc = g_ref[k, lo:hi_, :]
                # HIGHEST precision: see the real-kernel gauge note
                re = jax.lax.dot_general(
                    gc, g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                im = jax.lax.dot_general(
                    gc, gsw, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                gram2 = re * re + im * im
                c_ = hi_ - lo
                denom = jnp.maximum(nrm[lo:hi_][:, None] * nrm[None, :],
                                    eps_floor)
                ratio = gram2 / denom
                iot_r = lax.broadcasted_iota(jnp.int32, (c_, n), 0) + lo
                iot_c = lax.broadcasted_iota(jnp.int32, (c_, n), 1)
                ratio = jnp.where(iot_r == iot_c, 0.0, ratio)
                worst = jnp.maximum(worst, jnp.max(ratio))
        return worst

    def sweep_cond(carry):
        sweep, ratio = carry
        # Gram-gauge-measured true max cos^2, as in the real kernel
        return jnp.logical_and(sweep < max_sweeps,
                               ratio > jnp.asarray(tol2, dt))

    def sweep_body(carry):
        sweep, _ = carry
        g = g_ref[...]
        nt = jnp.sum(g[:, :h, :] * g[:, :h, :], axis=-1, keepdims=True)
        nb = jnp.sum(g[:, h:, :] * g[:, h:, :], axis=-1, keepdims=True)
        lax.fori_loop(0, n_iters, round_block, (nt, nb))
        return sweep + 1, _max_cos2()

    # initial gauge instead of inf (see the real kernel)
    lax.while_loop(sweep_cond, sweep_body,
                   (jnp.asarray(0, jnp.int32), _max_cos2().astype(dt)))


def _pallas_g_panel(a: jnp.ndarray, max_sweeps: int, tol: float,
                    interpret: bool, complexpair: bool,
                    return_sweeps: bool = False,
                    m_cap: Optional[int] = None) -> jnp.ndarray:
    """Run the kernel on (B, n, width) input; returns the G^T panel.
    With ``return_sweeps`` also returns the per-program executed sweep
    counts (shape (ceil(B/m),) int32 — diagnostics only; the real kernel
    supports it, the complex-pair variant does not)."""
    from jax.experimental import pallas as pl

    B, n, width = a.shape
    if complexpair:
        # hardware-probed window (not a plane model: the measured scoped
        # allocation is roughly n-independent at m=1, 16.2-22.0 MB for
        # n in [288, 512] — see _CX_VMEM_LIMIT); one matrix per program
        if not interpret and max(n, width // 2) > _CX_NMAX:
            raise ValueError(
                "jacobi_eigh complex-pair kernel: panel dimension %d "
                "(max of the pair axis and the packed half-width) exceeds "
                "the hardware-validated <= %d window (the kernel's scoped-"
                "VMEM footprint is measured, not modeled, past it) — use "
                "jnp.linalg.eigh / symeig(method=\"exacteig\") for "
                "complex matrices this large"
                % (max(n, width // 2), _CX_NMAX))
        m = 1
    else:
        if not interpret and _panel_bytes(n, width) > _VMEM_BUDGET:
            raise ValueError(
                "jacobi_eigh sweep kernel: one (%d, %d) panel needs "
                "%.1f MB of VMEM against the ~16 MB scoped budget "
                "(model: 5 planes with pipeline double-buffering) — use "
                "jnp.linalg.eigh / symeig(method=\"exacteig\") for "
                "matrices this large"
                % (n, width, _panel_bytes(n, width) / 1e6))
        m = _mats_per_program(n, width, B, m_cap)
    if B % m:
        # pad the batch with identity-like matrices (diag already set by
        # the caller's shift; zeros converge instantly and are sliced off)
        a = jnp.concatenate(
            [a, jnp.zeros((m - B % m, n, width), a.dtype)], axis=0)
    Bpad = a.shape[0]

    try:
        from jax.experimental.pallas import tpu as pltpu
        memspace = pltpu.VMEM
    except ImportError:  # pragma: no cover
        memspace = None

    def spec():
        kwargs = {"index_map": lambda b: (b, 0, 0)}
        if memspace is not None:
            kwargs["memory_space"] = memspace
        return pl.BlockSpec((m, n, width), **kwargs)

    kfn = _jacobi_kernel_complex if complexpair else _jacobi_kernel
    kw = {"width": width} if complexpair else {}
    kernel = functools.partial(kfn, n=n, m=m, max_sweeps=max_sweeps,
                               tol2=tol * tol, **kw)
    cx_extra = {}
    if complexpair and not interpret and memspace is not None:
        # The complex round's phase-aligned Re/Im quarter temporaries and
        # their reconcatenations defeat Mosaic's buffer reuse across the
        # _UNROLL-ed rounds: measured scoped allocations at m=1 sit at a
        # roughly n-INDEPENDENT 16.2-22.0 MB across n in [288, 512]
        # (2026-08-20 hardware probe), blowing the 16 MB default scoped-
        # VMEM limit at every size.  v5e VMEM is far larger (128 MiB);
        # raise the scoped limit for this call like the sweeps-output
        # variant below does.  m is pinned to 1 for complex above.
        from jax.experimental.pallas import tpu as pltpu
        _Params = getattr(pltpu, "CompilerParams",
                          getattr(pltpu, "TPUCompilerParams", None))
        if _Params is not None:
            cx_extra["compiler_params"] = _Params(
                vmem_limit_bytes=_CX_VMEM_LIMIT)
    if return_sweeps and not complexpair:
        # the sweep-count output is one SMEM block spanning the whole
        # (nprog, 1) array (the TPU lowering rejects per-program partial
        # blocks that neither tile by (8, 128) nor span the array); each
        # program writes its own row via pl.program_id
        nprog = Bpad // m
        sw_kwargs = {"index_map": lambda b: (0, 0)}
        extra = {}
        if memspace is not None:
            from jax.experimental.pallas import tpu as pltpu
            sw_kwargs["memory_space"] = pltpu.SMEM
            # the sweeps output nudges the m=8 variant ~1% past the 16 MB
            # scoped-VMEM default; diagnostics-only path, so buy headroom
            _Params = getattr(pltpu, "CompilerParams",
                              getattr(pltpu, "TPUCompilerParams", None))
            if _Params is not None and not interpret:
                extra["compiler_params"] = _Params(
                    vmem_limit_bytes=20 * 1024 * 1024)
        g, sweeps = pl.pallas_call(
            kernel,
            grid=(nprog,),
            in_specs=[spec()],
            out_specs=[spec(), pl.BlockSpec((nprog, 1), **sw_kwargs)],
            out_shape=[jax.ShapeDtypeStruct((Bpad, n, width), a.dtype),
                       jax.ShapeDtypeStruct((nprog, 1), jnp.int32)],
            interpret=interpret,
            **extra,
        )(a)
        return g[:B], sweeps[:, 0]
    g = pl.pallas_call(
        kernel,
        grid=(Bpad // m,),
        in_specs=[spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((Bpad, n, width), a.dtype),
        interpret=interpret,
        **cx_extra,
    )(a)
    return g[:B]


def _padded_n(n: int, precondition: bool, deflate: bool = False) -> int:
    """Internal working size for an (n, n) input: the sweep kernel needs
    a multiple of 16; the preconditioned path past the single-shot DC
    window additionally needs 128-lane alignment (the per-level DC
    kernel DMAs (npad, npad) HBM slices by hand and Mosaic memref_slice
    rejects unaligned minor dims, e.g. 704).  The deflated path's
    windows are segment-aligned (data-dependent starts), so it needs
    only the base 16-multiple.  Padding eigenvalues are placed
    above the spectrum and sliced off after the sort."""
    from .dc_kernel import _PER_LEVEL_ALIGN, _PER_LEVEL_MIN_N

    npad = max(16, -(-n // 16) * 16)
    if deflate:
        npad = max(64, npad)
    elif precondition and npad > _PER_LEVEL_MIN_N:
        npad = -(-n // _PER_LEVEL_ALIGN) * _PER_LEVEL_ALIGN
    return npad


def jacobi_eigh(A: jnp.ndarray, *, max_sweeps: int = 18,
                tol: Optional[float] = None, interpret: bool = False,
                precondition: Optional[bool] = None,
                deflate: Optional[bool] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric/hermitian eigendecomposition, ``jnp.linalg.eigh``
    contract.

    ``A``: (*B, n, n) real symmetric or complex hermitian.  Returns
    ascending (real) eigenvalues (*B, n) and column eigenvectors
    (*B, n, n).  Raw kernel entry — no custom derivatives here;
    ``degen_eigh`` wraps it with the degeneracy-safe JVP.  Pads n to a
    multiple of 16 internally (padding eigenvalues are placed above the
    Gershgorin range and sliced off).

    ``precondition`` (default: auto — real input, 192 <= n <= 448, the
    measured win window of the single-shot DC kernel; the per-level
    HBM-streamed variant covering (448, 768] is a measured net loss on
    v5e — see the auto-window comment below — and is opt-in via
    precondition=True, where the problem is additionally padded to a
    128-lane boundary so its manual HBM DMA slices stay aligned) runs
    the MXU spectral divide-and-conquer sort first
    (``ops/dc_kernel.py``) and hands the sweep kernel
    ``G0 = Q^T A_shift`` instead of ``A_shift``.  The sweep kernel's
    G-invariant (G = R^T A_shift with R
    orthogonal at every stage) makes this transparent: eigenvalue/vector
    extraction, polish and sorting are unchanged, and a bad or soft
    preconditioner costs extra sweeps, never correctness.  Design: with
    min_seg=2 every surviving in-block coupling is an isolated 2x2 that
    the first tournament rotation solves exactly, so the finisher should
    exit in 1-2 sweeps (an XLA-level prototype at depth 6 measured
    780 -> 1,264 decomps/s before the in-kernel port).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    if A.ndim < 2 or A.shape[-1] != A.shape[-2]:
        raise ValueError("jacobi_eigh expects (*B, n, n), got %s"
                         % (A.shape,))
    iscomplex = jnp.iscomplexobj(A)
    batch = A.shape[:-2]
    n = A.shape[-1]
    dt = A.real.dtype if iscomplex else A.dtype
    if tol is None:
        # the reachable floor: after a rotation, rounding leaves pair
        # cosines at ~eps*sqrt(n) (a random-walk inner product of n
        # rounded terms), so a tolerance below that can NEVER be met and
        # the sweep loop burns max_sweeps doing nothing (measured: the
        # 4*eps default ran all 18 sweeps at n=256 — 3x the converged
        # cost).  4*eps*sqrt(n) sits above the noise floor; quadratic
        # convergence makes the last real sweep overshoot far below it,
        # and the Newton-orthonormalization + Rayleigh-quotient polish
        # takes eigenvalues to O(cos^2) anyway.
        tol = float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(n)
    Bflat = math.prod(batch) if batch else 1
    a = A.reshape(Bflat, n, n)

    # PSD shift: sigma >= -lambda_min via the one-sided Gershgorin bound
    # min_i (a_ii - sum_{j!=i} |a_ij|), plus a 1% ||A||_F margin that
    # floors the smallest shifted eigenvalue (the G-only eigenvector
    # extraction divides by lambda'_i = |g_i|; see module docstring).
    absa = jnp.abs(a)
    diag = jnp.real(jnp.diagonal(a, axis1=-2, axis2=-1))
    offsum = jnp.sum(absa, axis=-1) - jnp.diagonal(absa, axis1=-2, axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)                      # (B,)
    frob = jnp.sqrt(jnp.sum(absa * absa, axis=(-2, -1)))
    sigma = (jnp.maximum(-lower, 0.0) + jnp.asarray(0.01, dt) * frob
             + jnp.asarray(1e-30, dt)).astype(dt)
    # upper spectral bound of the shifted matrix, for the padding diagonal
    upper = jnp.max(diag + offsum, axis=-1)
    top = (jnp.maximum(upper, 0.0) + sigma).astype(dt)

    from .dc_kernel import _PER_LEVEL_MIN_N
    if precondition is None:
        # measured win window only (v5e, dc_validate.py 2026-08-19):
        # below ~192 the cold kernel is already overhead-bound and the
        # DC adds more than it saves; within [192, 448] the single-shot
        # DC kernel wins (n=256: warm 1,016 vs cold 889 decomps/s);
        # past the single-shot VMEM window the per-level HBM-streamed
        # variant is a measured net LOSS (n=512: warm 174 vs cold 202;
        # n=700, 128-padded to 768: warm 48 vs cold 85 — the level
        # streaming + alignment padding cost more than the ~7 sweeps
        # they save), so the sweep kernel runs cold there by default.
        # The per-level path stays available via precondition=True.
        precondition = (not iscomplex) and 192 <= n <= _PER_LEVEL_MIN_N
    elif precondition and iscomplex:
        raise ValueError(
            "jacobi_eigh: precondition=True is not supported for complex "
            "input (the DC kernel operates on real symmetric matrices; "
            "the complex path packs [Re|Im] planes which the segment "
            "bookkeeping does not model) — leave precondition=None/False")

    if deflate is None:
        deflate = (_DEFLATE_WIN is not None and not iscomplex
                   and _DEFLATE_WIN[0] <= n <= _DEFLATE_WIN[1])
    elif deflate and iscomplex:
        raise ValueError(
            "jacobi_eigh: deflate=True is not supported for complex input "
            "(the DC kernel operates on real symmetric matrices) — leave "
            "deflate=None/False")
    elif deflate and _padded_n(n, False, True) > _PER_LEVEL_MIN_N:
        # the deflated pipeline needs the single-shot DC kernel's
        # return_t/return_seg/refine exports, which the per-level
        # HBM-streamed variant (n > _PER_LEVEL_MIN_N after padding) does
        # not provide — gate HERE with a public-level message instead of
        # surfacing dc_precondition_tpu's internal ValueError
        raise ValueError(
            "jacobi_eigh: deflate=True is only supported for n <= %d "
            "(the single-shot DC window); use precondition=True or the "
            "default cold sweep for larger n" % _PER_LEVEL_MIN_N)
    if deflate:
        precondition = False  # the deflated path runs its own DC

    npad = _padded_n(n, precondition, deflate)
    if npad != n:
        pad = npad - n
        a = jnp.pad(a, ((0, 0), (0, pad), (0, pad)))
        # padding block: diag above every true (shifted) eigenvalue
        prows = lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        pcols = lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        pmask = (prows == pcols) & (prows >= n)
        a = a + (jnp.where(pmask, 2.0, 0.0)[None]
                 * top[:, None, None]).astype(a.dtype)
    eye = jnp.eye(npad, dtype=dt)
    a = a + sigma[:, None, None] * eye

    if iscomplex:
        # G^T rows must hold g_i = column i of G = A; A hermitian means
        # column i = conj(row i), so the planes are (Re A, -Im A)
        planes = jnp.concatenate([jnp.real(a), -jnp.imag(a)], axis=-1)
        gt2 = _pallas_g_panel(planes.astype(dt), max_sweeps, tol, interpret,
                              complexpair=True)
        gt = lax.complex(gt2[..., :npad], gt2[..., npad:])
    else:
        g_in = a
        if deflate:
            # DC-deflated warm panel: the DC sort's decoupled diagonal
            # blocks are SOLVED at leaf size (plus an offset stage for
            # boundary clusters) instead of warm-starting full-n sweeps.
            # Concluded research (measured 907.6 vs the default path's
            # 1,083.4 decomps/s at B=64 n=256, equal quality) — the
            # machinery lives in the lab module; this opt-in branch is
            # the only entry.  The same correction / guard /
            # fallback-clustering tail as the warm path then applies —
            # the finisher kernel certifies convergence, so a soft DC
            # split costs sweeps, never correctness.
            from ._finisher_lab import deflated_panel
            g0 = deflated_panel(a, max_sweeps=max_sweeps,
                                interpret=interpret)
            g0 = _rot_correct(g0)
            g_in, bad = _guard_warm_start(a, g0)
            perm = jnp.argsort(bad.astype(jnp.int32), stable=True)
            gt = _pallas_g_panel(jnp.take(g_in, perm, axis=0), max_sweeps,
                                 tol, interpret, complexpair=False)
            gt = jnp.take(gt, jnp.argsort(perm), axis=0)
        elif precondition:
            from .dc_kernel import dc_precondition_tpu
            # depth: split every segment down to pairs; a 2-block is
            # solved EXACTLY by its first tournament rotation, so the
            # finisher exits after 1-2 sweeps instead of ~9
            levels = max(3, math.ceil(math.log2(npad)))
            g0 = dc_precondition_tpu(a, levels=levels, min_seg=2,
                                     interpret=interpret)
            # gap-clipped first-order rotational correction: kills the
            # well-gapped leftover couplings (incl. the rank-safety
            # blend's global cos ~ beta floor) on the MXU for ~0.5 ms,
            # where each would otherwise cost the finisher a ~8 ms VPU
            # sweep; near-degenerate pairs are clipped out and left for
            # the Jacobi 2x2 rotations
            g0 = _rot_correct(g0)
            # runtime orthogonality guard: any matrix whose warm panel
            # fails the G-invariant — a DC rank failure OR a divergent
            # correction rotation — falls back to the cold sweep
            g_in, bad = _guard_warm_start(a, g0)
            # cluster the cold fallbacks (~1/16 of clustered/Wishart
            # batches, dc_validate.py) into the FEWEST grid programs:
            # each program's sweep while_loop exits on the max leftover
            # cos^2 over its m stacked matrices, so an unsorted cold
            # matrix drags m-1 warm neighbours through its ~9 sweeps.
            # Stable argsort on the flag keeps warm programs warm; the
            # inverse gather after the kernel is batch-dim only.
            perm = jnp.argsort(bad.astype(jnp.int32), stable=True)
            gt = _pallas_g_panel(jnp.take(g_in, perm, axis=0), max_sweeps,
                                 tol, interpret, complexpair=False)
            gt = jnp.take(gt, jnp.argsort(perm), axis=0)
        else:
            gt = _pallas_g_panel(g_in, max_sweeps, tol, interpret,
                                 complexpair=False)

    # row i of G^T is lambda'_i * v_i: norms are the shifted eigenvalues,
    # directions the eigenvectors
    lam = jnp.sqrt(jnp.sum(jnp.abs(gt) ** 2, axis=-1))          # (B, npad)
    vt = gt / jnp.maximum(lam, jnp.asarray(jnp.finfo(dt).tiny * 16, dt)
                          )[..., None]
    if npad != n:
        # drop the padding rows: their (shifted) eigenvalues were placed
        # above every true one, so ascending sort puts them last.  With no
        # padding this whole gather is skipped — the authoritative sort
        # happens after the polish anyway.
        order = jnp.argsort(lam, axis=-1)
        vt = jnp.take_along_axis(vt, order[..., None], axis=-2)
    vt = vt[:, :n, :n]
    # row i of the panel holds g_i itself, so a plain transpose puts the
    # eigenvectors in columns (no conjugation, also for complex input)
    V = jnp.swapaxes(vt, -2, -1)

    # polish (3 batched matmuls on the MXU, trivially cheap next to the
    # sweeps): one Newton orthonormalization V <- V(3I - V^H V)/2 squares
    # away the ~sqrt(#rotations)*eps orthogonality drift, then Rayleigh
    # quotients on the *unshifted* input recover the eps*|A| (instead of
    # eps*sigma) eigenvalue accuracy — O(cos^2) from the <= tol leftover
    # mixing certified by the Gram-gauge exit.  HIGHEST precision: these
    # are solver-internal contractions (see CLAUDE.md precision note).
    hi = jax.lax.Precision.HIGHEST
    a0 = A.reshape(Bflat, n, n)
    eye_n = jnp.eye(n, dtype=V.dtype)
    VH = jnp.swapaxes(V, -2, -1).conj()
    VtV = jnp.matmul(VH, V, precision=hi)
    V = jnp.matmul(V, 1.5 * eye_n - 0.5 * VtV, precision=hi)
    AV = jnp.matmul(a0, V, precision=hi)
    lam = jnp.real(jnp.sum(V.conj() * AV, axis=-2))
    if deflate:
        # the deflated panel ENTERS the finisher just under tol instead
        # of overshooting below it, so its output needs one unshifted
        # Rayleigh-Ritz refinement pass (lab module, with the rest of
        # the concluded deflate machinery)
        from ._finisher_lab import deflate_refine
        lam, V = deflate_refine(a0, V, AV, lam)
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return lam.reshape(*batch, n), V.reshape(*batch, n, n)


def _complete_null_columns(Q: jnp.ndarray, good: jnp.ndarray) -> jnp.ndarray:
    """Replace the columns of ``Q`` (B, m, r) flagged bad by ``good``
    (B, r) bool with an orthonormal completion of the good columns.

    Numerically-zero singular values leave ZERO rows in the Hestenes G
    panel, hence zero (or junk-direction) columns in U and V — while the
    XLA svd path returns orthonormal null-space completions.  This
    restores the common contract: bad slots get a fixed quasi-random fill
    projected against the good columns (2 matmuls) and orthonormalized
    among themselves by a masked CholQR.  All mask arithmetic — which
    columns are bad is data-dependent and this runs under jit.
    """
    B, mdim, r = Q.shape
    dt = Q.dtype
    rdt = jnp.finfo(dt).dtype  # real counterpart (identity for real dt)
    hi = jax.lax.Precision.HIGHEST
    g = good.astype(dt)
    # deterministic full-rank fill (no RNG on the kernel path; a REAL
    # fill is full-rank against complex good columns too)
    iot_m = jnp.arange(mdim, dtype=rdt)[:, None]
    iot_r = jnp.arange(r, dtype=rdt)[None, :]
    F = jnp.sin(iot_m * (0.7391 * iot_r + 1.137) + 0.31 * iot_r)
    F = jnp.broadcast_to((F / math.sqrt(mdim)).astype(dt), (B, mdim, r))
    Qg = Q * g[:, None, :]
    C = jnp.matmul(jnp.swapaxes(Qg, -2, -1).conj(), F, precision=hi)
    F = F - jnp.matmul(Qg, C, precision=hi)
    # masked CholQR among the bad columns: good slots pinned to identity
    # so the factorization stays SPD; small relative ridge guards the
    # (improbable) near-dependence of two projected fill columns
    b = 1.0 - g
    Fb = F * b[:, None, :]
    # CholQR2: the deterministic fill's columns can correlate, so one
    # CholQR leaves ~cond(G)*eps non-orthogonality (measured 1.3e-2 on a
    # rank-5 f32 panel); the second pass starts near-orthonormal and
    # lands at ~eps
    for _ in range(2):
        G = jnp.matmul(jnp.swapaxes(Fb, -2, -1).conj(), Fb, precision=hi)
        G = (G * (b[:, :, None] * b[:, None, :])
             + jnp.eye(r, dtype=dt) * g[:, None, :]
             + jnp.eye(r, dtype=dt) * jnp.asarray(
                 16 * jnp.finfo(dt).eps / mdim, dt) * b[:, None, :])
        L = jnp.linalg.cholesky(G)
        Y = jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(Fb, -2, -1).conj(), lower=True)  # L^-1 Fb^H
        Fb = jnp.swapaxes(Y, -2, -1).conj()
    return Qg + Fb * b[:, None, :]


def jacobi_svd(A: jnp.ndarray, *, max_sweeps: int = 18,
               tol: Optional[float] = None, interpret: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched real economy SVD ``A = U diag(s) V^T`` via one-sided
    (Hestenes) Jacobi — the SAME sweep kernel as ``jacobi_eigh``, run
    directly on the columns of A instead of on a Gram matrix.

    ``A``: (*B, m, n) real or complex.  Returns ``(U (*B, m, r), s
    (*B, r) ASCENDING, V (*B, n, r))`` with ``r = min(m, n)``, ``A = U
    diag(s) V^H`` — the package-wide ascending convention
    (``linalg.svd`` mode="uppest" slices the tail).

    Complex input runs the complex-pair kernel on the packed real planes
    ``[Re(col_i) | Im(col_i)]`` — the same packing as the complex eigh
    path (each pair rotation phase-aligns g_q by exp(-i arg gamma), the
    Hermitian-inner-product Hestenes iteration).  This is the native
    complex SVD the Gram route lacks: singular values keep ~eps*kappa(A)
    error instead of ~eps*kappa(A)^2 (VERDICT r4 item 4b).

    Why a native path when ``svd`` already rides ``symeig(A^H A)``
    (reference xitorch/linalg/symeig.py:146-250): the sweep kernel never
    uses symmetry — it orthogonalizes the rows of its panel by plane
    rotations, which IS Hestenes' SVD iteration when the panel rows are
    the columns of A (at convergence row i = s_i u_i^T, and V follows
    from A^T U = V diag(s)).  Running on A instead of A^T A keeps the
    singular-value relative error at ~eps*kappa(A) instead of
    ~eps*kappa(A)^2 (the Gram squares the condition number), needs no
    Gershgorin PSD shift (s >= 0 natively), and skips the Gram matmul.
    Zero/tiny singular values: the right vectors v_i = A^T u_i / s_i are
    recovered by normalization, so directions in the numerical null
    space are arbitrary — the same contract as the Gram path's
    ``sdiv`` clamp.

    Raw kernel entry — no custom derivatives here; ``degen_svd``
    (_impls/linalg/symeig.py) wraps it with the degeneracy-safe JVP.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    if A.ndim < 2:
        raise ValueError("jacobi_svd expects (*B, m, n), got %s"
                         % (A.shape,))
    iscomplex = jnp.iscomplexobj(A)
    batch = A.shape[:-2]
    m_, n_ = A.shape[-2], A.shape[-1]
    if m_ < n_:
        # work on A^H (tall): A^H = U' S V'^H  =>  A = V' S U'^H
        u, s, v = jacobi_svd(jnp.swapaxes(A, -2, -1).conj(),
                             max_sweeps=max_sweeps, tol=tol,
                             interpret=interpret)
        return v, s, u
    dt = A.dtype
    rdt = jnp.finfo(dt).dtype  # real counterpart (identity for real dt)
    if tol is None:
        # same reachable-floor reasoning as jacobi_eigh's default
        tol = float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(n_)
    Bflat = math.prod(batch) if batch else 1
    a = A.reshape(Bflat, m_, n_)

    # panel rows = columns of A; pad the pair axis to a multiple of 16
    # with ZERO rows (zero columns are dead to every rotation — gamma=0
    # skips the pair — and sort as the smallest singular values)
    npad = max(16, -(-n_ // 16) * 16)
    panel = jnp.swapaxes(a, -2, -1)                    # (B, n, m)
    if npad != n_:
        panel = jnp.pad(panel, ((0, 0), (0, npad - n_), (0, 0)))
    if iscomplex:
        # packed real planes [Re(col_i) | Im(col_i)] — the complex-pair
        # kernel's row convention (see _jacobi_kernel_complex)
        planes = jnp.concatenate([jnp.real(panel), jnp.imag(panel)],
                                 axis=-1).astype(rdt)  # (B, npad, 2m)
        gt2 = _pallas_g_panel(planes, max_sweeps, tol, interpret,
                              complexpair=True)
        gt = lax.complex(gt2[..., :m_], gt2[..., m_:])  # (B, npad, m)
    else:
        gt = _pallas_g_panel(panel, max_sweeps, tol, interpret,
                             complexpair=False)        # (B, npad, m)

    # row i of G^T is s_i * u_i; drop the (npad - n) zero pads: ascending
    # sort puts them first (ties with true zero singular values are
    # interchangeable — both have arbitrary directions)
    lam = jnp.sqrt(jnp.sum(jnp.real(gt * gt.conj()), axis=-1)
                   ).astype(rdt)                       # (B, npad)
    order = jnp.argsort(lam, axis=-1)[..., npad - n_:]  # (B, n) ascending
    gt = jnp.take_along_axis(gt, order[..., None], axis=-2)   # (B, n, m)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    tiny = jnp.asarray(jnp.finfo(rdt).tiny * 16, rdt)
    U = jnp.swapaxes(gt / jnp.maximum(lam, tiny)[..., None].astype(dt),
                     -2, -1)

    # polish (cheap MXU matmuls, mirrors jacobi_eigh's): one Newton
    # orthonormalization of U squares away the ~sqrt(#rotations)*eps
    # drift, then V follows from A^T U = V diag(s) at HIGHEST precision
    # (solver-internal contraction, CLAUDE.md).  s stays the row norms:
    # row i IS A (V_total e_i) up to rounding (the G-invariant, no shift
    # cancellation to repair here), so |row i| carries ~eps*sqrt(#rot)
    # *absolute* error — whereas recomputing s = |A^T u_i| would inflate
    # exact-zero singular values to |<u_i, range(A)>|*s_max junk (the
    # numerical null space's direction is arbitrary, measured 1e-4 on a
    # rank-2 f64 test matrix).  V columns are normalized by |W_i| (not
    # divided by s) for the same reason.
    hi = jax.lax.Precision.HIGHEST
    eye_r = jnp.eye(n_, dtype=dt)
    UtU = jnp.matmul(jnp.swapaxes(U, -2, -1).conj(), U, precision=hi)
    U = jnp.matmul(U, 1.5 * eye_r - 0.5 * UtU, precision=hi)
    W = jnp.matmul(jnp.swapaxes(a, -2, -1).conj(), U,
                   precision=hi)                       # (B, n, r) = A^H U
    wn = jnp.sqrt(jnp.sum(jnp.real(W * W.conj()), axis=-2)
                  ).astype(rdt)                        # (B, r) = |A^H u_i|
    V = W / jnp.maximum(wn, tiny)[..., None, :].astype(dt)
    s = lam                                            # already ascending
    # numerically-zero singular values (s <= ~eps*s_max): their G rows are
    # zero (or rounding junk), so the normalized U/V columns are zero or
    # arbitrary non-orthogonal directions — unlike the XLA svd path, which
    # returns orthonormal null-space completions.  Restore that contract
    # (directions stay arbitrary, as documented; orthonormality does not).
    good = lam > (jnp.asarray(4.0 * jnp.finfo(rdt).eps * math.sqrt(m_),
                              rdt) * lam[..., -1:] + tiny)
    U = _complete_null_columns(U, good)
    V = _complete_null_columns(V, good)
    # one Newton orthonormalization on V as well: its good columns are
    # only pairwise-orthogonal to the kernel exit tolerance (V never saw
    # the U polish), measured ~3e-5 at f32 — one NS step squares that to
    # rounding and matches the XLA path's orthonormal-V contract
    VtV = jnp.matmul(jnp.swapaxes(V, -2, -1).conj(), V, precision=hi)
    V = jnp.matmul(V, 1.5 * eye_r - 0.5 * VtV, precision=hi)
    return (U.reshape(*batch, m_, n_), s.reshape(*batch, n_),
            V.reshape(*batch, n_, n_))


def use_jacobi_svd_for(A: jnp.ndarray) -> bool:
    """Dispatch gate used by ``degen_svd``: f32-precision input (real or
    complex64) on a TPU backend, small side >= 64.  Real panels must fit
    the modeled VMEM budget; complex panels run the complex-pair kernel
    one-matrix-per-program under the raised scoped-VMEM limit inside the
    hardware-probed ``_CX_NMAX`` window on BOTH sides (the kernel's
    footprint is measured, not modeled — see ``_panel_bytes``)."""
    if not (ENABLED
            and jax.default_backend() == "tpu"
            and A.ndim >= 2):
        return False
    r = min(A.shape[-1], A.shape[-2])
    w = max(A.shape[-1], A.shape[-2])
    npad = max(16, -(-r // 16) * 16)
    if jnp.iscomplexobj(A):
        return bool(A.dtype == jnp.complex64 and 64 <= r
                    and npad <= _CX_NMAX and w <= _CX_NMAX)
    return bool(A.dtype == jnp.float32 and 64 <= r
                and _panel_bytes(npad, w) <= _VMEM_BUDGET)


def use_jacobi_for(A: jnp.ndarray) -> bool:
    """Dispatch gate used by ``degen_eigh``: f32-precision input (real
    symmetric or complex64 hermitian) on a TPU backend, n small enough
    that the G^T panel + pipeline buffers fit VMEM."""
    if not (ENABLED
            and jax.default_backend() == "tpu"
            and A.ndim >= 2
            and A.shape[-1] == A.shape[-2]):
        return False
    n = A.shape[-1]
    npad = max(16, -(-n // 16) * 16)
    if jnp.iscomplexobj(A):
        # hardware-probed window: the complex-pair kernel runs one
        # matrix per program under the raised _CX_VMEM_LIMIT (its
        # measured scoped allocation is roughly n-independent,
        # 16.2-22.0 MB for n in [288, 512] — no plane model applies;
        # see _panel_bytes).  Validated through npad = _CX_NMAX = 512
        # on a v5e 2026-08-20.
        ok_dtype = A.dtype == jnp.complex64
        ok_size = npad <= _CX_NMAX
    else:
        # budget-derived cap: 5*npad^2*4 <= 14 MiB <=> npad <= 848; past
        # that a single matrix's panel would blow the scoped VMEM and
        # Mosaic fails at compile time, so fall back to XLA eigh
        ok_dtype = A.dtype == jnp.float32
        ok_size = _panel_bytes(npad, npad) <= _VMEM_BUDGET
    return bool(ok_dtype and 64 <= n and ok_size)
