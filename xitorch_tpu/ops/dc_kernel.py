"""Pallas TPU kernel: VMEM-resident spectral divide-and-conquer
preconditioner for the one-sided Jacobi eigh kernel.

Semantics and algorithm: ``ops/spectral_dc.py`` (the XLA reference
implementation) — per-segment median split, quintic Newton-Schulz
matrix sign, slot assignment, quintic Newton-Schulz polar
orthonormalization, ``T <- Q^T T Q``.  This file is the production
port: the whole level recursion runs on one (n, n) matrix resident in
VMEM, so the ~70 matmuls per level hit the MXU at ~0.2 us each instead
of the ~17 us HBM-bound cost of XLA-level batched ops (measured v5e,
(64, 256, 256) f32) — the entire preconditioner costs less than one
VPU Jacobi sweep.

Mosaic-facing design notes:

* no transposes: every quantity that is needed in both row and column
  orientation (segment ids, diagonals, ranks, slot masks) is computed
  twice with swapped broadcasting, or converted via a masked (n, n)
  broadcast-reduce.
* no sort / cholesky / triangular solve: medians by comparison-matrix
  ranking, orthogonalization by Newton-Schulz polar.
* matmuls contract axis 0 with axis 0 (``Q^T X`` shapes) through
  dot_general dimension numbers rather than materialized transposes.
* the level recursion is a ``fori_loop`` whose carry is
  ``(T, Qtot, seg_col, seg_row)``; the NS schedules are inner
  ``fori_loop``s.  Everything is one fused kernel per grid program.

Output: ``G0 = Qtot^T @ a_shift`` — the warm-start row panel for
``_pallas_g_panel`` in ``ops/jacobi_eigh.py`` (rows are ``q_i^T A``, so
the kernel's G-only eigenvector extraction is preserved verbatim).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .spectral_dc import _QUINTIC, _RANK_SAFE_BETA

__all__ = ["dc_precondition_tpu"]

_N_QUINTIC_SIGN = 8     # ramp length = sign-transition sharpness; see
# the _N_QUINTIC note in spectral_dc.py (6 steps left boundary
# eigenvalues smearing into "bad slots" at cos^2 ~ 1e-3)
_N_CUBIC_SIGN = 2       # fast-precision contraction steps
_N_CUBIC_SIGN_HI = 1    # final f32-grade step: the residual coupling the
# finisher must sweep away is set by the LAST sign step's matmul noise —
# one HIGHEST step drops it from the bf16 floor (~4e-3) to ~1e-5, which
# is what lets most matrices exit the Jacobi finisher after one sweep
_N_QUINTIC_POLAR = 10
_N_CUBIC_POLAR = 3      # fast-precision polish
_N_CUBIC_POLAR_HI = 2   # final f32-grade steps: 4e-3 -> 2e-5 -> 1e-9
# orthonormality, so Q_tot stays f32-orthogonal over all levels


def _dot(a, b, prec=None):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=a.dtype, precision=prec)


def _dot_t(a, b, prec=None):
    """a^T @ b without materializing the transpose."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=a.dtype, precision=prec)


def _dc_kernel(a_ref, om_ref, g_ref, t_ref=None, seg_ref=None, *,
               n: int, m: int, levels: int, min_seg: int,
               refine: int = 0):
    dt = a_ref.dtype
    hi = lax.Precision.HIGHEST
    qa, qb, qc = (jnp.asarray(v, dt) for v in _QUINTIC)

    iot_r = lax.broadcasted_iota(jnp.int32, (n, n), 0)   # row index
    iot_c = lax.broadcasted_iota(jnp.int32, (n, n), 1)   # col index
    eyem = (iot_r == iot_c).astype(dt)
    icol = lax.broadcasted_iota(jnp.int32, (n, 1), 0)    # (n, 1) 0..n-1
    irow = lax.broadcasted_iota(jnp.int32, (1, n), 1)    # (1, n) 0..n-1
    om = om_ref[...]

    def msign(X, mask):
        # the iteration map preserves symmetry to rounding, so the loops
        # skip explicit symmetrization (X^T costs an MXU identity-dot in
        # Mosaic); one symmetrization at the end suffices
        def quintic(_, X):
            X2 = _dot(X, X)
            X4 = _dot(X2, X2)
            return _dot(X, qa * eyem + qb * X2 + qc * X4) * mask

        def cubic(_, X):
            X2 = _dot(X, X)
            return (1.5 * X - 0.5 * _dot(X, X2)) * mask

        def cubic_hi(_, X):
            X2 = _dot(X, X, prec=hi)
            return (1.5 * X - 0.5 * _dot(X, X2, prec=hi)) * mask

        X = lax.fori_loop(0, _N_QUINTIC_SIGN, quintic, X)
        X = lax.fori_loop(0, _N_CUBIC_SIGN, cubic, X)
        X = lax.fori_loop(0, _N_CUBIC_SIGN_HI, cubic_hi, X)
        return 0.5 * (X + _dot_t(X, eyem))

    def polar(Q):
        def quintic(_, Q):
            G = _dot_t(Q, Q)
            G2 = _dot(G, G)
            return _dot(Q, qa * eyem + qb * G + qc * G2)

        def cubic(_, Q):
            G = _dot_t(Q, Q)
            return 1.5 * Q - 0.5 * _dot(Q, G)

        def cubic_hi(_, Q):
            G = _dot_t(Q, Q, prec=hi)
            return 1.5 * Q - 0.5 * _dot(Q, G, prec=hi)

        Q = lax.fori_loop(0, _N_QUINTIC_POLAR, quintic, Q)
        Q = lax.fori_loop(0, _N_CUBIC_POLAR, cubic, Q)
        Q = lax.fori_loop(0, _N_CUBIC_POLAR_HI, cubic_hi, Q)
        return Q

    for k in range(m):
        a = a_ref[k, :, :]

        def level_body(_, carry):
            T, segc, segr = carry
            seg_eq = (segc == segr)
            seg_eqf = seg_eq.astype(dt)
            sizes_c = jnp.sum(seg_eqf, axis=1, keepdims=True
                              ).astype(jnp.int32)                  # (n,1)
            sizes_r = jnp.sum(seg_eqf, axis=0, keepdims=True
                              ).astype(jnp.int32)                  # (1,n)
            starts_c = jnp.sum((segr < segc).astype(dt), axis=1,
                               keepdims=True).astype(jnp.int32)
            starts_r = jnp.sum((segc < segr).astype(dt), axis=0,
                               keepdims=True).astype(jnp.int32)
            froz_c = sizes_c <= min_seg
            froz_r = sizes_r <= min_seg
            live = jnp.logical_not(froz_c | froz_r).astype(dt)

            dc = jnp.sum(T * eyem, axis=1, keepdims=True)          # (n,1)
            dr = jnp.sum(T * eyem, axis=0, keepdims=True)          # (1,n)
            # rank of position j's diagonal inside its segment: number of
            # segment members i with (d_i, i) < (d_j, j) (ties by index)
            lt2 = (dc < dr) | ((dc == dr) & (iot_r < iot_c))
            rank_r = jnp.sum(seg_eqf * lt2.astype(dt), axis=0,
                             keepdims=True).astype(jnp.int32)      # (1,n)
            lo_t = (sizes_c - 1) // 2
            hi_t = sizes_c // 2
            is_lo = seg_eqf * (rank_r == lo_t).astype(dt)
            is_hi = seg_eqf * (rank_r == hi_t).astype(dt)
            sigma = 0.5 * (jnp.sum(is_lo * dr, axis=1, keepdims=True)
                           + jnp.sum(is_hi * dr, axis=1, keepdims=True))

            C = T * seg_eqf - sigma * eyem
            col1 = jnp.sum(jnp.abs(C), axis=0, keepdims=True)      # (1,n)
            bound = jnp.max(seg_eqf * col1, axis=1, keepdims=True)  # (n,1)
            X = C / (1.01 * bound + jnp.asarray(1e-30, dt))

            E = msign(X, seg_eqf * live)
            P = 0.5 * (eyem * seg_eqf - E) * live
            pd_c = jnp.sum(P * eyem, axis=1, keepdims=True)        # (n,1)
            pd_r = jnp.sum(P * eyem, axis=0, keepdims=True)        # (1,n)
            tr_c = jnp.sum(seg_eqf * pd_r, axis=1, keepdims=True)  # (n,1)
            tr_r = jnp.sum(seg_eqf * pd_c, axis=0, keepdims=True)  # (1,n)
            r_c = jnp.clip(jnp.round(tr_c).astype(jnp.int32), 0, sizes_c)
            r_r = jnp.clip(jnp.round(tr_r).astype(jnp.int32), 0, sizes_r)
            low_c = ((icol - starts_c) < r_c) & jnp.logical_not(froz_c)
            low_r = ((irow - starts_r) < r_r) & jnp.logical_not(froz_r)

            fro_any = (froz_c | froz_r).astype(dt)
            omb = (fro_any * eyem + (1.0 - fro_any) * om) * seg_eqf
            POm = _dot(P, omb)
            # rank-safety blend — see spectral_dc.py at the Y
            # construction: a wrongly-rounded projector rank makes the
            # hard slot split rank-deficient and unorthogonalizable
            beta = jnp.asarray(_RANK_SAFE_BETA, dt)
            Y = ((1.0 - beta) * jnp.where(low_r, POm, omb - POm)
                 + beta * omb)
            coln = jnp.sqrt(jnp.sum(Y * Y, axis=0, keepdims=True))
            Y = Y / (coln + jnp.asarray(1e-20, dt))
            rsum_c = jnp.sum(jnp.abs(Y), axis=1, keepdims=True)    # (n,1)
            csum_r = jnp.sum(jnp.abs(Y), axis=0, keepdims=True)    # (1,n)
            # segmented maxes in the (1, n) orientation; the column-sum
            # max flips orientation twice through masked reduces (the
            # max is segment-constant, so the round trip is exact)
            rmax_r = jnp.max(seg_eqf * rsum_c, axis=0, keepdims=True)
            cmax_c = jnp.max(seg_eqf * csum_r, axis=1, keepdims=True)
            cmax_row = jnp.max(seg_eqf * cmax_c, axis=0, keepdims=True)
            scale_r = 1.01 * jnp.sqrt(rmax_r * cmax_row) \
                + jnp.asarray(1e-30, dt)
            Q = polar(Y / scale_r)

            for _ in range(refine):
                # subspace-refinement pass: re-project the orthonormal
                # basis through the projector (low slots through P, high
                # slots through I-P) and re-orthonormalize with a short
                # HIGHEST cubic polar.  polar(Y) of the ill-conditioned
                # probe leaks ~1e-3..1e-2 across the split (sigma_min
                # tail 1e-4..1e-5 + the beta blend); one re-projection
                # of the now well-conditioned Q collapses the deflated
                # leaf field from 3.6e3 pairs above 1e-4 to ZERO above
                # 1e-5 (measured, /tmp bisection 2026-08-20) — it fixes
                # CONDITIONING, which sign-ramp sharpening cannot.
                PQ = _dot(P, Q, prec=hi)
                low_row = low_r & jnp.logical_not(froz_r)
                Q = jnp.where(low_row, PQ, Q - PQ)
                # frozen segments keep their identity columns
                Q = jnp.where((froz_c | froz_r), eyem * seg_eqf, Q)
                coln = jnp.sqrt(jnp.sum(Q * Q, axis=0, keepdims=True))
                Q = Q / (coln + jnp.asarray(1e-20, dt))
                for _c in range(3):
                    G2 = _dot_t(Q, Q, prec=hi)
                    Q = 1.5 * Q - 0.5 * _dot(Q, G2, prec=hi)

            TQ = _dot(T, Q, prec=hi)
            T = _dot_t(Q, TQ, prec=hi)
            T = 0.5 * (T + _dot_t(T, eyem))
            if t_ref is not None:
                # export the full first-power conjugated matrix
                # T = Q^T A Q (last level's write wins): the deflated
                # eigh path solves exact diagonal T-blocks at leaf size
                # and its boundary stage needs the cross-segment
                # entries.  The carry is NOT masked between levels —
                # every in-level use already applies seg_eqf (the C
                # construction, the medians via diag) — so this export
                # is exact at ALL segment boundaries, including
                # coarser-level ones.
                t_ref[k, :, :] = T
            # accumulate the warm panel in the output ref instead of
            # carrying Q_tot: G0 <- Q^T G0 keeps the VMEM live set one
            # plane smaller (the n=704 budget is 8 planes total)
            g_ref[k, :, :] = _dot_t(Q, g_ref[k, :, :], prec=hi)
            segc = segc * 2 + jnp.where(low_c | froz_c, 0, 1)
            segr = segr * 2 + jnp.where(low_r | froz_r, 0, 1)
            return T, segc, segr

        seg0_c = jnp.zeros((n, 1), jnp.int32) + icol * 0
        seg0_r = jnp.zeros((1, n), jnp.int32) + irow * 0
        g_ref[k, :, :] = a
        T0 = 0.5 * (a + _dot_t(a, eyem))
        carry = (T0, seg0_c, seg0_r)
        _, segc_f, _ = lax.fori_loop(0, levels, level_body, carry)
        if seg_ref is not None:
            # final segment ids (column orientation): non-decreasing
            # along the index — slot assignment is contiguous per level
            # — so the deflated path recovers each segment's start/size
            # with two masked sums
            seg_ref[k, :, :] = segc_f


# ---------------------------------------------------------------------------
# Per-level variant for large n: one pallas_call per divide level, with the
# (T, G0) state carried through HBM between levels.  The single-shot kernel
# above holds ~10 live (n, n) planes through the whole level recursion and
# OOMs past npad ~ 560 (measured 34.9 MB requested at n=704 vs the ~16 MB
# VMEM); this variant caps the live set at 5 named workspaces + ~2
# transients (~13.9 MB at npad = 704) by
#   * streaming T/G0/om through `pl.ANY` (HBM) refs with explicit DMA —
#     no pipelined double-buffering of (n, n) blocks;
#   * a cubic-only Newton-Schulz *sign* schedule: the cubic map
#     x <- 1.5x - 0.5x^3 has no identity term, so it preserves exact
#     cross-segment zeros and frozen-segment zeros with NO per-step
#     masking and no materialized masked-identity plane (the quintic
#     needs `qa*I` added each step, which resurrects dead rows unless
#     re-masked).  Sign accuracy is rank-rounding grade only, so the
#     slower cubic ramp (12 fast + 2 HIGHEST steps) is enough: values
#     >= 0.01 of the segment bound saturate, the straddling tail stays
#     soft — exactly the tolerated soft-projector regime.
#   * the polar orthonormalization keeps the quintic ramp (orthogonality
#     IS accuracy-bearing for the G-invariant) at a ~7-plane peak.
# HBM traffic: 4 (n, n) planes per matrix per level (~1.2 ms total for
# B=8, n=704, 10 levels at ~800 GB/s) — noise next to the ~20 ms of VPU
# sweeps it saves.
_N_CUBIC_SIGN_LEAN = 12
_N_CUBIC_SIGN_LEAN_HI = 2
# The lean kernel keeps the STRONG rank-safety blend: its cubic-only
# sign is softer (rank-rounding-grade), and its n=704/768 range is
# where hard-split rank deficiency was actually observed.  The
# single-shot kernel (n <= 448 auto window) shares spectral_dc's
# smaller _RANK_SAFE_BETA — there the blend floor (cos ~ beta) was the
# dominant warm-sweep cost and failures were never observed (runtime
# guard in jacobi_eigh covers the residual risk).
_RANK_SAFE_BETA_LEAN = 0.02
_PER_LEVEL_MIN_N = 448  # auto threshold: the single-shot kernel's live
# set (~10 planes + the rank-safety blend's extra POm plane) measured
# 17.04 MB at n=512 against the compiler's 16 MB default scope (v5e OOM;
# raising vmem_limit_bytes only made the scheduler chase the larger
# budget — 25.3 MB requested at a 20 MB limit).  448 models to ~13.1 MB
# and fits; (448, 512] runs per-level (128-aligned, ~7.3 MB at 512)
_PER_LEVEL_MAX_N = 768  # largest hardware-validated size.  Measured
# live set is ~14 (n, n) f32 planes (v5e: 22.93 MB at n=640, 31.91 MB at
# n=768 — the compiler holds the named workspaces plus expression
# transients); the vmem scope below budgets 15 planes.  Physical VMEM is
# 128 MB/core, the 16 MB default is only the compiler's pipelining
# budget and this kernel owns the core.  The next admissible size, 896,
# would need ~48 MB and also exceeds the sweep kernel's own n<=848
# budget after 128-padding, so larger matrices run the cold sweep.
_PER_LEVEL_MAX_N_DEFAULT_SCOPE = 512  # largest n whose ~14-plane live
# set fits the compiler's default 16 MB scope — the cap when this JAX
# version exposes no pltpu CompilerParams to raise vmem_limit_bytes


def _per_level_vmem_bytes(n: int) -> int:
    """Scoped-VMEM budget for the per-level kernel: 16 (n, n) f32
    planes (measured 23.56 MiB at n=640 = 14.4 planes, so 15
    missed by 129 KiB; see _PER_LEVEL_MAX_N note), floored
    at 20 MB (the n=512 point was validated there)."""
    return max(20 * 1024 * 1024, 16 * n * n * 4)
_PER_LEVEL_ALIGN = 128


def _dc_level_kernel(segc_ref, segr_ref, om_hbm, t_hbm, g_hbm,
                     segc_out, segr_out, t_out, g_out,
                     t_v, g_v, w1, w2, sem, *, n: int, min_seg: int):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    b = pl.program_id(0)
    cp = pltpu.make_async_copy(t_hbm.at[b], t_v, sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(g_hbm.at[b], g_v, sem)
    cp.start()
    cp.wait()

    dt = t_v.dtype
    hi = lax.Precision.HIGHEST
    qa, qb, qc = (jnp.asarray(v, dt) for v in _QUINTIC)
    icol = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    irow = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def eyem():
        return (icol == irow).astype(dt)

    segc = segc_ref[0]                                          # (n, 1)
    segr = segr_ref[0]                                          # (1, n)
    seg_eq = segc == segr
    seg_eqf = seg_eq.astype(dt)
    sizes_c = jnp.sum(seg_eqf, axis=1, keepdims=True).astype(jnp.int32)
    sizes_r = jnp.sum(seg_eqf, axis=0, keepdims=True).astype(jnp.int32)
    starts_c = jnp.sum((segr < segc).astype(dt), axis=1,
                       keepdims=True).astype(jnp.int32)
    starts_r = jnp.sum((segc < segr).astype(dt), axis=0,
                       keepdims=True).astype(jnp.int32)
    froz_c = sizes_c <= min_seg
    froz_r = sizes_r <= min_seg
    live = jnp.logical_not(froz_c | froz_r).astype(dt)

    Tval = t_v[...]
    dc = jnp.sum(Tval * eyem(), axis=1, keepdims=True)          # (n, 1)
    dr = jnp.sum(Tval * eyem(), axis=0, keepdims=True)          # (1, n)
    lt2 = (dc < dr) | ((dc == dr) & (icol < irow))
    rank_r = jnp.sum(seg_eqf * lt2.astype(dt), axis=0,
                     keepdims=True).astype(jnp.int32)           # (1, n)
    lo_t = (sizes_c - 1) // 2
    hi_t = sizes_c // 2
    is_lo = seg_eqf * (rank_r == lo_t).astype(dt)
    is_hi = seg_eqf * (rank_r == hi_t).astype(dt)
    sigma = 0.5 * (jnp.sum(is_lo * dr, axis=1, keepdims=True)
                   + jnp.sum(is_hi * dr, axis=1, keepdims=True))

    C = Tval * seg_eqf - sigma * eyem()
    col1 = jnp.sum(jnp.abs(C), axis=0, keepdims=True)           # (1, n)
    bound = jnp.max(seg_eqf * col1, axis=1, keepdims=True)      # (n, 1)
    # frozen/dead rows start exactly zero (live mask) and the cubic map
    # keeps them zero — no per-step masking needed
    w1[...] = C * live / (1.01 * bound + jnp.asarray(1e-30, dt))

    def sign_cubic(_, c):
        w2[...] = _dot(w1[...], w1[...])
        w1[...] = 1.5 * w1[...] - 0.5 * _dot(w1[...], w2[...])
        return c

    def sign_cubic_hi(_, c):
        w2[...] = _dot(w1[...], w1[...], prec=hi)
        w1[...] = 1.5 * w1[...] - 0.5 * _dot(w1[...], w2[...], prec=hi)
        return c

    lax.fori_loop(0, _N_CUBIC_SIGN_LEAN, sign_cubic, 0)
    lax.fori_loop(0, _N_CUBIC_SIGN_LEAN_HI, sign_cubic_hi, 0)

    # P = (I - E)/2 on live segments; E = w1
    w1[...] = 0.5 * (eyem() * seg_eqf - w1[...]) * live
    pd_c = jnp.sum(w1[...] * eyem(), axis=1, keepdims=True)     # (n, 1)
    pd_r = jnp.sum(w1[...] * eyem(), axis=0, keepdims=True)     # (1, n)
    tr_c = jnp.sum(seg_eqf * pd_r, axis=1, keepdims=True)       # (n, 1)
    tr_r = jnp.sum(seg_eqf * pd_c, axis=0, keepdims=True)       # (1, n)
    r_c = jnp.clip(jnp.round(tr_c).astype(jnp.int32), 0, sizes_c)
    r_r = jnp.clip(jnp.round(tr_r).astype(jnp.int32), 0, sizes_r)
    low_c = ((icol - starts_c) < r_c) & jnp.logical_not(froz_c)
    low_r = ((irow - starts_r) < r_r) & jnp.logical_not(froz_r)

    cp = pltpu.make_async_copy(om_hbm, w2, sem)
    cp.start()
    cp.wait()
    fro_any = (froz_c | froz_r).astype(dt)
    w2[...] = (fro_any * eyem() + (1.0 - fro_any) * w2[...]) * seg_eqf
    POm = _dot(w1[...], w2[...])
    # rank-safety blend — see spectral_dc.py at the Y construction: a
    # wrongly-rounded projector rank makes the hard slot split
    # rank-deficient and unorthogonalizable (observed at n=704/768:
    # G-invariant error 1e-5..1e-3 vs the 8e-7 healthy floor)
    beta = jnp.asarray(_RANK_SAFE_BETA_LEAN, dt)
    w2[...] = ((1.0 - beta) * jnp.where(low_r, POm, w2[...] - POm)
               + beta * w2[...])                                # Y
    coln = jnp.sqrt(jnp.sum(w2[...] * w2[...], axis=0, keepdims=True))
    Y = w2[...] / (coln + jnp.asarray(1e-20, dt))
    rsum_c = jnp.sum(jnp.abs(Y), axis=1, keepdims=True)         # (n, 1)
    csum_r = jnp.sum(jnp.abs(Y), axis=0, keepdims=True)         # (1, n)
    rmax_r = jnp.max(seg_eqf * rsum_c, axis=0, keepdims=True)
    cmax_c = jnp.max(seg_eqf * csum_r, axis=1, keepdims=True)
    cmax_row = jnp.max(seg_eqf * cmax_c, axis=0, keepdims=True)
    scale_r = 1.01 * jnp.sqrt(rmax_r * cmax_row) + jnp.asarray(1e-30, dt)
    w2[...] = Y / scale_r

    def polar_quintic(_, c):
        w1[...] = _dot_t(w2[...], w2[...])
        w2[...] = _dot(w2[...], qa * eyem() + qb * w1[...]
                       + qc * _dot(w1[...], w1[...]))
        return c

    def polar_cubic(_, c):
        w1[...] = _dot_t(w2[...], w2[...])
        w2[...] = 1.5 * w2[...] - 0.5 * _dot(w2[...], w1[...])
        return c

    def polar_cubic_hi(_, c):
        w1[...] = _dot_t(w2[...], w2[...], prec=hi)
        w2[...] = 1.5 * w2[...] - 0.5 * _dot(w2[...], w1[...], prec=hi)
        return c

    lax.fori_loop(0, _N_QUINTIC_POLAR, polar_quintic, 0)
    lax.fori_loop(0, _N_CUBIC_POLAR, polar_cubic, 0)
    lax.fori_loop(0, _N_CUBIC_POLAR_HI, polar_cubic_hi, 0)

    # T <- Q^T T Q, symmetrize, mask to (old) blocks; Q = w2
    w1[...] = _dot(t_v[...], w2[...], prec=hi)                  # T Q
    t_v[...] = _dot_t(w2[...], w1[...], prec=hi)                # Q^T T Q
    w1[...] = _dot_t(t_v[...], eyem())                          # transpose
    t_v[...] = 0.5 * (t_v[...] + w1[...]) * seg_eqf
    w1[...] = _dot_t(w2[...], g_v[...], prec=hi)                # Q^T G0
    g_v[...] = w1[...]

    segc_out[0] = segc * 2 + jnp.where(low_c | froz_c, 0, 1)
    segr_out[0] = segr * 2 + jnp.where(low_r | froz_r, 0, 1)
    cp = pltpu.make_async_copy(t_v, t_out.at[b], sem)
    cp.start()
    cp.wait()
    cp = pltpu.make_async_copy(g_v, g_out.at[b], sem)
    cp.start()
    cp.wait()


def _dc_per_level(a: jnp.ndarray, om: jnp.ndarray, levels: int,
                  min_seg: int, interpret: bool) -> jnp.ndarray:
    """vmap-safe entry: the level kernel indexes HBM refs with
    ``pl.program_id(0)`` by hand (``.at[b]`` DMA), and Pallas's batching
    rule prepends the vmap axis to the grid — which would silently remap
    ``program_id(0)`` to the vmap index.  A custom_vmap rule folds the
    vmap axis into the batch axis instead (the kernel is one independent
    matrix per program, so flattening is exact)."""

    @jax.custom_batching.custom_vmap
    def run(a, om):
        return _dc_per_level_impl(a, om, levels, min_seg, interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, a, om):  # noqa: ANN001
        a_b, om_b = in_batched
        if not a_b:
            a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        if om_b:
            # om is a shared (n, n) probe; all batch members use row 0
            om = om[0]
        out = run(a.reshape((-1,) + a.shape[-2:]), om)
        return out.reshape((axis_size, -1) + out.shape[-2:]), True

    return run(a, om)


def _dc_per_level_impl(a: jnp.ndarray, om: jnp.ndarray, levels: int,
                       min_seg: int, interpret: bool) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = a.shape
    dt = a.dtype
    T = 0.5 * (a + jnp.swapaxes(a, -1, -2))
    g = a
    segc = jnp.zeros((B, n, 1), jnp.int32)
    segr = jnp.zeros((B, 1, n), jnp.int32)

    extra = {}
    if not interpret:
        _Params = getattr(pltpu, "CompilerParams",
                          getattr(pltpu, "TPUCompilerParams", None))
        if _Params is not None:
            # npad=768 holds ~16.5 MB live against the compiler's 16 MB
            # *default* pipelining budget; this kernel owns the core, so
            # raise the scope (physical VMEM is much larger)
            extra["compiler_params"] = _Params(
                vmem_limit_bytes=_per_level_vmem_bytes(n))
        elif n > _PER_LEVEL_MAX_N_DEFAULT_SCOPE:
            # without CompilerParams the kernel compiles against the 16 MB
            # default scope and n in (704, 768] fails deep inside Mosaic
            # with an opaque VMEM error — fail early and clearly instead
            raise RuntimeError(
                "dc_precondition_tpu: n=%d needs vmem_limit_bytes raised "
                "above the compiler's 16 MB default scope, but this JAX "
                "version exposes no pltpu.CompilerParams/TPUCompilerParams "
                "— only n <= %d is supported here (use precondition=False "
                "on the jacobi_eigh call)"
                % (n, _PER_LEVEL_MAX_N_DEFAULT_SCOPE))
    kernel = functools.partial(_dc_level_kernel, n=n, min_seg=min_seg)
    call = pl.pallas_call(
        kernel,
        grid=(B,),
        **extra,
        in_specs=[
            pl.BlockSpec((1, n, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, n, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((B, n, n), dt),
            jax.ShapeDtypeStruct((B, n, n), dt),
        ],
        scratch_shapes=[pltpu.VMEM((n, n), dt)] * 4
        + [pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )
    for _ in range(levels):
        segc, segr, T, g = call(segc, segr, om, T, g)
    return g


def dc_precondition_tpu(a: jnp.ndarray, *, levels: int = 8,
                        min_seg: int = 2,
                        interpret: bool = False,
                        per_level: Optional[bool] = None,
                        return_t: bool = False,
                        return_seg: bool = False,
                        refine: int = 0):
    """``G0 = Q^T a`` warm-start panels for (B, n, n) symmetric ``a``
    (the Jacobi caller passes the shifted, padded matrix).

    ``per_level`` (default: auto — n > 512) streams the level recursion
    through HBM one level per kernel launch, fitting VMEM for
    512 < n <= 1024; the single-shot kernel is faster below that.

    ``return_t`` additionally returns the first-power conjugated matrix
    ``T = Q^T a Q`` from the final level (for the deflated eigh path,
    which solves exact diagonal T-blocks at leaf size — the panel's own
    Gram is ``T^2``, whose diagonal blocks carry O(delta^2) cross-term
    contamination).  The level carry is never masked, so the export is
    exact at all segment boundaries.  ``return_seg`` additionally
    returns the final (B, n, 1) int32 segment ids (non-decreasing along
    the index) — the deflated path's leaf windows must be SEGMENT-
    ALIGNED because median-rank drift makes boundary positions
    data-dependent (measured 91/65/56/44 at n=256 against the nominal
    64s).  Outputs are ordered ``(g, [t], [seg])``.

    ``refine`` (default 0) runs that many subspace-refinement passes
    per level: re-project the polar-orthonormalized basis through the
    spectral projector and re-orthonormalize (HIGHEST cubic polar).
    One pass collapses the deflated leaf field's cross-segment leakage
    from ~1e-3..1e-2 (the ill-conditioned probe+polar extraction) to
    ~1e-7 — see the kernel comment.  Single-shot kernel only for all
    three options."""
    from jax.experimental import pallas as pl

    B, n, _ = a.shape
    om = jax.random.normal(jax.random.PRNGKey(1803), (n, n), a.dtype)
    if per_level is None:
        per_level = n > _PER_LEVEL_MIN_N
    if (return_t or return_seg or refine) and per_level:
        raise ValueError(
            "dc_precondition_tpu: return_t/return_seg/refine are only "
            "supported on the single-shot kernel (n <= %d); the "
            "per-level kernel streams its carry through HBM"
            % _PER_LEVEL_MIN_N)
    if per_level:
        if n > _PER_LEVEL_MAX_N and not interpret:
            raise ValueError(
                "dc_precondition_tpu per-level kernel supports n <= %d "
                "(VMEM: ~14 live (n, n) planes; %d would need %.1f MB). "
                "NOTE: n here is the matrix as passed in — jacobi_eigh "
                "pads to a 128-lane boundary before calling, so a user-"
                "level n above %d lands here oversized.  Run the Jacobi "
                "kernel unpreconditioned (precondition=False) for "
                "matrices this large."
                % (_PER_LEVEL_MAX_N, n, 15 * n * n * 4 / 1e6,
                   _PER_LEVEL_MAX_N))
        if n % _PER_LEVEL_ALIGN != 0 and not interpret:
            raise ValueError(
                "dc_precondition_tpu per-level kernel requires n to be a "
                "multiple of %d on hardware (manual HBM DMA slices must "
                "be lane-aligned; Mosaic rejects a %d-wide memref_slice) "
                "— pad the matrix to the next %d boundary first, as "
                "jacobi_eigh does automatically on its preconditioned "
                "path" % (_PER_LEVEL_ALIGN, n, _PER_LEVEL_ALIGN))
        return _dc_per_level(a, om, levels, min_seg, interpret)

    # one matrix per program: the level loop is a long dependent matmul
    # chain, so stacking does not grow op sizes (unlike the sweep
    # kernel); m > 1 would only raise VMEM pressure
    m = 1

    try:
        from jax.experimental.pallas import tpu as pltpu
        memspace = pltpu.VMEM
    except ImportError:  # pragma: no cover
        memspace = None

    def spec(block, imap):
        kwargs = {"index_map": imap}
        if memspace is not None:
            kwargs["memory_space"] = memspace
        return pl.BlockSpec(block, **kwargs)

    def kernel(a_ref, om_ref, *out_refs):
        g_ref = out_refs[0]
        t_ref = out_refs[1] if return_t else None
        seg_ref = out_refs[-1] if return_seg else None
        _dc_kernel(a_ref, om_ref, g_ref, t_ref, seg_ref, n=n, m=m,
                   levels=levels, min_seg=min_seg, refine=refine)

    out_specs = [spec((m, n, n), lambda b: (b, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, n, n), a.dtype)]
    if return_t:
        out_specs.append(spec((m, n, n), lambda b: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, n, n), a.dtype))
    if return_seg:
        out_specs.append(spec((m, n, 1), lambda b: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, n, 1), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(B // m,),
        in_specs=[spec((m, n, n), lambda b: (b, 0, 0)),
                  spec((n, n), lambda b: (0, 0))],
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
    )(a, om)
    return out
