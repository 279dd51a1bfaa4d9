"""EXPERIMENTAL LAB — rejected warm-panel finisher prototypes, plus the
concluded DC-deflation machinery behind the opt-in
``jacobi_eigh(deflate=True)`` path.

Only ``deflated_panel`` / ``deflate_refine`` (bottom section) are
reachable from public code — the slower-than-default opt-in deflate
route imports them lazily and its tests keep them green.  Everything
ELSE here is on no shipped code path.  The prototypes are the
round-3 finisher families probed on v5e hardware against the DC-warmed
Jacobi eigh chain (ops/jacobi_eigh.py) and REJECTED; they are preserved
because their docstrings and the measured conclusions in
benchmarks/FINISHER_NOTES.md record why each design point loses, so the
same ground is not re-plowed.  The shipped warm path uses only
``jacobi_eigh._rot_correct`` + ``jacobi_eigh._guard_warm_start``.

Probe drivers: benchmarks/angle_probe.py, benchmarks/block_rr_probe.py,
benchmarks/rot_correct_probe.py.  Interpret-mode correctness tests live
in tests/test_jacobi_eigh.py (they pin the algebraic invariants so the
lab stays runnable, not because anything ships).

Summary of the measured verdicts (details: benchmarks/FINISHER_NOTES.md):

* ``_angle_correct`` (all-pairs exact-angle parallel Jacobi on the MXU):
  well-gapped fields contract, but DC cluster couplings make the
  simultaneous update interfere at O(1) (||K||_2 ~ 1.8 measured) — the
  damping that keeps polar(I+K) convergent then stalls the whole pass.
* ``_match_correct`` (disjoint mutual-strongest Givens matching): exact
  and interference-free, but resolves only one coupling per row per
  pass — clusters need many passes and each pays a full HIGHEST Gram.
* ``_angle_correct_win`` (windowed T-space variant): cheap passes, but
  inherits _angle_correct's cluster stall inside windows.
* ``_block_rr`` (blocked Rayleigh-Ritz via XLA batched small eigh):
  correct, but the batched (2w, 2w) XLA eigh detour measured ~31 ms at
  B=64, n=256 — more than the sweeps it saves.
* ``_windowed_local`` (sweep kernel on (2w, n) row windows): window
  rows are full-length n, so each stage still pays ~half a global sweep.
* ``_gram_windowed`` (sweep kernel on (2w, 2w) window Grams): the small
  kernel runs at 64/128 lane occupancy and per-window dispatch overhead
  dominates — measured ~15 ms vs the ~8 ms sweep it replaces.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .jacobi_eigh import _pallas_g_panel

__all__ = ["_angle_correct", "_match_correct", "_angle_correct_win",
           "_block_rr", "_windowed_local", "_gram_windowed"]


def _angle_correct(g0: jnp.ndarray, passes: int = 3,
                   theta_max: float = 0.3, kmax: float = 0.6,
                   ns_steps: int = 4, mode: str = "drop") -> jnp.ndarray:
    """Exact-angle parallel Jacobi correction of a warm panel — all-pairs
    rotation angles extracted from the full Gram on the MXU, iterated.

    Like ``_rot_correct`` but with the EXACT pairwise Jacobi rotation
    (the classical stable tangent ``t = sign(tau) / (|tau| + sqrt(1 +
    tau^2))``, ``tau = (t_j - t_i) / (2 T_ij)``) instead of the clipped
    first-order ``E_ij = T_ij / (t_j - t_i)``: near-degenerate pairs —
    the ones first-order correction must clip out and the windowed
    local solvers (``_block_rr``/``_windowed_local``/``_gram_windowed``)
    were built to chase — get their bounded ``|theta| <= pi/4`` rotation
    instead of being skipped, so ONE correction primitive covers every
    pair at every index distance.  Rows are sorted ascending by norm
    first (norm = shifted eigenvalue estimate) so ``t_j >= t_i`` for
    ``j > i`` keeps the principal angle in ``[-pi/4, pi/4]``.

    All angles are applied SIMULTANEOUSLY as ``R = polar(I + K)`` with
    ``K`` the skew matrix from the strict upper triangle: an isolated
    pair is killed to ``O(theta^3)`` (polar(I+K) = exp(K) + O(K^3) for
    skew K), while overlapping rotations inside a near-degenerate
    cluster interfere at second order and contract across passes — this
    is a damped parallel (all-pairs) Jacobi iteration.  ``||K||_F`` is
    clamped to ``kmax`` per matrix so the 3 Newton-Schulz polar steps
    stay inside their convergence region (``sigma(I + K) <= sqrt(1 +
    ||K||_2^2)`` must stay well under sqrt(3)); damping slows a
    pathological cluster, never breaks it — R is orthogonal to f32
    rounding either way, the sweep kernel's G-invariant survives, and
    the downstream ``_guard_warm_start`` + cold fallback still certify
    the chain end-to-end.

    Cost: ``9 * passes`` batched (n, n) HIGHEST matmuls plus one atan2
    field — ~1.4 ms per pass at B=64, n=256 on a v5e, vs ~8 ms per VPU
    sweep it saves and ~15 ms for the Gram-windowed local solve it
    replaces (the small-row Pallas kernel there runs the VPU at 64/128
    lane occupancy; this stays on the MXU).
    """
    hi = jax.lax.Precision.HIGHEST
    n = g0.shape[-1]
    dt = g0.dtype
    eye = jnp.eye(n, dtype=dt)
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    upper = cols > rows
    tiny = jnp.asarray(jnp.finfo(dt).tiny * 16, dt)
    tmax = jnp.asarray(theta_max, dt)
    for _ in range(passes):
        # re-sort EVERY pass: large rotations change row norms, and the
        # principal-angle bound |theta| <= pi/4 needs t_j >= t_i on the
        # upper triangle — without it atan2's branch hands back ~pi/2
        # row swaps that oscillate instead of contracting
        t0 = jnp.sum(g0 * g0, axis=-1)
        idx = jnp.argsort(t0, axis=-1)
        g0 = jnp.take_along_axis(g0, idx[..., None], axis=-2)
        T = jnp.matmul(g0, jnp.swapaxes(g0, -2, -1), precision=hi)
        t = jnp.diagonal(T, axis1=-2, axis2=-1)
        denom = t[..., None, :] - t[..., :, None]           # t_j - t_i
        # classical stable Jacobi tangent: tau = (t_j - t_i) / (2 T_ij),
        # tan(theta) = sign(tau) / (|tau| + sqrt(1 + tau^2)) — pure f32
        # arithmetic.  NOT atan2: the TPU VPU's atan2 is a fast
        # approximation whose ~1e-3 rad angle noise re-injects cos^2 ~
        # 1e-6 mixing into an already-converged panel (measured on v5e:
        # post-pass LIFTED kernel-exit mixing 1.3e-10 -> 2e-7).  tan
        # overshoots the angle by O(theta^3) under the small-angle map
        # R = I + K, which the next pass absorbs.
        live = jnp.abs(T) > tiny
        tau = denom / jnp.where(live, 2.0 * T, jnp.asarray(1.0, dt))
        theta = jnp.where(
            live,
            jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
            jnp.asarray(0.0, dt))
        # sign(0)=0 would drop the valid theta=pi/4 rotation of an
        # exactly-degenerate coupled pair (tau=0); restore it
        theta = jnp.where(live & (tau == 0.0), jnp.asarray(1.0, dt), theta)
        # big angles = near-degenerate pairs.  mode="drop" (default)
        # ZEROES them: their mixing is gauge-invisible anyway (a
        # near-degenerate pair at internal rotation phi shows cos ~ phi
        # * relgap, tiny) and keeping them — even clipped — dominates
        # ||K||_2 and triggers the damping that strangles the whole
        # pass (hardware-measured on a v5e DC(2,8) panel: clip-mode
        # scale ~0.3 stalled the well-gapped field at cos^2 ~1e-6;
        # the true stubborn pairs had relgap ~0.1 and theta ~1e-2).
        # mode="clip" keeps a theta_max step toward resolving them —
        # useful when the panel is far from converged.
        if mode == "drop":
            theta = jnp.where(jnp.abs(theta) > tmax,
                              jnp.asarray(0.0, dt), theta)
        else:
            theta = jnp.clip(theta, -tmax, tmax)
        theta = jnp.where(upper, theta, jnp.asarray(0.0, dt))
        K = theta - jnp.swapaxes(theta, -2, -1)
        # per-matrix spectral-norm estimate of K (3 power steps on
        # -K^2 from a fixed dense start; x1.25 margin for estimate
        # error).  The F-norm is useless here: a dense field of 32k
        # incoherent ~1e-2 angles has ||K||_F ~ 4 but ||K||_2 ~ 0.1,
        # and F-damping froze exactly the batches this pass exists for
        v = jnp.ones((n, 1), dt) + 0.5 * jnp.sin(
            jnp.arange(n, dtype=dt))[:, None]
        v = jnp.broadcast_to(v, K.shape[:-2] + (n, 1))
        for _p in range(3):
            v = jnp.matmul(K, jnp.matmul(K, v, precision=hi), precision=hi)
            v = -v / jnp.maximum(
                jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True)), tiny)
        kv = jnp.matmul(K, v, precision=hi)
        knorm = 1.25 * jnp.sqrt(jnp.sum(kv * kv, axis=(-2, -1)))[
            ..., None, None]
        scale = jnp.minimum(jnp.asarray(1.0, dt),
                            jnp.asarray(kmax, dt) / jnp.maximum(knorm, tiny))
        R = eye + scale * K
        for _ns in range(ns_steps):
            RtR = jnp.matmul(jnp.swapaxes(R, -2, -1), R, precision=hi)
            R = jnp.matmul(R, 1.5 * eye - 0.5 * RtR, precision=hi)
        g0 = jnp.matmul(jnp.swapaxes(R, -2, -1), g0, precision=hi)
    return g0


def _match_correct(g0: jnp.ndarray, passes: int = 4,
                   theta_floor: float = 5e-3,
                   cos2_floor: Optional[float] = None) -> jnp.ndarray:
    """Matched exact-Givens correction: per pass, rotate only a MATCHING
    of mutually-strongest pairs — disjoint 2x2 rotations, so there is NO
    simultaneous-update interference, no clipping, no damping, and no
    Newton-Schulz polish: R is a direct sum of exact Givens rotations
    (c^2 + s^2 = 1 to rounding) and the panel's G-invariant is preserved
    by construction.

    This is the piece the all-pairs ``_angle_correct`` cannot do: the DC
    preconditioner's *clusters* (hardware-measured ``||K||_2 ~ 1.8`` on a
    v5e DC(2,8) Wishart panel — boundary smearing + the rank-safety
    blend) make the simultaneous update interfere at O(1), so it stalls
    at ~3x contraction per pass even in f64 (measured).  A matching
    resolves each cluster like a tournament: every pass exactly zeroes
    the strongest coupling of every row that agrees with its partner.

    Pair selection: per row, the largest ``|theta|`` partner (stable
    Jacobi tangent); kept when the choice is mutual and above
    ``theta_floor`` AND above the pair-cosine noise floor
    ``cos2_floor`` (default ``(4 eps sqrt(n))^2``, the sweep kernel's
    own reachable floor — rotating by noise-driven angles between
    converged near-degenerate rows is pointless).  Cost per pass: one
    HIGHEST Gram + one structured-R apply (2 batched matmuls) +
    elementwise — ~0.4 ms at B=64, n=256.
    """
    hi = jax.lax.Precision.HIGHEST
    n = g0.shape[-1]
    dt = g0.dtype
    if cos2_floor is None:
        cf = float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(n)
        cos2_floor = cf * cf
    eye = jnp.eye(n, dtype=dt)
    iot = jnp.arange(n)
    tiny = jnp.asarray(jnp.finfo(dt).tiny * 16, dt)
    for _ in range(passes):
        T = jnp.matmul(g0, jnp.swapaxes(g0, -2, -1), precision=hi)
        t = jnp.diagonal(T, axis1=-2, axis2=-1)
        denom = t[..., None, :] - t[..., :, None]           # t_j - t_i
        live = jnp.abs(T) > tiny
        tau = denom / jnp.where(live, 2.0 * T, jnp.asarray(1.0, dt))
        theta = jnp.where(
            live,
            jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
            jnp.asarray(0.0, dt))
        # exactly-degenerate coupled pair (tau = 0): restore the valid
        # theta = pi/4 rotation ANTISYMMETRICALLY (+1 upper / -1 lower;
        # a symmetric +1 would build a singular [[c,s],[s,c]] block)
        sgn = jnp.where(
            lax.broadcasted_iota(jnp.int32, (n, n), 1)
            > lax.broadcasted_iota(jnp.int32, (n, n), 0),
            jnp.asarray(1.0, dt), jnp.asarray(-1.0, dt))
        theta = jnp.where(live & (tau == 0.0), sgn, theta)
        # elsewhere the tangent field is antisymmetric already
        # (tau_ji = -tau_ij)
        cos2 = T * T / jnp.maximum(
            t[..., :, None] * t[..., None, :], tiny)
        w = jnp.abs(theta)
        w = jnp.where((w > theta_floor) & (cos2 > cos2_floor), w, 0.0)
        w = w * (1.0 - eye)
        jb = jnp.argmax(w, axis=-1)                         # (B, n)
        best = jnp.take_along_axis(w, jb[..., None], axis=-1)[..., 0]
        part_of_jb = jnp.take_along_axis(jb, jb, axis=-1)   # jb[jb[i]]
        matched = (part_of_jb == iot[None, :]) & (best > 0.0)
        tan = jnp.take_along_axis(theta, jb[..., None], axis=-1)[..., 0]
        tan = jnp.where(matched, tan, jnp.asarray(0.0, dt))
        c = 1.0 / jnp.sqrt(1.0 + tan * tan)
        s = tan * c
        P = jax.nn.one_hot(jb, n, dtype=dt) * matched[..., None].astype(dt)
        R = c[..., :, None] * eye + s[..., :, None] * P
        g0 = jnp.matmul(jnp.swapaxes(R, -2, -1), g0, precision=hi)
    return g0


def _angle_correct_win(p: jnp.ndarray, bs: int = 64, passes: int = 8,
                       theta_max: float = 0.4, kmax: float = 0.6,
                       ns_steps: int = 3) -> jnp.ndarray:
    """Windowed T-space variant of ``_angle_correct``: the parallel
    exact-angle Jacobi iteration restricted to aligned ``bs``-row
    windows of the (row-norm-sorted) warm panel, with the Gram formed
    ONCE per window and the accumulated rotation applied back in one
    matmul.

    Rationale: a shallow DC stop leaves DENSE O(1) mixing only *inside*
    its min_seg segments, which are aligned power-of-two index ranges —
    after the norm sort they sit whole inside an aligned ``bs`` window
    (segments <= bs).  Iterating in window-Gram space makes each pass
    ``(n/bs)^2``-times cheaper than a full-size pass (64x at n=256,
    bs=64), so the many damped passes that dense in-segment mixing
    needs cost ~0.2 ms each instead of ~1.4 ms.  Between-window
    couplings are small-angle by construction and are left for one or
    two full-size ``_angle_correct`` passes after this.

    Per pass, inside each window: re-sort rows by the Gram diagonal
    (principal-angle bound), extract clipped exact angles, damp by a
    spectral-norm estimate, Newton-Schulz-orthogonalize ``R = I + K``,
    update ``T <- R^T T R`` and accumulate ``W <- W R``.  W is
    orthogonal to f32 rounding, so the panel's G-invariant survives and
    the downstream guard still certifies the chain.
    """
    hi = jax.lax.Precision.HIGHEST
    B, n, _ = p.shape
    dt = p.dtype
    if n < bs or n % bs:
        return _angle_correct(p, passes=min(passes, 4),
                              theta_max=theta_max, kmax=kmax,
                              ns_steps=ns_steps)
    t0 = jnp.sum(p * p, axis=-1)
    idx = jnp.argsort(t0, axis=-1)
    p = jnp.take_along_axis(p, idx[..., None], axis=-2)
    nb = n // bs
    core = p.reshape(B * nb, bs, n)
    T = jnp.matmul(core, jnp.swapaxes(core, -2, -1), precision=hi)
    eye = jnp.eye(bs, dtype=dt)
    rows = lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cols = lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    upper = cols > rows
    tiny = jnp.asarray(jnp.finfo(dt).tiny * 16, dt)
    tmax = jnp.asarray(theta_max, dt)
    W = jnp.broadcast_to(eye, T.shape)
    for _ in range(passes):
        t = jnp.diagonal(T, axis1=-2, axis2=-1)
        order = jnp.argsort(t, axis=-1)
        T = jnp.take_along_axis(T, order[..., None], axis=-2)
        T = jnp.take_along_axis(T, order[..., None, :], axis=-1)
        W = jnp.take_along_axis(W, order[..., None, :], axis=-1)
        t = jnp.diagonal(T, axis1=-2, axis2=-1)
        denom = t[..., None, :] - t[..., :, None]
        # stable Jacobi tangent, not atan2 — see _angle_correct
        live = jnp.abs(T) > tiny
        tau = denom / jnp.where(live, 2.0 * T, jnp.asarray(1.0, dt))
        theta = jnp.where(
            live,
            jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
            jnp.asarray(0.0, dt))
        theta = jnp.where(live & (tau == 0.0), jnp.asarray(1.0, dt), theta)
        theta = jnp.clip(theta, -tmax, tmax)
        theta = jnp.where(upper, theta, jnp.asarray(0.0, dt))
        K = theta - jnp.swapaxes(theta, -2, -1)
        v = jnp.ones((bs, 1), dt) + 0.5 * jnp.sin(
            jnp.arange(bs, dtype=dt))[:, None]
        v = jnp.broadcast_to(v, K.shape[:-2] + (bs, 1))
        for _pw in range(3):
            v = jnp.matmul(K, jnp.matmul(K, v, precision=hi), precision=hi)
            v = -v / jnp.maximum(
                jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True)), tiny)
        kv = jnp.matmul(K, v, precision=hi)
        knorm = 1.25 * jnp.sqrt(jnp.sum(kv * kv, axis=(-2, -1)))[
            ..., None, None]
        scale = jnp.minimum(jnp.asarray(1.0, dt),
                            jnp.asarray(kmax, dt) / jnp.maximum(knorm, tiny))
        R = eye + scale * K
        for _ns in range(ns_steps):
            RtR = jnp.matmul(jnp.swapaxes(R, -2, -1), R, precision=hi)
            R = jnp.matmul(R, 1.5 * eye - 0.5 * RtR, precision=hi)
        T = jnp.matmul(jnp.swapaxes(R, -2, -1),
                       jnp.matmul(T, R, precision=hi), precision=hi)
        W = jnp.matmul(W, R, precision=hi)
    core = jnp.matmul(jnp.swapaxes(W, -2, -1), core, precision=hi)
    return core.reshape(B, n, n)


def _block_rr(p: jnp.ndarray, width: int = 16, stages: int = 2
              ) -> jnp.ndarray:
    """Blocked Rayleigh-Ritz finisher for a warm panel — batched small
    ``eigh`` on diagonal Gram blocks, killing the *near-degenerate*
    couplings that first-order correction must clip and that cost the
    Jacobi finisher its remaining sweeps (quadratic convergence has a
    1/gap constant, so clustered pairs converge slowest).

    The warm panel is ``P = Q^T A_shift`` with rows ``p_i = A q_i`` and
    ``T = P P^T = Q^T A^2 Q`` nearly diagonal.  The DC preconditioner's
    segment tree keeps spectral halves contiguous, so after sorting rows
    by norm (= shifted eigenvalue estimate) the leftover couplings are
    *index-local* (measured: q99 of the live-pair |i-j| distance is
    small).  Two offset stages of exact ``2*width``-block Rayleigh-Ritz
    then solve every local cluster: stage 0 diagonalizes blocks
    ``[0:2w], [2w:4w], ...`` of T, stage 1 the ``w``-offset blocks
    covering pairs that straddle stage-0 boundaries.

    Each block update is ``P_blk <- V^T P_blk`` with ``V`` from
    ``eigh(T_blk)`` — orthogonal to f32 rounding, so the sweep kernel's
    G-invariant is preserved EXACTLY (``P^T P`` is untouched by
    orthogonal row mixing) and the orthogonality guard downstream still
    certifies the whole chain; a failed block costs sweeps, never
    correctness.  Conditioning: rows are sorted, so each block spans a
    narrow eigenvalue window and ``T_blk`` is well-conditioned — the
    eps*kappa direction noise of small-eigenvalue eigh never triggers.

    Cost: 2 sorts + per stage one (2w, n) x (n, 2w) Gram einsum, one
    batched (2w, 2w) eigh, one (2w, 2w) x (2w, n) apply — all MXU work,
    ~1-3 ms at B=64, n=256 vs ~8 ms per VPU sweep saved.
    """
    hi = jax.lax.Precision.HIGHEST
    B, n, _ = p.shape
    bs = 2 * width
    if n < bs:
        return p
    t = jnp.sum(p * p, axis=-1)
    idx = jnp.argsort(t, axis=-1)
    p = jnp.take_along_axis(p, idx[..., None], axis=-2)
    for s in range(stages):
        off = width * (s % 2)
        nb = (n - off) // bs
        if nb == 0:
            continue
        core = lax.dynamic_slice_in_dim(p, off, nb * bs, axis=1)
        core = core.reshape(B, nb, bs, n)
        T = jnp.einsum("bkin,bkjn->bkij", core, core, precision=hi)
        _, V = jnp.linalg.eigh(T)
        core = jnp.einsum("bkij,bkin->bkjn", V, core, precision=hi)
        p = lax.dynamic_update_slice_in_dim(
            p, core.reshape(B, nb * bs, n), off, axis=1)
    return p


def _windowed_local(p: jnp.ndarray, tol: float, interpret: bool,
                    width: int = 16, max_sweeps: int = 12) -> jnp.ndarray:
    """Windowed local Hestenes phase: orthogonalize the rows of every
    ``2*width``-row window of the (row-norm-sorted) warm panel with the
    SAME Pallas sweep kernel, run on a reshaped (B*k, 2w, n) view.

    Rationale: after the DC preconditioner the slow-converging couplings
    are between near-degenerate eigenvalue pairs, which after sorting
    rows by norm are *index-local*; a full VPU sweep pays the whole
    n(n-1)/2 tournament for them.  A window sweep costs only
    ``(2w-1)*w*(n/2w) / (n(n-1)/2) ~ w/n`` of a global sweep (12% at
    w=16, n=256), and orthogonalizing each window's rows IS the exact
    block Rayleigh-Ritz solve of its Gram block (same fixed point:
    rows orthogonal <=> the 2w x 2w Gram diagonalized) — without the
    ~31 ms XLA batched small-eigh detour (measured B=64, n=256).

    Two offset stages: stage 0 windows ``[0:2w], [2w:4w], ...``, stage 1
    offset by ``w`` — any pair within index distance ``w`` lies whole in
    some window of one stage (boundaries of the two grids alternate
    every w).  Row mixing within a window is orthogonal, so the panel's
    G-invariant is preserved exactly and the downstream guard still
    certifies the chain end-to-end.
    """
    B, n, _ = p.shape
    bs = 2 * width
    if n < 2 * bs:
        return p
    t = jnp.sum(p * p, axis=-1)
    idx = jnp.argsort(t, axis=-1)
    p = jnp.take_along_axis(p, idx[..., None], axis=-2)
    for s in range(2):
        off = width * (s % 2)
        nb = (n - off) // bs
        if nb == 0:
            continue
        core = lax.dynamic_slice_in_dim(p, off, nb * bs, axis=1)
        core = core.reshape(B * nb, bs, n)
        core = _pallas_g_panel(core, max_sweeps, tol, interpret,
                               complexpair=False, m_cap=64)
        p = lax.dynamic_update_slice_in_dim(
            p, core.reshape(B, nb * bs, n), off, axis=1)
    return p


def _gram_windowed(p: jnp.ndarray, tol: float, interpret: bool,
                   width: int = 32, stages: int = 2,
                   max_sweeps: int = 12) -> jnp.ndarray:
    """Gram-windowed local solve: diagonalize every ``2*width``-row
    window of the (row-norm-sorted) warm panel through its ``2w x 2w``
    Gram matrix instead of sweeping the ``2w x n`` rows directly.

    Same fixed point as ``_windowed_local`` (rows of a window orthogonal
    <=> its Gram diagonalized), but the VPU work shrinks by ``n / 2w``
    (4x at n=256, w=32): the Pallas sweep kernel runs on ``(B*k, 2w,
    2w)`` Gram blocks — rows of length 2w, not n — and the recovered
    rotation is applied back to the window with ONE batched MXU matmul.
    The Gram forms and applies are MXU-cheap; the eigenvector rows come
    out of the small kernel's own G panel (row i of ``G = V^T T`` is
    ``mu_i v_i^T``, the same G-only extraction the main kernel uses).

    The applied mixing must be orthogonal to ~1e-6 or the chain fails
    the downstream ``_guard_warm_start`` rtol (5e-6): normalized G rows
    are only pairwise-orthogonal to the small kernel's exit tolerance,
    so two Newton-Schulz row-orthonormalization steps polish ``V V^T -
    I`` from ~1e-5 to f32 rounding before the apply.  A failed window
    solve therefore costs finisher sweeps, never correctness.

    Gram conditioning: the window Gram is ``T = W W^T`` with eigenvalues
    ``lambda_shifted^2 > 0`` (the caller's panel is ``Q^T A_shift`` with
    SPD ``A_shift``), so rows of G never vanish; squaring the condition
    number only affects *which* rotation the small solve finds within a
    near-degenerate cluster — any orthogonal choice is equally valid for
    the warm start.
    """
    hi = jax.lax.Precision.HIGHEST
    B, n, _ = p.shape
    dt = p.dtype
    bs = 2 * width
    if n < bs:
        return p
    t = jnp.sum(p * p, axis=-1)
    idx = jnp.argsort(t, axis=-1)
    p = jnp.take_along_axis(p, idx[..., None], axis=-2)
    tol_s = float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(bs)
    for s in range(stages):
        off = width * (s % 2)
        nb = (n - off) // bs
        if nb == 0:
            continue
        core = lax.dynamic_slice_in_dim(p, off, nb * bs, axis=1)
        core = core.reshape(B * nb, bs, n)
        T = jnp.einsum("bin,bjn->bij", core, core, precision=hi)
        G = _pallas_g_panel(T, max_sweeps, tol_s, interpret,
                            complexpair=False, m_cap=64)
        nrm = jnp.sqrt(jnp.sum(G * G, axis=-1, keepdims=True))
        V = G / jnp.maximum(nrm, jnp.asarray(jnp.finfo(dt).tiny * 16, dt))
        for _ns in range(2):
            VVt = jnp.matmul(V, jnp.swapaxes(V, -2, -1), precision=hi)
            V = 1.5 * V - 0.5 * jnp.matmul(VVt, V, precision=hi)
        core = jnp.matmul(V, core, precision=hi)
        p = lax.dynamic_update_slice_in_dim(
            p, core.reshape(B, nb * bs, n), off, axis=1)
    return p


# ---------------------------------------------------------------------------
# Round-4 concluded research: the DC-DEFLATED eigh pipeline (exact
# first-power T-block leaf solves).  Measured on v5e at B=64 n=256:
# 907.6 decomps/s at equal quality vs 1,083.4 for the default DC warm
# start (deflate_e2e_probe.py 2026-08-20) — a slower-than-default
# opt-in, so the machinery lives here (VERDICT r4 item 7) and
# ``jacobi_eigh(deflate=True)`` reaches it through a lazy import.
# benchmarks/FINISHER_NOTES.md records why the family cannot reach 10x
# (the finisher's interference-limited ~2.4x/sweep decay binds, not the
# warm-start entry level).
# ---------------------------------------------------------------------------

import functools

from .jacobi_eigh import _UNROLL, _mats_per_program

_REFINE_EMAX = 0.02  # gap clip for the unshifted Rayleigh refinement


@functools.lru_cache(maxsize=None)
def _restore_perm_table(n: int, max_sweeps: int):
    """Row-gather table undoing the sweep kernel's tournament drift.

    The Brent-Luk shuffle (`_shuffle`) advances row contents one fixed
    permutation ``sigma`` per round; its period is ``n - 1`` (slot 0 is
    pinned, the rest form one cycle), but a sweep executes
    ``ceil((n-1)/U)*U`` rounds — not a multiple of the period — so after
    ``k`` sweeps the panel rows sit at ``sigma^(k*R)`` of their original
    slots.  The eigh path never cares (it sorts by eigenvalue), but the
    deflated path's masked window solves need PASS-THROUGH rows (zero
    coupling — they never rotate, only ride the shuffle) back at their
    original slots so the window rotation is exactly identity outside
    its segment.  Entry ``[k, i]``: the slot holding original row ``i``
    after ``k`` sweeps.  Trace-time only (numpy, cached)."""
    import numpy as np

    h = n // 2
    rounds = -(-(n - 1) // _UNROLL) * _UNROLL
    table = np.zeros((max_sweeps + 1, n), np.int64)
    for k in range(max_sweeps + 1):
        track = np.arange(n)
        for _ in range((rounds * k) % (n - 1)):
            t, b = track[:h], track[h:]
            track = np.concatenate(
                [t[0:1], b[0:1], t[1:h - 1], b[1:], t[h - 1:h]])
        # track[i] = original row now at slot i; invert for the gather
        inv = np.empty(n, np.int64)
        inv[track] = np.arange(n)
        table[k] = inv
    return table.astype(np.int32)


def _window_solve(blocks: jnp.ndarray, *, max_sweeps: int,
                  interpret: bool, m_cap: Optional[int] = None,
                  sort_valid: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
    """Orthogonal rotations diagonalizing (BB, w, w) symmetric blocks,
    returned with rows = eigenvectors^T in ORIGINAL slot order (no
    global eigenvalue sort): a block row whose off-diagonal couplings
    are exactly zero ("pass-through" — the deflated path's masked
    out-of-segment slots) maps to exactly its own unit vector at its
    own slot, so the rotation is identity there.

    Pipeline: per-block Gershgorin PSD shift -> sweep kernel (with the
    per-program executed-sweep-count export) -> tournament-drift
    restore (`_restore_perm_table` gathered by each program's dynamic
    sweep count) -> row normalization.  Rotating panel rows by the
    result preserves the G-invariant (orthogonal to the kernel's
    ~eps*sqrt(w)), so `_guard_warm_start` downstream keeps full
    correctness authority.

    ``sort_valid`` ((BB, w) bool): reorder the rows at TRUE slots
    ascending by eigenvalue among themselves (pass-through slots stay
    pinned).  The deflated path needs this: the DC slot assignment is
    spectral (segment s holds eigenvalues below segment s+1), and its
    boundary windows find a missorted near-degenerate pair only if
    each segment's solved rows sit in spectral order — the kernel's
    natural row order is tournament-dynamics noise (measured on chip:
    unsorted leaves left cross-segment pair cosines at 0.104 vs the
    1.9e-6 guard floor, 4-5 finisher sweeps instead of 0)."""
    BB, w, _ = blocks.shape
    dt = blocks.dtype
    tol = float(jnp.finfo(dt).eps) * 4.0 * math.sqrt(w)
    absb = jnp.abs(blocks)
    diag = jnp.diagonal(blocks, axis1=-2, axis2=-1)
    offsum = jnp.sum(absb, axis=-1) - jnp.diagonal(absb, axis1=-2,
                                                   axis2=-1)
    lower = jnp.min(diag - offsum, axis=-1)
    frob = jnp.sqrt(jnp.sum(absb * absb, axis=(-2, -1)))
    sigma = (jnp.maximum(-lower, 0.0) + jnp.asarray(0.01, dt) * frob
             + jnp.asarray(1e-30, dt))
    shifted = blocks + sigma[:, None, None] * jnp.eye(w, dtype=dt)
    gt, sweeps = _pallas_g_panel(shifted, max_sweeps, tol, interpret,
                                 complexpair=False, return_sweeps=True,
                                 m_cap=m_cap)
    m = _mats_per_program(w, w, BB, m_cap)
    table = jnp.asarray(_restore_perm_table(w, max_sweeps))
    fix = table[sweeps[jnp.arange(BB) // m]]               # (BB, w)
    gt = jnp.take_along_axis(gt, fix[:, :, None], axis=1)
    nrm = jnp.sqrt(jnp.sum(gt * gt, axis=-1, keepdims=True))
    R = gt / jnp.maximum(nrm, jnp.asarray(jnp.finfo(dt).tiny * 16, dt))
    if sort_valid is not None:
        slot = jnp.arange(w)[None, :]
        lam = nrm[:, :, 0]                    # lambda + sigma, monotone
        # rows by ascending eigenvalue among valid, then pass-through
        # rows in slot order (stable argsort on equal +inf keys)
        ord_v = jnp.argsort(jnp.where(sort_valid, lam, jnp.inf), axis=-1)
        # target slots: valid slots ascending, then pass-through slots
        # ascending — tail ranks pair each pass-through row with its
        # own slot, so they stay pinned
        vpos = jnp.argsort(jnp.where(sort_valid, slot, w + slot), axis=-1)
        gather = jnp.zeros((BB, w), jnp.int32).at[
            jnp.arange(BB)[:, None], vpos].set(ord_v.astype(jnp.int32))
        R = jnp.take_along_axis(R, gather[:, :, None], axis=1)
    return R


_BOUNDARY_HALF = 16  # boundary-window half-width (stage 2); clusters up
# to 2*_BOUNDARY_HALF eigenvalues wide that a segment boundary cut are
# solved exactly; wider ones are left to the finisher

_S1_MCAP = 32  # matrices per grid program for the stage-1 window solves
_S2_MCAP = 64  # ... and the small boundary-window solves: the windows
# are far smaller than the default 8-stack tuning point (w ~ 3n/8 and
# 32), so stacking more both grows the VPU op shapes and cuts the
# per-program while_loop/gauge overhead


def deflated_panel(a_shift: jnp.ndarray, *, max_sweeps: int,
                   interpret: bool, levels: int = 2) -> jnp.ndarray:
    """DC-deflated warm panel: spectral divide-and-conquer sort
    (``refine=1`` — the probe+polar basis leak must be healed or leaf
    cross-coupling floors at ~1e-3, see dc_kernel), then *solve* the
    decoupled diagonal blocks of the exact conjugated
    ``T = Q^T A_shift Q`` with the sweep kernel at window size instead
    of warm-starting full-n sweeps (a window sweep costs ``(w/n)^3`` of
    a full-n sweep, and the windows stack into fuller grid programs).

    Stage 1 solves one masked window per DC segment, SEGMENT-ALIGNED:
    boundaries are data-dependent (median-rank drift, measured
    91/65/56/44 vs the nominal 64s at n=256), so windows are cut at
    each segment's own start (`return_seg`) with out-of-segment slots
    masked to pass-through — fixed-offset blocks would split dense
    segments mid-cluster and stall the finisher.  Stage 2 solves small
    unmasked windows astride each segment boundary, catching clusters
    the split cut.  Remaining coupling: well-gapped far pairs
    (`_rot_correct` kills them at first order) and clusters wider than
    the boundary window (left to the finisher kernel, which certifies
    convergence either way — a soft split costs sweeps, never
    correctness).

    ``levels`` fixed at 2: 4 segments balance window cost
    (``4*(3n/8)^3 ~ 0.2 n^3`` per window sweep) against DC depth.
    """
    B, n, _ = a_shift.shape
    ns = 2 ** levels
    dt = a_shift.dtype
    hi = jax.lax.Precision.HIGHEST
    from .dc_kernel import dc_precondition_tpu
    g0, T, seg = dc_precondition_tpu(a_shift, levels=levels, min_seg=2,
                                     interpret=interpret, return_t=True,
                                     return_seg=True, refine=1)
    seg = seg[:, :, 0]                                     # (B, n) int32
    # window = 1.5x the nominal segment size, 16-aligned: covers the
    # measured ~1.42x median-rank drift; an overflowing tail is left to
    # the finisher (sweeps, never correctness)
    w = min(n, max(32, -(-3 * n // (2 * ns * 16)) * 16))
    starts = jnp.stack(
        [jnp.clip(jnp.sum((seg < s).astype(jnp.int32), axis=-1), 0, n - w)
         for s in range(ns)], axis=1)                      # (B, ns)

    loc = jnp.arange(w, dtype=dt)

    def slice_block(Tb, segb, st, sid):
        blk = lax.dynamic_slice(Tb, (st, st), (w, w))
        valid = lax.dynamic_slice(segb, (st,), (w,)) == sid
        vv = valid[:, None] & valid[None, :]
        # pass-through slots: exactly zero couplings + a positive
        # diagonal (value irrelevant — they never rotate)
        blk = (jnp.where(vv, blk, jnp.asarray(0.0, dt))
               + jnp.diag(jnp.where(valid, jnp.asarray(0.0, dt),
                                    1.0 + loc)))
        return blk, valid

    blocks, valid = [jnp.stack(x, axis=1) for x in zip(
        *[jax.vmap(slice_block, in_axes=(0, 0, 0, None))(
            T, seg, starts[:, s], s) for s in range(ns)])]
    R = _window_solve(blocks.reshape(B * ns, w, w),
                      max_sweeps=max_sweeps, interpret=interpret,
                      m_cap=_S1_MCAP,
                      sort_valid=valid.reshape(B * ns, w)
                      ).reshape(B, ns, w, w)

    def apply_rows(Pb, Rb, st):
        rows = lax.dynamic_slice(Pb, (st, 0), (Rb.shape[0], Pb.shape[-1]))
        return lax.dynamic_update_slice(
            Pb, jnp.matmul(Rb, rows, precision=hi), (st, 0))

    def apply_cols(Tb, Rb, st):
        cols = lax.dynamic_slice(Tb, (0, st), (Tb.shape[0], Rb.shape[0]))
        return lax.dynamic_update_slice(
            Tb, jnp.matmul(cols, jnp.swapaxes(Rb, -1, -2), precision=hi),
            (0, st))

    # stage-1 rotations are identity outside their own segment, so the
    # (possibly overlapping) window applications commute exactly
    for s in range(ns):
        g0 = jax.vmap(apply_rows)(g0, R[:, s], starts[:, s])
        T = jax.vmap(apply_rows)(T, R[:, s], starts[:, s])
        T = jax.vmap(apply_cols)(T, R[:, s], starts[:, s])

    # stage 2: unmasked boundary windows on the stage-1-conjugated T.
    # Rare overlapping windows (segments narrower than the window) make
    # the later rotation act on a stale block — suboptimal, still
    # orthogonal, so it costs finisher sweeps at worst.
    bw = 2 * _BOUNDARY_HALF
    if n > bw:
        bstarts = jnp.clip(starts[:, 1:] - _BOUNDARY_HALF, 0, n - bw)
        bblocks = jnp.stack(
            [jax.vmap(lambda Tb, st: lax.dynamic_slice(
                Tb, (st, st), (bw, bw)))(T, bstarts[:, s])
             for s in range(ns - 1)],
            axis=1).reshape(B * (ns - 1), bw, bw)
        Rb = _window_solve(bblocks, max_sweeps=max_sweeps,
                           interpret=interpret,
                           m_cap=_S2_MCAP).reshape(B, ns - 1, bw, bw)
        for s in range(ns - 1):
            g0 = jax.vmap(apply_rows)(g0, Rb[:, s], bstarts[:, s])
    return g0


def deflate_refine(a0: jnp.ndarray, V: jnp.ndarray, AV: jnp.ndarray,
                   lam: jnp.ndarray):
    """Post-polish Rayleigh-Ritz rotation on the UNSHIFTED input for the
    deflated path: the Gram gauge certifies pair cosines <= tol in the
    sigma-SHIFTED-squared metric, where the Gershgorin margin inflates
    mid-spectrum relative gaps by ~(sigma/lambda)^2 — gauge-level mixing
    then maps to vector error ~ tol/relgap(lambda'^2).  The cold sweep
    escapes via quadratic overshoot below tol; the deflated panel ENTERS
    the finisher just under tol and exits at the floor (measured colres
    3.4e-5 vs cold 1.6e-6 at n=200).  One gap-clipped first-order
    rotation against H = V^T A V (honest unshifted gaps) lands the
    residual back at the HIGHEST-matmul noise floor ~eps*sqrt(n);
    near-degenerate pairs are clipped — within-cluster mixing shares the
    eigenvalue and never shows in the residual.  Cost: ~9 batched (n, n)
    matmuls ~ 1 ms at B=64, n=256, vs the ~8 ms finisher sweep the
    deflation saved.  Returns the refined (lam, V) UNSORTED (the caller
    runs the authoritative ascending sort).
    """
    hi = jax.lax.Precision.HIGHEST
    dt = V.dtype
    eye_n = jnp.eye(V.shape[-1], dtype=dt)
    H = jnp.matmul(jnp.swapaxes(V, -2, -1), AV, precision=hi)
    denom = lam[..., None, :] - lam[..., :, None]
    # tighter clip than jacobi_eigh._ROT_EMAX: on HONEST gaps the E
    # field near clusters is dense enough that |E_ij| <= 0.1 still lets
    # ||E||_2 reach O(1) and underconverge the 3-step NS polar
    # (measured orth 2.2e-4 / lam_err 2.5e-5 at emax=0.1 on a 16-wide
    # cluster; 9.7e-6 / 2.0e-6 at 0.02)
    live = jnp.logical_and(
        jnp.abs(H) <= _REFINE_EMAX * jnp.abs(denom),
        jnp.abs(denom) > jnp.asarray(jnp.finfo(dt).tiny * 16, dt))
    E = jnp.where(live, H / jnp.where(live, denom, 1.0),
                  jnp.asarray(0.0, dt))
    R = eye_n + E
    for _ns in range(3):
        RtR = jnp.matmul(jnp.swapaxes(R, -2, -1), R, precision=hi)
        R = jnp.matmul(R, 1.5 * eye_n - 0.5 * RtR, precision=hi)
    V = jnp.matmul(V, R, precision=hi)
    VtV = jnp.matmul(jnp.swapaxes(V, -2, -1), V, precision=hi)
    V = jnp.matmul(V, 1.5 * eye_n - 0.5 * VtV, precision=hi)
    AV = jnp.matmul(a0, V, precision=hi)
    lam = jnp.real(jnp.sum(V.conj() * AV, axis=-2))
    return lam, V
