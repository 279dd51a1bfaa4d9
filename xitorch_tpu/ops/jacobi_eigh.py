"""Pallas TPU kernel: batched one-sided Jacobi symmetric eigendecomposition.

Motivation (BASELINE.md config 2): the dense ``exacteig`` path is bound by
XLA's TPU ``eigh`` on (64, 256, 256) — ~116 ms per batch, ~200x off the
chip's speed of light.  This kernel keeps each matrix VMEM-resident and
runs the classic *one-sided* Jacobi iteration, whose inner loop is pure
(n/2, n) VPU row arithmetic with no lane permutes and no host/HBM traffic:

* Layout: ``G^T`` and ``V^T`` are stored rows-as-sublanes, so a "column
  rotation" of the implicit G = A·V is a *row pair* rotation here.
* Pairing: Brent–Luk round-robin tournament.  The active pairs are always
  (row i of the top half, row i of the bottom half), and between rounds a
  fixed sublane shuffle (concatenate of static slices + iota selects)
  rotates every player except player 0 — after n-1 rounds all n(n-1)/2
  pairs have met exactly once and the ordering returns to the start.
* Sign ambiguity: one-sided Jacobi implicitly diagonalizes A^2, which
  cannot distinguish +-lambda pairs.  We pre-shift A by its Gershgorin
  bound sigma (A + sigma*I is PSD, eigenvectors unchanged, eigenvalues
  shift back exactly) — on PSD matrices one-sided Jacobi is famously
  *relative-accuracy*; the only loss is the ~eps*sigma cancellation in
  lambda - sigma, the same order as eigh's backward error.
* Convergence: quadratic; each sweep tracks max_pairs cos^2(g_p, g_q) and
  the sweep while_loop exits once it drops below ``tol``^2.

Measured (v5e single chip, B=64, n=256 SPD f32): 734 decomps/s vs 550/s
for XLA's eigh (1.34x), with *better* f32 quality after the Newton
re-orthonormalization polish (orth 2.4e-7, eigenpair residual 1.8e-5,
eigenvalues 7e-6 vs a float64 oracle).  The flat one-sided iteration is
VPU-bound at ~56% issue efficiency; blocked/MXU variants were analyzed
and rejected (the (2b,2b)-Gram inner problem still costs ~1.2*b/n of the
flat VPU work plus lane-permute overhead — no win at n<=512 on 128-lane
vregs).

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

__all__ = ["jacobi_eigh", "use_jacobi_for"]

# global switch: xitorch_tpu._impls.linalg.symeig.degen_eigh dispatches the
# dense decomposition here when `use_jacobi_for` approves (TPU, f32, n<=512)
ENABLED = True


_UNROLL = 6  # tournament rounds fused per fori_loop iteration
# (measured on v5e, B=64 n=256: 1 -> 706.5, 3 -> 736.3, 6 -> 749.0 decomps/s)


def _jacobi_kernel(a_ref, w_ref, *, n: int, max_sweeps: int, tol2: float):
    """One matrix per grid program.  a_ref: (1, n, n) symmetric (shifted
    PSD) input; w_ref: (1, n, 2n) output holding [G^T | V^T] side by side
    (G = A·V; at convergence row i is [lambda_i v_i^T | v_i^T]).

    Storing G^T and V^T in one buffer lets every rotation and every
    tournament shuffle run as a single double-width (h, 2n) VPU row
    operation — one instruction stream instead of two."""
    h = n // 2
    dt = a_ref.dtype
    eps_floor = jnp.asarray(jnp.finfo(dt).tiny * 16.0, dt)

    # W = [G^T | V^T] with G^T := A (A symmetric so A^T = A), V^T := I
    w_ref[0, :, :n] = a_ref[0, :, :]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    w_ref[0, :, n:] = jnp.where(rows == cols, jnp.asarray(1.0, dt),
                                jnp.asarray(0.0, dt))

    i_half = lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    m_first = i_half == 0       # tournament position 0 (fixed player)
    m_second = i_half == 1
    m_last = i_half == (h - 1)

    def _one_round(top, bot, max_ratio):
        """Rotate every (top_i, bot_i) pair, then Brent-Luk-shuffle:
        new_top = [top0, bot0, top1..top_{h-2}],
        new_bot = [bot1..bot_{h-1}, top_{h-1}]."""
        gt = top[:, :n]
        gb = bot[:, :n]
        alpha = jnp.sum(gt * gt, axis=1, keepdims=True)   # (h, 1)
        beta = jnp.sum(gb * gb, axis=1, keepdims=True)
        gam = jnp.sum(gt * gb, axis=1, keepdims=True)

        ab = alpha * beta
        ratio = gam * gam / jnp.maximum(ab, eps_floor)     # cos^2 angle
        # skip already-orthogonal (or zero) pairs
        live = ratio > jnp.asarray(tol2 * 0.01, dt)
        zeta = (beta - alpha) / jnp.where(live, 2.0 * gam, 1.0)
        t = jnp.where(zeta >= 0, 1.0, -1.0) / (
            jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
        # one Newton step on the hardware rsqrt keeps each rotation
        # orthogonal to ~2 ulp (c^2+s^2 = 1), so V's orthogonality drift
        # stays a random walk instead of a bias
        x = 1.0 + t * t
        c = lax.rsqrt(x)
        c = c * (1.5 - 0.5 * x * c * c)
        s = c * t
        c = jnp.where(live, c, jnp.asarray(1.0, dt))
        s = jnp.where(live, s, jnp.asarray(0.0, dt))

        ntop = c * top - s * bot        # (h, 2n): rotates G and V together
        nbot = s * top + c * bot

        top_dn = jnp.concatenate([ntop[h - 1:, :], ntop[:h - 1, :]], axis=0)
        bot_dn = jnp.concatenate([nbot[h - 1:, :], nbot[:h - 1, :]], axis=0)
        bot_up = jnp.concatenate([nbot[1:, :], nbot[:1, :]], axis=0)
        new_top = jnp.where(m_first, ntop,
                            jnp.where(m_second, bot_dn, top_dn))
        new_bot = jnp.where(m_last, ntop, bot_up)
        return new_top, new_bot, jnp.maximum(max_ratio, jnp.max(ratio))

    # a "sweep" is ceil((n-1)/U)*U rounds: >= n-1 consecutive rounds visit
    # every pair at least once (the tournament has period n-1); the <=U-1
    # overshoot rounds are harmless extra rotations
    n_iters = -(-(n - 1) // _UNROLL)

    def round_block(r, max_ratio):
        top = w_ref[0, :h, :]
        bot = w_ref[0, h:, :]
        for _ in range(_UNROLL):
            top, bot, max_ratio = _one_round(top, bot, max_ratio)
        w_ref[0, :h, :] = top
        w_ref[0, h:, :] = bot
        return max_ratio

    def sweep_cond(carry):
        sweep, ratio = carry
        return jnp.logical_and(sweep < max_sweeps,
                               ratio > jnp.asarray(tol2, dt))

    def sweep_body(carry):
        sweep, _ = carry
        ratio = lax.fori_loop(0, n_iters, round_block, jnp.asarray(0.0, dt))
        return sweep + 1, ratio

    lax.while_loop(sweep_cond, sweep_body,
                   (jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dt)))


def _pallas_eigh_panels(a: jnp.ndarray, max_sweeps: int, tol: float,
                        interpret: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the kernel on (B, n, n) PSD input; returns (vt, gt) panels."""
    from jax.experimental import pallas as pl

    B, n, _ = a.shape
    try:
        from jax.experimental.pallas import tpu as pltpu
        memspace = pltpu.VMEM
    except ImportError:  # pragma: no cover
        memspace = None

    def spec(width):
        kwargs = {"index_map": lambda b: (b, 0, 0)}
        if memspace is not None:
            kwargs["memory_space"] = memspace
        return pl.BlockSpec((1, n, width), **kwargs)

    kernel = functools.partial(_jacobi_kernel, n=n, max_sweeps=max_sweeps,
                               tol2=tol * tol)
    w = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec(n)],
        out_specs=spec(2 * n),
        out_shape=jax.ShapeDtypeStruct((B, n, 2 * n), a.dtype),
        interpret=interpret,
    )(a)
    return w[:, :, n:], w[:, :, :n]  # (vt, gt)


def jacobi_eigh(A: jnp.ndarray, *, max_sweeps: int = 18,
                tol: Optional[float] = None, interpret: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric eigendecomposition, ``jnp.linalg.eigh`` contract.

    ``A``: (*B, n, n) real symmetric.  Returns ascending eigenvalues
    (*B, n) and column eigenvectors (*B, n, n).  Raw kernel entry — no
    custom derivatives here; ``degen_eigh`` wraps it with the
    degeneracy-safe JVP.  Pads n to a multiple of 16 internally (padding
    eigenvalues are placed above the Gershgorin range and sliced off).
    """
    interpret = interpret or jax.default_backend() != "tpu"
    if A.ndim < 2 or A.shape[-1] != A.shape[-2]:
        raise ValueError("jacobi_eigh expects (*B, n, n), got %s"
                         % (A.shape,))
    if jnp.iscomplexobj(A):
        raise ValueError("jacobi_eigh supports real symmetric input only")
    batch = A.shape[:-2]
    n = A.shape[-1]
    dt = A.dtype
    if tol is None:
        tol = float(jnp.finfo(dt).eps) * 4.0
    Bflat = math.prod(batch) if batch else 1
    a = A.reshape(Bflat, n, n)

    # Spectral-bound shift: sigma >= max|lambda|, so a + sigma*I is PSD
    # (removes the +-lambda ambiguity of the implicit A^2 problem).  The
    # rounding error of the whole iteration scales with sigma, so take the
    # tighter of the Gershgorin and Frobenius bounds per matrix.
    gersh = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)      # (B,)
    frob = jnp.sqrt(jnp.sum(a * a, axis=(-2, -1)))
    sigma = jnp.minimum(gersh, frob) + jnp.asarray(1e-3, dt) * frob + 1e-30

    npad = max(16, -(-n // 16) * 16)
    if npad != n:
        pad = npad - n
        a = jnp.pad(a, ((0, 0), (0, pad), (0, pad)))
        # padding block: diag at 3*sigma -> sorts above every true
        # (shifted) eigenvalue, which lives in [0, 2*sigma]
        prows = lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        pcols = lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        pmask = (prows == pcols) & (prows >= n)
        a = a + jnp.where(pmask, 2.0, 0.0)[None] * sigma[:, None, None]
    eye = jnp.eye(npad, dtype=dt)
    a = a + sigma[:, None, None] * eye

    vt, gt = _pallas_eigh_panels(a, max_sweeps, tol, interpret)

    lam = jnp.sum(vt * gt, axis=-1) - sigma[:, None]        # (B, npad)
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)[:, :n]
    vt = jnp.take_along_axis(vt, order[..., None], axis=-2)[:, :n, :n]
    V = jnp.swapaxes(vt, -2, -1)

    # polish (2 batched matmuls on the MXU, trivially cheap next to the
    # sweeps): one Newton orthonormalization V <- V(3I - V^T V)/2 squares
    # away the ~sqrt(#rotations)*eps orthogonality drift, then Rayleigh
    # quotients on the *unshifted* input recover the eps*|A| (instead of
    # eps*sigma) eigenvalue accuracy.  HIGHEST precision: these are
    # solver-internal contractions (see CLAUDE.md precision note).
    hi = jax.lax.Precision.HIGHEST
    a0 = A.reshape(Bflat, n, n)
    VtV = jnp.matmul(jnp.swapaxes(V, -2, -1), V, precision=hi)
    eye_n = jnp.eye(n, dtype=dt)
    V = jnp.matmul(V, 1.5 * eye_n - 0.5 * VtV, precision=hi)
    AV = jnp.matmul(a0, V, precision=hi)
    lam = jnp.sum(V * AV, axis=-2)
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return lam.reshape(*batch, n), V.reshape(*batch, n, n)


def use_jacobi_for(A: jnp.ndarray) -> bool:
    """Dispatch gate used by ``degen_eigh``: real f32, on a TPU backend,
    n small enough that G^T + V^T + pipeline buffers fit VMEM."""
    return (ENABLED
            and jax.default_backend() == "tpu"
            and not jnp.iscomplexobj(A)
            and A.dtype == jnp.float32
            and A.ndim >= 2
            and A.shape[-1] == A.shape[-2]
            and 64 <= A.shape[-1] <= 512)
