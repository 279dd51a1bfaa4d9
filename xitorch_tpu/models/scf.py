"""DQC-style self-consistent field (SCF) loop — BASELINE config 5.

The reference library's flagship downstream (DQC, differentiable quantum
chemistry) nests a partial eigendecomposition inside a fixed-point solve:

    rho* = density( eigvecs( H(rho*) ) ),

with gradients w.r.t. Hamiltonian parameters flowing through BOTH implicit
layers: the equilibrium adjoint (optimize.equilibrium's custom_jvp) calls
the symeig adjoint (linalg.symeig's shifted-solve custom_jvp) inside its
linearized residual — the same composition as the reference's
solve-inside-rootfinder-backward recursion (SURVEY.md §3.1).

This module implements a minimal Hartree-Fock-like model:
    H(rho) = H0(theta) + g * diag(rho),  occupy the lowest ``nocc`` orbitals,
    rho = sum_i |psi_i|^2.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from xitorch_tpu._core.linop import LinearOperator
from xitorch_tpu.linalg import symeig
from xitorch_tpu.optimize import equilibrium

__all__ = ["HamiltonianOp", "scf_density", "scf_energy"]


class HamiltonianOp(LinearOperator):
    """H = (A + A^T)/2 + g * diag(rho), matrix-free and hermitian."""

    def __init__(self, a, g, rho):
        n = a.shape[-1]
        super().__init__(shape=(*a.shape[:-2], n, n), is_hermitian=True,
                         dtype=a.dtype)
        self.a = a
        self.g = g
        self.rho = rho

    def _getparamnames(self, prefix=""):
        return [prefix + "a", prefix + "g", prefix + "rho"]

    def _sym(self):
        return (self.a + jnp.swapaxes(self.a, -2, -1)) * 0.5

    def _mv(self, x):
        return (jnp.einsum("...pq,...q->...p", self._sym(), x)
                + self.g * self.rho * x)

    def _mm(self, x):
        return self._sym() @ x + (self.g * self.rho)[..., :, None] * x


def _density(a, g, rho, nocc: int, method: str, **eig_options):
    H = HamiltonianOp(a, g, rho)
    evals, evecs = symeig(H, nocc, "lowest", method=method, **eig_options)
    return jnp.sum(evecs * evecs.conj(), axis=-1).real


def scf_density(a, g, nocc: int = 2,
                eig_method: str = "davidson",
                scf_method: str = "broyden1",
                eig_options: Optional[dict] = None,
                **scf_options):
    """Solve the SCF fixed point rho = density(H(rho)) and return rho*.

    Gradients w.r.t. ``a`` and ``g`` flow through the nested implicit
    adjoints (equilibrium + symeig)."""
    n = a.shape[-1]
    eig_opts = {"min_eps": 1e-9, "max_niter": 2000} if eig_method == "davidson" else {}
    if eig_options:
        eig_opts.update(eig_options)
    cfg = {"f_tol": 1e-9, "maxiter": 1000}
    cfg.update(scf_options)

    def density_map(rho, a, g):
        return _density(a, g, rho, nocc, eig_method, **eig_opts)

    rho0 = jnp.full((n,), float(nocc) / n, dtype=a.dtype)
    return equilibrium(density_map, rho0, params=(a, g),
                       method=scf_method, **cfg)


def scf_energy(a, g, nocc: int = 2, **kwargs):
    """Total orbital energy at the SCF solution (differentiable)."""
    rho = scf_density(a, g, nocc=nocc, **kwargs)
    H = HamiltonianOp(a, g, rho)
    eig_method = kwargs.get("eig_method", "davidson")
    eig_opts = {"min_eps": 1e-9, "max_niter": 2000} if eig_method == "davidson" else {}
    if kwargs.get("eig_options"):
        eig_opts.update(kwargs["eig_options"])
    evals, _ = symeig(H, nocc, "lowest", method=eig_method, **eig_opts)
    return jnp.sum(evals)
