"""Complex-operator mode analysis: native complex SVD + eigh with
implicit gradients (round-5 surface).

A lossy coupled-resonator chain has a complex hermitian Hamiltonian-like
coupling matrix H (nearest-neighbour hopping with phase) and a complex
response operator R = (H - w I)^{-1} D.  This example

1. builds H as a hermitian :class:`LinearOperator` and decomposes it
   with ``linalg.symeig`` (on CPU backends the complex path rides the
   host-LAPACK bridge; on TPU the packed-plane complex-pair kernel),
2. takes the dominant response modes with the NATIVE complex
   ``linalg.svd`` (the round-5 packed-plane Hestenes path — singular
   values at ~eps*kappa instead of the Gram route's ~eps*kappa^2), and
3. fits the hopping phases so the top response singular value hits a
   target, with gradients flowing through BOTH decompositions'
   phase-gauge-invariant implicit rules (``minimize(method="lbfgs")``
   over the real phase parameters).

Run: XT_CPU=1 python examples/06-complex-mode-analysis/main.py  (CPU)
     python examples/06-complex-mode-analysis/main.py           (TPU;
     note this image's tunnel cannot transfer c64 — real TPUs run c64
     via XLA's f32-pair decomposition, so use CPU here)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

if os.environ.get("XT_CPU") == "1" or "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import svd, symeig
from xitorch_tpu.optimize import minimize

N = 24
K = 3


def hamiltonian(phases, onsite):
    """Hermitian hopping matrix with complex phases on the couplings."""
    hop = jnp.exp(1j * phases)                     # (N-1,) unit-modulus
    H = jnp.zeros((N, N), jnp.complex128)
    H = H.at[jnp.arange(N - 1), jnp.arange(1, N)].set(hop)
    H = H + H.conj().T
    return H + jnp.diag(onsite.astype(jnp.complex128))


def main():
    rng = np.random.default_rng(0)
    onsite = jnp.asarray(np.linspace(-0.5, 0.5, N))
    phases0 = jnp.asarray(rng.uniform(-0.5, 0.5, N - 1))

    # 1) spectral decomposition of the hermitian operator
    H0 = hamiltonian(phases0, onsite)
    A = LinearOperator.m(H0, is_hermitian=True)
    evals, evecs = symeig(A, 4, "lowest")
    resid = A.mm(evecs) - evecs * evals[..., None, :]
    print("lowest modes:", np.round(np.asarray(evals), 6),
          " max residual %.2e" % float(jnp.max(jnp.abs(resid))))

    # 2) dominant response modes via the NATIVE complex SVD
    w = jnp.asarray(2.5 + 0.4j)                    # drive frequency + loss
    D = jnp.asarray(rng.standard_normal((N, 5))
                    + 1j * rng.standard_normal((N, 5)))

    def response(ph):
        Hm = hamiltonian(ph, onsite)
        R = jnp.linalg.solve(Hm - w * jnp.eye(N, dtype=Hm.dtype), D)
        return R

    u, s, vh = svd(LinearOperator.m(response(phases0)), K)
    print("top-%d response singular values:" % K,
          np.round(np.sort(np.asarray(s))[::-1], 5))

    # 3) fit the phases so the largest response singular value hits a
    # target — gradients flow through the complex SVD's gauge-invariant
    # implicit rule
    target = 1.3 * float(jnp.max(s))

    def objective(ph):
        _, sv, _ = svd(LinearOperator.m(response(ph)), K)
        return (jnp.max(sv) - target) ** 2

    ph_fit = minimize(objective, phases0, method="lbfgs", gtol=1e-10,
                      maxiter=300)
    final = float(objective(ph_fit))
    _, s_fit, _ = svd(LinearOperator.m(response(ph_fit)), K)
    print("fit: |s_max - target| = %.3e (target %.5f -> %.5f)"
          % (final ** 0.5, target, float(jnp.max(s_fit))))
    assert final < 1e-10, "phase fit did not converge"
    print("OK")


if __name__ == "__main__":
    main()
