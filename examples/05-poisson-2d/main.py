"""2-D Poisson design problem: Kronecker-structured direct solves.

A separable elliptic operator on an n x n tensor grid,

    A = L1 (x) I + I (x) L2 + c*I       (L: 1-D Laplacians, c > 0),

is exactly a :class:`xitorch_tpu.KronSumOperator`, and
``solve(method="kron_direct")`` solves it in the factor eigenbases (two
small eigh's + four matmuls — the fast-Poisson route).  This example

1. solves A u = s for a localized source on a 128 x 128 grid and checks
   the residual against the matrix-free operator,
2. compares wall-clock against matrix-free CG on the same operator (the
   only route the reference's solve() offers), and
3. runs an inverse problem end to end: fit the source amplitudes of a
   few Gaussian bumps so the field u matches a target, with gradients
   flowing through the direct solve's implicit rule (L-BFGS from
   ``minimize(method="lbfgs")``).

Run: python examples/05-poisson-2d/main.py          (TPU)
     XT_CPU=1 python examples/05-poisson-2d/main.py (CPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

if os.environ.get("XT_CPU") == "1":  # run on CPU when the TPU tunnel is down
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from xitorch_tpu import KronSumOperator
from xitorch_tpu.linalg import solve
from xitorch_tpu.optimize import minimize

N = 128


def lap1d(n):
    return (2.0 * jnp.eye(n, dtype=jnp.float32)
            - jnp.eye(n, k=1, dtype=jnp.float32)
            - jnp.eye(n, k=-1, dtype=jnp.float32)
            + 0.05 * jnp.eye(n, dtype=jnp.float32))


def gaussians(amps, centers, width=6.0):
    """sum_k amp_k * exp(-|r - c_k|^2 / (2 w^2)) on the (N, N) grid."""
    xx = jnp.arange(N, dtype=jnp.float32)
    r2 = ((xx[:, None, None] - centers[None, None, :, 0]) ** 2
          + (xx[None, :, None] - centers[None, None, :, 1]) ** 2)
    return jnp.sum(amps[None, None, :] * jnp.exp(-r2 / (2 * width ** 2)),
                   axis=-1)


def main():
    A = KronSumOperator(lap1d(N), lap1d(N), is_hermitian=True)
    centers = jnp.asarray([[40.0, 40.0], [90.0, 70.0], [30.0, 100.0]])
    amps_true = jnp.asarray([1.0, -0.6, 0.8])

    def field(amps):
        s = gaussians(amps, centers).reshape(N * N, 1)
        return solve(A, s, method="kron_direct")

    # --- 1. forward solve + residual check ---
    u = field(amps_true)
    s = gaussians(amps_true, centers).reshape(N * N, 1)
    resid = float(jnp.max(jnp.abs(A.mm(u) - s)))
    print("kron_direct: N=%d unknowns, residual %.2e" % (N * N, resid))
    assert resid < 1e-3

    # --- 2. vs matrix-free CG (the reference-shaped route) ---
    f_dir = jax.jit(lambda a: jnp.sum(field(a)))
    f_cg = jax.jit(lambda a: jnp.sum(solve(
        A, gaussians(a, centers).reshape(N * N, 1), method="cg",
        rtol=1e-5, atol=1e-6, max_niter=600)))
    float(f_dir(amps_true)); float(f_cg(amps_true))  # compile
    t0 = time.perf_counter(); float(f_dir(amps_true))
    t_dir = time.perf_counter() - t0
    t0 = time.perf_counter(); float(f_cg(amps_true))
    t_cg = time.perf_counter() - t0
    print("direct %.1f ms vs CG %.1f ms (%.0fx)"
          % (t_dir * 1e3, t_cg * 1e3, t_cg / max(t_dir, 1e-9)))

    # --- 3. inverse problem: recover source amplitudes from the field ---
    u_target = field(amps_true)

    def loss(amps):
        return jnp.sum((field(amps) - u_target) ** 2) * 1e3

    amps_fit, info = minimize(loss, jnp.zeros(3), method="lbfgs",
                              maxiter=100, gtol=1e-10, return_info=True)
    err = float(jnp.max(jnp.abs(amps_fit - amps_true)))
    print("inverse problem: fitted amps %s (true %s), max err %.2e, "
          "%d L-BFGS iterations"
          % (jnp.round(amps_fit, 4), amps_true, err,
             int(info["iterations"])))
    assert err < 1e-3
    print("OK")


if __name__ == "__main__":
    main()
