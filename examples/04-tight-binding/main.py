"""Tight-binding chains: structured operators end to end.

A batch of 1-D tight-binding Hamiltonians with disorder and a low-rank
impurity term,

    H = diag(eps) + t * (nearest-neighbour hopping) + V V^T,

is exactly a :class:`xitorch_tpu.TridiagLowRankOperator`.  This example

1. computes the lowest few eigenstates per chain with ``chebfsi``
   (Chebyshev-filtered subspace iteration — the TPU-fast symeig method),
2. solves (H - E0*I) |psi> = |s> resolvent-style systems with the fused
   ``structured_cg`` Pallas path, and
3. differentiates the ground-state energy w.r.t. the disorder to get the
   occupation density d E0 / d eps_i = |psi_0(i)|^2
   (Hellmann-Feynman), checked against the eigenvector.

Run: python examples/04-tight-binding/main.py          (TPU)
     XT_CPU=1 python examples/04-tight-binding/main.py (CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

if os.environ.get("XT_CPU") == "1":  # run on CPU when the TPU tunnel is down
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import xitorch_tpu as xt
from xitorch_tpu.linalg import solve, symeig


def build(key, batch=8, n=256, t=-1.0, W=0.5, rank=2):
    k1, k2 = jax.random.split(key)
    eps = W * jax.random.normal(k1, (batch, n), jnp.float32)  # site disorder
    c = jnp.full((batch, n - 1), t, jnp.float32)              # hopping
    V = jax.random.normal(k2, (batch, n, rank), jnp.float32) / (n ** 0.5)
    return eps, c, V


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    key = jax.random.PRNGKey(0)
    eps, c, V = build(key)
    H = xt.TridiagLowRankOperator(eps, c, V)

    # --- 1. lowest eigenstates per chain (band edge) via chebfsi ---
    neig = 4
    # min_eps 5e-4: disorder makes near-degenerate clusters, so TPU f32
    # residuals floor around 2e-4; the polish rounds clean below that
    evals, evecs, info = symeig(H, neig, "lowest", method="chebfsi",
                                min_eps=5e-4, max_niter=60, polish=4,
                                return_info=True)
    print("chebfsi: lowest %d levels/chain, converged=%d, resid=%.1e"
          % (neig, int(info["converged"]), float(info["resid"])))
    print("  E0 per chain:", jnp.round(evals[:, 0], 4))

    # --- 2. resolvent solve (H - E*I) x = b with the fused kernel ---
    E_shift = evals[:, :1] - 0.5          # below the spectrum -> posdef H-E
    Hs = xt.TridiagLowRankOperator(eps - E_shift, c, V)
    b = jnp.zeros((eps.shape[0], eps.shape[1], 1), jnp.float32)
    b = b.at[..., eps.shape[1] // 2, 0].set(1.0)  # source at the middle site
    method = "structured_cg"
    x, sinfo = solve(Hs, b, method=method, rtol=1e-6, atol=1e-9,
                     return_info=True, interpret=on_cpu)
    print("structured_cg resolvent: converged=%d, %d iters, resid=%.1e"
          % (int(sinfo["converged"]), int(sinfo["iterations"]),
             float(sinfo["resid"])))
    # Green's-function decay away from the source (localization)
    g = jnp.abs(x[0, :, 0])
    print("  |G(i, n/2)| at offsets [0, 16, 64]:",
          [float(g[eps.shape[1] // 2 + o]) for o in (0, 16, 64)])

    # --- 3. dE0/deps = |psi_0|^2 (implicit differentiation through symeig) ---
    def ground_energy(eps):
        Hd = xt.TridiagLowRankOperator(eps, c, V)
        ev, _ = symeig(Hd, 1, "lowest", method="chebfsi",
                       min_eps=5e-4, max_niter=80, polish=4)
        return jnp.sum(ev)

    dens = jax.grad(ground_energy)(eps)
    err = float(jnp.max(jnp.abs(dens - jnp.abs(evecs[..., 0]) ** 2)))
    print("Hellmann-Feynman check: max |dE0/deps - |psi0|^2| = %.2e" % err)
    assert err < 1e-3
    print("OK")


if __name__ == "__main__":
    main()
