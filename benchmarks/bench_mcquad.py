"""mcquad throughput: vmapped multi-chain MH vs the reference's single chain.

Workload: E_p[x] and E_p[|x|^2] under an anisotropic 8-D Gaussian
(unnormalized logp), the mcquad shape of reference
xitorch/_impls/integrate/mcsamples/mcmc.py:23-54.  The reference walks one
sequential chain — each step is a full Python/torch dispatch, so throughput
is dispatch-bound.  Ours runs ``nchains`` chains in lockstep under vmap
(one fused scan; every VPU lane advances a chain), so samples/sec scales
with the chain count until the chip saturates.

Printed metric: MH samples/sec (including per-chain burn-in), plus the
estimate error vs the analytic moments as the accuracy gate.

Run: python benchmarks/bench_mcquad.py [--cpu] [--no-ref]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

_maybe_force_cpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

D = 8
NSAMPLES = 1 << 17          # 131,072 collected samples
NBURN = 256                 # per chain
NCHAINS = 1024
STEP = 0.7
REF_NSAMPLES = 20000        # the sequential chain is ~1000x slower; keep sane


def _logp(x, mu, w):
    return -0.5 * jnp.sum(w * (x - mu) ** 2)


def main():
    from xitorch_tpu.integrate import mcquad

    platform = jax.devices()[0].platform
    mu = jnp.linspace(-1.0, 1.0, D)
    w = jnp.linspace(0.5, 2.0, D)

    def run():
        return mcquad(lambda x: jnp.sum(x ** 2), _logp, jnp.zeros(D),
                      fparams=(), pparams=(mu, w), method="mh",
                      nsamples=NSAMPLES, nburnout=NBURN, nchains=NCHAINS,
                      step_size=STEP)

    fn = jax.jit(run)
    float(fn())  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        val = float(fn())
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    total_steps = NSAMPLES + NCHAINS * NBURN
    exact = float(jnp.sum(mu ** 2) + jnp.sum(1.0 / w))
    out = {
        "metric": "mcquad MH samples/sec (D=%d, %d chains, backend=%s)"
                  % (D, NCHAINS, platform),
        "unit": "samples/sec",
        "samples_per_sec": round(total_steps / t, 1),
        "estimate": round(val, 4),
        "exact": round(exact, 4),
        "abs_err": round(abs(val - exact), 4),
    }
    assert abs(val - exact) < 0.25, "mcquad estimate off: %s" % out

    if "--no-ref" not in sys.argv:
        try:
            ref_sps = _ref_measure(mu, w)
            out["ref_samples_per_sec"] = ref_sps
            out["vs_ref"] = round(out["samples_per_sec"] / ref_sps, 1)
        except Exception as e:  # pragma: no cover
            out["ref_error"] = str(e)[:120]
    print(json.dumps(out), flush=True)


def _ref_measure(mu, w):
    """Reference xitorch mcquad: one sequential MH chain on CPU."""
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    from xitorch.integrate import mcquad as ref_mcquad

    torch.set_num_threads(1)
    mu_t = torch.tensor(np.asarray(mu))
    w_t = torch.tensor(np.asarray(w))

    def logp_t(x, mu, w):
        return -0.5 * torch.sum(w * (x - mu) ** 2)

    x0 = torch.zeros(D)
    with torch.no_grad():
        t0 = time.perf_counter()
        ref_mcquad(lambda x: torch.sum(x ** 2), logp_t, x0,
                   fparams=[], pparams=[mu_t, w_t], method="mh",
                   nsamples=REF_NSAMPLES, nburnout=NBURN,
                   step_size=STEP)
        dt = time.perf_counter() - t0
    return round((REF_NSAMPLES + NBURN) / dt, 1)


if __name__ == "__main__":
    main()
