"""Monte-Carlo samplers for mcquad.

Parity with /root/reference/xitorch/_impls/integrate/mcsamples/mcmc.py:
Metropolis-Hastings (:5-54) as ``nchains`` *vmapped parallel chains* (the
TPU-native shape — the reference's single sequential chain is
latency-bound; here every VPU lane advances its own chain) under explicit
``jax.random`` keys (pass ``seed=`` or ``key=`` in fwd_options;
deterministic by default like the reference's seeded torch RNG), a
custom-stepper variant (:56-97, the stepper receives a PRNG key:
``custom_step(key, x, *pparams)``), and the deterministic 1-D
Gauss-Legendre "sampler" used by exact tests (:100-124).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["mh", "mhcustom", "dummy1d"]


def _resolve_key(key, seed):
    if key is not None:
        return key
    return jax.random.PRNGKey(seed)


def mh(logpfcn: Callable, x0: jnp.ndarray, pparams=(),
       nsamples: int = 10000, nburnout: int = 5000, step_size: float = 1.0,
       nchains: int = 64, seed: int = 721, key=None, **unused):
    """Metropolis-Hastings with Gaussian proposals, run as ``nchains``
    vmapped parallel chains.

    The reference walks ONE sequential chain
    (mcsamples/mcmc.py:23-54) — a latency-bound shape no accelerator can
    help with.  Here the chain axis is vmapped: every VPU lane advances its
    own chain per step, so wall-clock scales with ``nsamples/nchains``
    steps instead of ``nsamples``, and the overdispersed starts decorrelate
    the estimate faster than one long chain (between-chain variance is
    averaged out instead of waiting for mixing).

    Keyword arguments
    -----------------
    nsamples: total number of collected samples (split across chains;
        rounded up to a multiple of ``nchains``).
    nburnout: number of burn-in steps *per chain*.
    step_size: proposal standard deviation.
    nchains: number of parallel chains (1 reproduces the reference's
        sequential shape).
    seed / key: PRNG seed or explicit jax.random key.
    """
    key = _resolve_key(key, seed)
    nchains = max(1, int(nchains))
    spc = -(-int(nsamples) // nchains)  # samples per chain

    def chain_step(carry, k):
        x, logpx = carry
        k1, k2 = jax.random.split(k)
        xnext = x + step_size * jax.random.normal(k1, x.shape, dtype=x.dtype)
        logpnext = logpfcn(xnext, *pparams)
        logr = logpnext - logpx
        accept = jnp.log(jax.random.uniform(k2, (), dtype=jnp.float32)
                         ).astype(logr.dtype) < logr
        x = jnp.where(accept, xnext, x)
        logpx = jnp.where(accept, logpnext, logpx)
        return (x, logpx), x

    def run_chain(x0c, keys):
        logpx0 = logpfcn(x0c, *pparams)
        (xb, logpb), _ = lax.scan(chain_step, (x0c, logpx0), keys[:nburnout])
        _, samples = lax.scan(chain_step, (xb, logpb), keys[nburnout:])
        return samples  # (spc, *x0.shape)

    kinit, krun = jax.random.split(key)
    ckeys = jax.random.split(krun, nchains * (nburnout + spc)).reshape(
        nchains, nburnout + spc, 2)
    # overdispersed starts: chain 0 anchors at x0 exactly, the rest start
    # from x0 + step_size * noise
    noise = jax.random.normal(kinit, (nchains, *x0.shape), dtype=jnp.float32
                              ).astype(x0.dtype) * step_size
    noise = noise.at[0].set(0.0)
    x0s = x0[None] + noise
    # domain guard: a dispersed start may leave logpfcn's support (log,
    # sqrt, ... inside the density -> nan/-inf), and a chain started at
    # logp=nan never accepts a move (nan comparisons are False) — snap
    # such chains back to the user's x0, which the reference contract
    # guarantees is evaluable
    logp0 = jax.vmap(lambda xc: logpfcn(xc, *pparams))(x0s)
    ok = jnp.isfinite(logp0).reshape((nchains,) + (1,) * x0.ndim)
    x0s = jnp.where(ok, x0s, x0[None])

    samples = jax.vmap(run_chain)(x0s, ckeys)        # (nchains, spc, ...)
    samples = samples.reshape(nchains * spc, *x0.shape)
    ntot = nchains * spc
    weights = jnp.full((ntot,), 1.0 / ntot, dtype=samples.dtype)
    return samples, weights


def mhcustom(logpfcn: Callable, x0: jnp.ndarray, pparams=(),
             nsamples: int = 10000, nburnout: int = 5000,
             custom_step: Optional[Callable] = None,
             seed: int = 721, key=None, **unused):
    """Metropolis sampling with a user-provided stepper
    ``custom_step(key, x, *pparams) -> xnext`` (accept/reject already done).
    """
    if custom_step is None:
        raise RuntimeError("custom_step must be specified for mhcustom method")
    if not callable(custom_step):
        raise RuntimeError("custom_step option for mhcustom must be callable")
    key = _resolve_key(key, seed)

    def chain_step(x, k):
        xn = custom_step(k, x, *pparams)
        return xn, xn

    keys = jax.random.split(key, nburnout + nsamples)
    xb, _ = lax.scan(chain_step, x0, keys[:nburnout])
    _, samples = lax.scan(chain_step, xb, keys[nburnout:])
    weights = jnp.full((nsamples,), 1.0 / nsamples, dtype=samples.dtype)
    return samples, weights


def dummy1d(logpfcn: Callable, x0: jnp.ndarray, pparams=(),
            nsamples: int = 100, lb: float = -np.inf, ub: float = np.inf,
            **unused):
    """Deterministic 1-D 'sampler': Gauss-Legendre nodes under the tan
    transform, weighted by exp(logp).  Exact for tests (reference :100-124).
    """
    assert x0.size == 1, "This dummy operation can only be done in 1D space"
    dtype = x0.dtype
    tu = jnp.arctan(jnp.asarray(ub, dtype=dtype))
    tl = jnp.arctan(jnp.asarray(lb, dtype=dtype))
    tlg_np, wlg_np = np.polynomial.legendre.leggauss(nsamples)
    tlg = jnp.asarray(tlg_np, dtype=dtype)
    wlg = jnp.asarray(wlg_np, dtype=dtype) * 0.5 * (tu - tl)
    tsamples = tlg * (0.5 * (tu - tl)) + 0.5 * (tu + tl)
    xsamples = jnp.tan(tsamples).reshape(nsamples, *x0.shape)
    wt = jnp.cos(tsamples) ** (-2.0)
    wp = jax.vmap(lambda x: logpfcn(x, *pparams))(xsamples)
    wsamples = wt * wlg * jnp.exp(wp.reshape(nsamples))
    wsamples = wsamples / jnp.sum(wsamples)
    return xsamples, wsamples
