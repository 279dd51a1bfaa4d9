"""Monte-Carlo quadrature (expectation values) with score-function gradients.

API parity with /root/reference/xitorch/integrate/mcquad.py:13-61.  The
reference implements REINFORCE gradients by hand in an autograd Function
with a *recursive* backward so higher orders work (_MCQuad :146-247).  Here
the same estimator — and all of its higher-order generalizations — comes
from plain AD through a **self-normalized importance-ratio surrogate**:

    epf = sum_i w_i r_i f(x_i, θ_f) / sum_i w_i r_i,
    r_i = exp(logp(x_i, θ_p) - stop_grad(logp(x_i, θ_p)))

The samples are drawn once with stop-gradded θ_p (sampling is never
differentiated; same role as ctx.xsamples reuse, reference :127).  At the
evaluation point r_i = 1 so the value is the plain weighted average; its
first θ_p-derivative is exactly E[(f - E[f])·∂logp] (the reference's
backward :182-237), and every higher derivative is the corresponding exact
importance-sampling identity — no custom rule needed.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence, Union

import jax
import jax.numpy as jnp

from xitorch_tpu._impls.integrate.mcmc import dummy1d, mh, mhcustom
from xitorch_tpu.optimize.rootfinder import _partition_params
from xitorch_tpu.utils.misc import get_method

__all__ = ["mcquad"]

_MCQUAD_METHODS = {
    "mh": mh,
    "mhcustom": mhcustom,
    "_dummy1d": dummy1d,
    "dummy1d": dummy1d,
}


def mcquad(ffcn: Callable, log_pfcn: Callable, x0: jnp.ndarray,
           fparams: Sequence[Any] = (),
           pparams: Sequence[Any] = (),
           bck_options: Mapping[str, Any] = {},
           method: Union[str, Callable, None] = None,
           **fwd_options):
    r"""Compute :math:`\mathbb{E}_p[f]` by Monte-Carlo sampling of
    ``log_pfcn(x, *pparams)`` (unnormalized) and averaging
    ``ffcn(x, *fparams)`` (array or pytree output).

    Gradients (any order) flow to fparams and pparams; sampling itself is
    treated as non-differentiable (score-function estimator).

    Methods: "mh" (Metropolis-Hastings, nchains vmapped parallel chains;
    options nsamples, nburnout, step_size, nchains, seed/key), "mhcustom"
    (option custom_step(key, x, *pparams)),
    "dummy1d" (deterministic 1-D test sampler; options nsamples, lb, ub),
    or a custom callable ``(log_pfcn, x0, pparams, **cfg)`` returning
    ``(xsamples, wsamples)``.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from xitorch_tpu.integrate import mcquad
    >>> ev = mcquad(lambda x: x, lambda x, mu: -0.5 * ((x - mu) ** 2).sum(),
    ...             jnp.zeros(1), pparams=(jnp.array([0.5]),),
    ...             method="dummy1d", nsamples=100)
    >>> bool(jnp.abs(ev[0] - 0.5) < 1e-4)
    True
    """
    if method is None:
        method = "mh"
    method_fcn = get_method("mcquad", _MCQUAD_METHODS, method)

    fdyn, fmerge = _partition_params(fparams)
    pdyn, pmerge = _partition_params(pparams)

    # draw samples with gradients blocked
    pdyn_sg = jax.lax.stop_gradient(pdyn)
    xs, ws = method_fcn(lambda x, *pd: log_pfcn(x, *pmerge(pd)),
                        x0, pdyn_sg, **fwd_options)
    xs = jax.lax.stop_gradient(xs)
    ws = jax.lax.stop_gradient(ws)

    # self-normalized importance-ratio surrogate (exact value, exact grads)
    logp = jax.vmap(lambda x: log_pfcn(x, *pmerge(pdyn)))(xs)  # (nsamples,)
    logp = logp.reshape(xs.shape[0])
    r = jnp.exp(logp - jax.lax.stop_gradient(logp))
    wr = ws * r
    denom = jnp.sum(wr)

    fs = jax.vmap(lambda x: ffcn(x, *fmerge(fdyn)))(xs)  # pytree, leading nsamples
    return jax.tree_util.tree_map(
        lambda v: jnp.tensordot(wr, v, axes=(0, 0),
                        precision=jax.lax.Precision.HIGHEST) / denom, fs)


# docstring completion
from xitorch_tpu._docstr.api_docstr import get_methods_docstr  # noqa: E402

mcquad.__doc__ = get_methods_docstr(mcquad, {"mh": mh, "mhcustom": mhcustom})
