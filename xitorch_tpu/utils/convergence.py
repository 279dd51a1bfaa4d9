"""Failure-detection helpers over the ``(solution, info)`` convention.

SURVEY §5 "Failure detection": the reference's solvers warn and return
the best iterate; its *benchmarks* escalate the warning to a hard error
(reference benchmarks/benchmarks_solve.py:61-65).  This module gives
users the same escalation as an API — eagerly as a plain raise, under
``jit`` via ``jax.experimental.checkify`` (functionalized errors).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["assert_converged"]


def assert_converged(info, what: str = "solve") -> None:
    """Raise if an info struct reports non-convergence.

    ``info`` is the dict returned by any functional with
    ``return_info=True`` (keys ``converged``/``iterations``/``resid``/
    ``resid_rel``).

    * Eager: raises :class:`RuntimeError` immediately.
    * Under ``jax.jit``/``vmap``: uses ``checkify.check`` — wrap the
      caller with ``jax.experimental.checkify.checkify`` and inspect the
      returned error, e.g.::

          err, x = checkify.checkify(solve_and_assert)(A, b)
          err.throw()   # raises on any non-converged element
    """
    conv = jnp.asarray(info["converged"])
    if not isinstance(conv, jax.core.Tracer):
        if float(jnp.min(conv)) < 1.0:
            raise RuntimeError(
                "%s did not converge after %d iterations (final residual "
                "%.3e, %.1fx the tolerance)"
                % (what, int(jnp.max(info["iterations"])),
                   float(jnp.max(info["resid"])),
                   float(jnp.max(info["resid_rel"]))))
        return
    from jax.experimental import checkify

    checkify.check(
        jnp.min(conv) >= 1.0,
        what + " did not converge: residual {r} ({rr}x the tolerance)",
        r=jnp.max(jnp.asarray(info["resid"])),
        rr=jnp.max(jnp.asarray(info["resid_rel"])))
