"""Execute the ```python blocks in doc/**/*.md (the reference doctests its
docs in CI, ci.yml:60-66 — this is the analog, keeping examples honest).

Each file runs in one namespace seeded with a per-file preamble providing
the free variables the prose introduces; optional post-block hooks adjust
bindings between blocks (e.g. where the prose switches A from an array
parameter to a LinearOperator).
"""
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

import xitorch_tpu as xt
from xitorch_tpu.linalg import solve
from xitorch_tpu.optimize import equilibrium, rootfinder

DOC_DIR = os.path.join(os.path.dirname(__file__), "..", "doc")

_BLOCK_RE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _blocks(relpath):
    with open(os.path.join(DOC_DIR, relpath)) as f:
        return _BLOCK_RE.findall(f.read())


def _run(relpath, ns, pre_hooks=None):
    """Execute blocks in order.  ``pre_hooks`` maps a substring of a
    block's source to a function(ns) run BEFORE that block — keyed on
    content, not index, so doc edits cannot silently shift bindings."""
    blocks = _blocks(relpath)
    assert blocks, "no python blocks found in %s" % relpath
    fired = set()
    for i, src in enumerate(blocks):
        if pre_hooks:
            for key, hook in pre_hooks.items():
                if key in src:
                    hook(ns)
                    fired.add(key)
        try:
            exec(compile(src, "%s[block %d]" % (relpath, i), "exec"), ns)
        except Exception as e:  # pragma: no cover - diagnostic
            raise AssertionError(
                "doc example %s block %d failed: %s\n---\n%s"
                % (relpath, i, e, src)) from e
    if pre_hooks:
        missing = set(pre_hooks) - fired
        assert not missing, "pre_hooks never matched a block: %s" % missing


def _base_ns(rng):
    n = 6
    a = rng.standard_normal((n, n))
    Amat = jnp.asarray(a @ a.T + n * np.eye(n))
    return {
        "jax": jax, "jnp": jnp, "np": np, "xt": xt,
        "Amat": Amat, "n": n,
    }


def test_doc_functionals(rng):
    ns = _base_ns(rng)
    n = ns["n"]
    Amat = ns["Amat"]
    x = jnp.linspace(0.0, 1.0, 17)
    ns.update({
        "A": Amat * 0.1,                       # array param for optimize
        "y0": jnp.zeros(n),
        "B": jnp.asarray(rng.standard_normal((n, 2))),
        "E": jnp.asarray([0.05, -0.02]),
        "M": xt.LinearOperator.m(Amat / n, is_hermitian=True),
        "f": lambda xx, w: jnp.exp(-w * xx ** 2),
        "w": jnp.asarray(1.3),
        "dydt": lambda t, y, aa: aa * y,
        "ts": jnp.linspace(0.0, 1.0, 5),
        "a": jnp.asarray(-0.4),
        "log_p": lambda xx, mu: -jnp.sum((xx - mu) ** 2) / 2,
        "x0": jnp.zeros(1),
        "mu": jnp.asarray([0.3]),
        "x": x,
        "ysamples": jnp.sin(x),
    })

    def before_linalg(ns):
        # the linalg section uses A as a LinearOperator
        ns["A"] = xt.LinearOperator.m(ns["Amat"], is_hermitian=True)

    def before_interp(ns):
        # the interpolation section samples y on the grid x
        x = jnp.linspace(0.0, 1.0, 17)
        ns["x"] = x
        ns["y"] = jnp.sin(3 * x)
        ns["xq"] = jnp.linspace(0.1, 0.9, 7)

    def before_jachess(ns):
        # the jac/hess section differentiates f(a, b) and scalar g(x)
        ns["f"] = lambda a, b: jnp.tanh(a) + b
        ns["g"] = lambda x: jnp.sum(x ** 3)
        ns["a"] = jnp.asarray([0.3, -0.2])
        ns["b"] = jnp.asarray([0.1, 0.4])
        ns["x"] = jnp.asarray([0.5, 1.5, -0.7])

    _run("getstart/functionals.md", ns, pre_hooks={
        "from xitorch_tpu.linalg import": before_linalg,
        "from xitorch_tpu.interpolate import": before_interp,
        "from xitorch_tpu.grad import": before_jachess,
    })


def test_doc_linearoperator(rng):
    ns = _base_ns(rng)
    ns.update({
        "B": xt.LinearOperator.m(jnp.asarray(rng.standard_normal((3, 4, 4)))),
        "b": jnp.asarray(rng.standard_normal((4, 1))),
    })

    def before_subclass(ns):
        # the ones() matrix is singular; later blocks check/solve with A —
        # use a well-conditioned hermitian batch instead
        m3 = jnp.asarray(rng.standard_normal((3, 4, 4)))
        m3 = m3 + jnp.swapaxes(m3, -2, -1) + 8 * jnp.eye(4)
        ns["A"] = xt.LinearOperator.m(m3, is_hermitian=True)

    _run("getstart/linearoperator.md", ns,
         pre_hooks={"class MyOp": before_subclass})


def test_doc_debugging(rng):
    ns = _base_ns(rng)
    A = xt.LinearOperator.m(ns["Amat"], is_hermitian=True)
    ns.update({
        "A": A,
        "B": jnp.asarray(rng.standard_normal((ns["n"], 1))),
        "y0": jnp.zeros(ns["n"]),
        "f": lambda y, Aop: jnp.tanh(Aop.mm(y[:, None])[:, 0]) + y / 2,
        "solve": solve,
        "rootfinder": rootfinder,
    })

    def reset_debug(ns):
        xt.set_debug_mode(False)

    _run("getstart/debugging.md", ns,
         pre_hooks={'method="cg", verbose=True': reset_debug})
    xt.set_debug_mode(False)


def test_doc_tpu_kernels(rng):
    ns = _base_ns(rng)
    _run("getstart/tpu_kernels.md", ns)


def test_doc_custom_method(rng):
    ns = _base_ns(rng)
    ns.update({
        "A": ns["Amat"] * 0.05,
        "y0": jnp.zeros(ns["n"]),
        "f": lambda y, A: jnp.tanh(A @ y + 0.1),
        "equilibrium": equilibrium,
        "jnp": jnp,
    })
    _run("getstart/custom_method.md", ns)
    y = ns["y"]
    fres = ns["f"](y, ns["A"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(fres), atol=1e-6)
