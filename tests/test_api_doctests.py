"""Execute the Examples blocks of the public API docstrings.

The reference runs doctests over its docs in CI
(/root/reference/.github/workflows/ci.yml:60-66); our equivalent executes
the doctest examples embedded in the *synthesized* API docstrings (the
docstrings themselves are built by _docstr/api_docstr.py at import, so this
also proves the synthesis produced well-formed text for every method).
"""
import doctest

import pytest

import xitorch_tpu as xt
from xitorch_tpu.integrate import mcquad, quad, solve_ivp
from xitorch_tpu.interpolate import Interp1D
from xitorch_tpu.linalg import solve, symeig
from xitorch_tpu.optimize import equilibrium, minimize, rootfinder

_API = [solve, symeig, rootfinder, equilibrium, minimize, quad, solve_ivp,
        mcquad, Interp1D]


@pytest.mark.parametrize("fn", _API, ids=lambda f: f.__name__)
def test_api_docstring_examples_execute(fn):
    assert fn.__doc__, "%s lost its docstring" % fn.__name__
    parser = doctest.DocTestParser()
    test = parser.get_doctest(fn.__doc__, {"xt": xt}, fn.__name__,
                              fn.__name__, 0)
    assert test.examples, (
        "%s has no executable Examples block" % fn.__name__)
    runner = doctest.DocTestRunner(verbose=False,
                                   optionflags=doctest.ELLIPSIS)
    runner.run(test)
    res = runner.summarize(verbose=False)
    assert res.failed == 0, (
        "%d doctest failure(s) in %s docstring" % (res.failed, fn.__name__))


def test_every_registered_method_has_docstring_section():
    """The synthesized docstring must carry one section per registry
    method (the synthesis contract of _docstr/api_docstr.py)."""
    from xitorch_tpu.linalg.solve import _SOLVE_METHODS
    from xitorch_tpu.linalg.symeig import _SYMEIG_METHODS

    for name in _SOLVE_METHODS:
        assert ('method="%s"' % name) in solve.__doc__, name
    for name in _SYMEIG_METHODS:
        assert ('method="%s"' % name) in symeig.__doc__, name
