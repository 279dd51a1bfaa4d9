"""Core misc tests: Packer, EditableModule shim, debug mode, utils, docstr
(model: reference test_packer.py / test_editable_module.py / test_debug.py /
test_utils.py)."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xitorch_tpu import Packer, EditableModule
from xitorch_tpu.debug import enable_debug, is_debug_enabled
from xitorch_tpu.utils import (
    get_bcasted_dims, normalize_bcast_dims, match_dim, tallqr,
    get_np_dtype, get_jax_dtype, get_method, set_default_option,
    get_attr, set_attr, deprecated,
)
from tests.utils import assert_allclose


# ------------------------- Packer -------------------------

def test_packer_roundtrip(rng):
    obj = {"a": jnp.asarray(rng.standard_normal(3)),
           "b": (jnp.asarray(rng.standard_normal((2, 2))),
                 jnp.asarray(rng.standard_normal(1)))}
    p = Packer(obj)
    flat = p.get_param_tensor()
    assert flat.shape == (8,)
    obj2 = p.construct_from_tensor(flat * 2)
    assert_allclose(obj2["a"], obj["a"] * 2)
    assert_allclose(obj2["b"][0], obj["b"][0] * 2)

    leaves = p.get_param_tensor_list()
    obj3 = p.construct_from_tensor_list(leaves)
    assert_allclose(obj3["a"], obj["a"])

    with pytest.raises(RuntimeError):
        p.construct_from_tensor(jnp.zeros(5))


def test_packer_grad(rng):
    obj = {"w": jnp.asarray(rng.standard_normal((3, 3)))}

    def loss(flat):
        o = Packer(obj).construct_from_tensor(flat)
        return jnp.sum(o["w"] ** 2)

    flat = Packer(obj).get_param_tensor()
    g = jax.grad(loss)(flat)
    assert_allclose(g, 2 * flat)


# ------------------------- EditableModule -------------------------

class Mod(EditableModule):
    def __init__(self, a, b):
        self.a = a
        self.sub = {"b": b}

    def forward(self, x):
        return self.a * x + self.sub["b"]

    def getparamnames(self, methodname, prefix=""):
        if methodname == "forward":
            return [prefix + "a", prefix + "sub[b]"]
        raise KeyError(methodname)


def test_editable_module_get_set(rng):
    a = jnp.asarray(2.0)
    b = jnp.asarray(3.0)
    m = Mod(a, b)
    params = m.getparams("forward")
    assert len(params) == 2
    assert_allclose(params[0], 2.0)
    assert_allclose(params[1], 3.0)
    m.setparams("forward", jnp.asarray(5.0), jnp.asarray(7.0))
    assert_allclose(m.forward(jnp.asarray(1.0)), 12.0)


def test_attr_utils():
    class Obj:
        pass

    o = Obj()
    o.x = [1, 2, {"k": 3}]
    assert get_attr(o, "x[1]") == 2
    assert get_attr(o, "x[2][k]") == 3
    set_attr(o, "x[0]", 10)
    assert o.x[0] == 10


# ------------------------- debug mode -------------------------

def test_debug_mode_flag():
    assert not is_debug_enabled()
    with enable_debug():
        assert is_debug_enabled()
    assert not is_debug_enabled()


def test_debug_cli(tmp_path):
    script = tmp_path / "s.py"
    script.write_text(
        "from xitorch_tpu.debug import is_debug_enabled\n"
        "print('DEBUG_IS', is_debug_enabled())\n")
    out = subprocess.run(
        [sys.executable, "-m", "xitorch_tpu.debug", str(script)],
        capture_output=True, text=True, env={"PATH": "/usr/bin:/bin",
                                             "PYTHONPATH": "/root/repo",
                                             "JAX_PLATFORMS": "cpu"})
    assert "DEBUG_IS True" in out.stdout, out.stderr


# ------------------------- utils -------------------------

def test_bcast_utils():
    assert get_bcasted_dims((3, 1), (1, 4)) == (3, 4)
    assert normalize_bcast_dims((2,), (3, 2)) == [[1, 2], [3, 2]]
    a, b = match_dim(jnp.zeros((2, 5)), jnp.zeros((7,)))
    assert a.shape == (2, 5) and b.shape == (2, 7)


def test_tallqr(rng):
    V = jnp.asarray(rng.standard_normal((3, 10, 4)))
    Q, R = tallqr(V)
    assert_allclose(jnp.swapaxes(Q, -2, -1) @ Q,
                    jnp.broadcast_to(jnp.eye(4), (3, 4, 4)), atol=1e-7)
    assert_allclose(Q @ R, V, atol=1e-7)


def test_dtype_maps():
    assert get_np_dtype(jnp.float32) == np.float32
    assert get_jax_dtype("float64") == jnp.dtype(jnp.float64)
    assert get_jax_dtype("torch.float32") == jnp.dtype(jnp.float32)


def test_get_method_registry():
    methods = {"foo": lambda: 1}
    assert get_method("x", methods, "foo")() == 1
    custom = lambda: 2
    assert get_method("x", methods, custom)() == 2
    with pytest.raises(RuntimeError):
        get_method("x", methods, "bar")
    with pytest.raises(TypeError):
        get_method("x", methods, 3)


def test_set_default_option():
    assert set_default_option({"a": 1, "b": 2}, {"b": 3}) == {"a": 1, "b": 3}


def test_deprecated_decorator():
    @deprecated("2026-01-01")
    def f():
        return 7

    with pytest.warns(DeprecationWarning):
        assert f() == 7


def test_docstrings_have_methods_section():
    from xitorch_tpu.optimize import rootfinder
    from xitorch_tpu.linalg import solve, symeig
    from xitorch_tpu.integrate import solve_ivp
    for fn, m in [(rootfinder, "broyden1"), (solve, "bicgstab"),
                  (symeig, "davidson"), (solve_ivp, "rk45")]:
        assert ('method="%s"' % m) in fn.__doc__


def test_serving_export_roundtrip(rng):
    """AOT export -> serialize -> deserialize -> serve a solver."""
    import xitorch_tpu.serving as serving
    from xitorch_tpu import LinearOperator
    from xitorch_tpu.linalg import solve

    a = rng.standard_normal((6, 6))
    mat = jnp.asarray(a @ a.T + 6 * np.eye(6))
    b = jnp.asarray(rng.standard_normal((6, 2)))

    def fn(mat, b):
        return solve(LinearOperator.m(mat, is_hermitian=True), b, method="cg",
                     rtol=1e-10, atol=1e-12)

    blob = serving.export_bytes(fn, (mat, b))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 100
    served = serving.import_bytes(blob)
    assert_allclose(served(mat, b), jnp.linalg.solve(mat, b), rtol=1e-6)

    compiled = serving.aot_compile(fn, (mat, b))
    assert_allclose(compiled(mat, b), jnp.linalg.solve(mat, b), rtol=1e-6)


def test_serving_export_kron_direct(rng):
    """The Kronecker direct solve (degen_eigh + transforms) exports too."""
    import xitorch_tpu.serving as serving
    from xitorch_tpu import KronSumOperator
    from xitorch_tpu.linalg import solve

    a1 = rng.standard_normal((5, 5))
    a2 = rng.standard_normal((4, 4))
    A1 = jnp.asarray(a1 @ a1.T + 5 * np.eye(5))
    A2 = jnp.asarray(a2 @ a2.T + 4 * np.eye(4))
    b = jnp.asarray(rng.standard_normal((20, 2)))

    def fn(A1, A2, b):
        return solve(KronSumOperator(A1, A2, is_hermitian=True), b,
                     method="kron_direct")

    blob = serving.export_bytes(fn, (A1, A2, b))
    served = serving.import_bytes(blob)
    dense = KronSumOperator(A1, A2, is_hermitian=True).fullmatrix()
    assert_allclose(dense @ served(A1, A2, b), b, atol=1e-8)


def test_debug_assert_fcn_params():
    """Debug mode validates user callables with a framework message instead
    of a raw tracer error (reference assertfuncs.py:11-21 usage)."""
    import jax.numpy as jnp
    import pytest

    from xitorch_tpu.debug import enable_debug
    from xitorch_tpu.optimize import rootfinder
    from xitorch_tpu.integrate import solve_ivp

    def good(y, a):
        return jnp.tanh(a @ y) + y / 2

    def wrong_arity(y):
        return y

    def wrong_shape(y, a):
        return jnp.sum(y)[None]

    a = jnp.eye(3) * 0.3
    y0 = jnp.zeros(3)
    with enable_debug():
        y = rootfinder(good, y0, params=(a,), method="broyden1")
        assert y.shape == (3,)
        with pytest.raises(RuntimeError, match="rootfinder fcn"):
            rootfinder(wrong_arity, y0, params=(a,))
        with pytest.raises(RuntimeError, match="rootfinder fcn"):
            rootfinder(wrong_shape, y0, params=(a,))
        with pytest.raises(RuntimeError, match="solve_ivp fcn"):
            solve_ivp(lambda t, y: y * 0, jnp.linspace(0, 1, 3), y0,
                      params=(a,))


def test_assertfuncs_helpers():
    import pytest

    from xitorch_tpu.utils.assertfuncs import (
        assert_broadcastable, assert_runtime, assert_type,
    )

    assert_broadcastable((3, 1, 5), (4, 5))
    with pytest.raises(RuntimeError, match="broadcastable"):
        assert_broadcastable((3, 2, 5), (4, 5))
    with pytest.raises(RuntimeError, match="nope"):
        assert_runtime(False, "nope")
    with pytest.raises(TypeError):
        assert_type(False, "bad type")


def test_assert_converged_eager_and_checkify():
    import warnings

    import xitorch_tpu as xt
    from xitorch_tpu.linalg import solve

    n = 24
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float64) / n**0.5
    mat = a @ a.T + 2 * jnp.eye(n)
    A = xt.LinearOperator.m(mat, is_hermitian=True)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, 2), jnp.float64)

    # converged: no raise
    x, info = solve(A, b, method="cg", return_info=True)
    xt.assert_converged(info)

    # starved iteration budget: eager raise with the residual in the message
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x, info = solve(A, b, method="cg", max_niter=1, return_info=True)
    with pytest.raises(RuntimeError, match="did not converge"):
        xt.assert_converged(info)

    # under jit: checkify functionalizes the error
    from jax.experimental import checkify

    def solve_and_assert(b):
        x, info = solve(A, b, method="cg", max_niter=1, return_info=True)
        xt.assert_converged(info)
        return x

    err, _ = jax.jit(checkify.checkify(solve_and_assert))(b)
    with pytest.raises(Exception, match="did not converge"):
        err.throw()


def test_profile_and_annotate(tmp_path):
    import xitorch_tpu as xt

    with xt.debug.profile(str(tmp_path)):
        with xt.debug.annotate("region"):
            y = jnp.sum(jnp.ones((8, 8)) * 2.0)
            y.block_until_ready()
    import os
    # a trace directory with at least one event file must exist
    found = [p for p, _, fs in os.walk(tmp_path) for f in fs]
    assert found, "profiler produced no trace files"
