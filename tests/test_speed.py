"""Performance regression tests (model: reference
xitorch/_tests/test_integrate_speed.py:57-66 — euler solve_ivp must stay
within a small factor of a hand-written loop)."""
import time

import jax
import jax.numpy as jnp

from xitorch_tpu.integrate import solve_ivp


def _timeit(f, *args, rep=3):
    f(*args)  # compile
    ts = []
    for _ in range(rep):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def test_ivp_euler_speed_vs_manual_loop():
    a = jnp.asarray(-0.7)
    y0 = jnp.ones(64)
    ts = jnp.linspace(0.0, 1.0, 1000)

    fcn = lambda t, y, a: a * y

    @jax.jit
    def via_solve_ivp(a, y0):
        return solve_ivp(fcn, ts, y0, params=(a,), method="euler")

    @jax.jit
    def manual(a, y0):
        def step(y, t0t1):
            t0, t1 = t0t1
            y = y + (t1 - t0) * fcn(t0, y, a)
            return y, y
        _, yt = jax.lax.scan(step, y0, (ts[:-1], ts[1:]))
        return jnp.concatenate([y0[None], yt], axis=0)

    t_lib = _timeit(via_solve_ivp, a, y0)
    t_man = _timeit(manual, a, y0)
    # reference allows < 1.5x; both are the same scan here so keep 1.5x
    assert t_lib < 1.5 * t_man + 2e-3, \
        "solve_ivp euler too slow: %.4fs vs manual %.4fs" % (t_lib, t_man)

    # backward factor (reference allows < 15x)
    @jax.jit
    def g_lib(a, y0):
        return jax.grad(lambda a: jnp.sum(via_solve_ivp(a, y0) ** 2))(a)

    @jax.jit
    def g_man(a, y0):
        return jax.grad(lambda a: jnp.sum(manual(a, y0) ** 2))(a)

    t_glib = _timeit(g_lib, a, y0)
    t_gman = _timeit(g_man, a, y0)
    assert t_glib < 15 * t_gman + 2e-2, \
        "solve_ivp euler backward too slow: %.4fs vs %.4fs" % (t_glib, t_gman)


def _live_arrays():
    import gc

    gc.collect()
    return sum(1 for o in gc.get_objects() if isinstance(o, jax.Array))


def _assert_no_leak(f, *args, reps=20, slack=10):
    jax.block_until_ready(f(*args))  # compile + steady state
    before = _live_arrays()
    for _ in range(reps):
        jax.block_until_ready(f(*args))
    after = _live_arrays()
    assert after - before < slack, \
        "live jax.Array count grew: %d -> %d" % (before, after)


def test_no_leak_solve():
    """Analog of the reference memleak tests (xitorch/_tests/test_memleak.py
    :19-177, which cover all five functionals): repeated solver calls must
    not grow the number of live device buffers."""
    from xitorch_tpu import LinearOperator
    from xitorch_tpu.linalg import solve
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 6))
    Am = jnp.asarray(a @ a.T + 6 * np.eye(6))
    Bm = jnp.asarray(rng.standard_normal((6, 2)))

    @jax.jit
    def f(Am, Bm):
        return solve(LinearOperator.m(Am, is_hermitian=True), Bm, method="cg")

    _assert_no_leak(f, Am, Bm)


def test_no_leak_symeig():
    from xitorch_tpu import LinearOperator
    from xitorch_tpu.linalg import symeig
    import numpy as np

    rng = np.random.default_rng(1)
    a = rng.standard_normal((8, 8))
    Am = jnp.asarray((a + a.T) / 2)

    @jax.jit
    def f(Am):
        A = LinearOperator.m(Am, is_hermitian=True)
        ev, X = symeig(A, 3, "lowest", method="davidson", min_eps=1e-9,
                       max_niter=500)
        return ev

    _assert_no_leak(f, Am)


def test_no_leak_rootfinder_equilibrium_minimize():
    """Memleak analogs for the optimize functionals, including their
    implicit backward (the reference's leak was in Broyden state lambdas)."""
    from xitorch_tpu.optimize import equilibrium, minimize, rootfinder

    A = jnp.eye(4) * 0.3
    y0 = jnp.zeros(4)

    @jax.jit
    def f_root(A):
        return jax.grad(lambda A: jnp.sum(
            rootfinder(lambda y, A: jnp.tanh(A @ y + 0.5) + y / 2, y0,
                       params=(A,), method="broyden1") ** 2))(A)

    @jax.jit
    def f_equil(A):
        return equilibrium(lambda y, A: jnp.tanh(A @ y + 0.5), y0,
                           params=(A,), method="anderson_acc")

    @jax.jit
    def f_min(A):
        return minimize(lambda y, A: jnp.sum((A @ y - 0.5) ** 2) + jnp.sum(y ** 2),
                        y0, params=(A,), method="broyden1")

    _assert_no_leak(f_root, A)
    _assert_no_leak(f_equil, A)
    _assert_no_leak(f_min, A)
