"""Structured-operator fused CG: TridiagLowRankOperator + Pallas kernel.

The kernel (ops/structured_cg.py) runs in interpret mode on CPU so this
suite executes the actual kernel code path; on TPU the same code
compiles via Mosaic.  Gradients flow through ``linalg.solve``'s
``custom_linear_solve`` exactly as for every other method.
"""
import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

import xitorch_tpu as xt
from xitorch_tpu.linalg import solve
from xitorch_tpu.ops.structured_cg import structured_cg_pallas


def _mk(batch=3, n=32, r=2, dtype=jnp.float32, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    d = 4.0 + jax.random.uniform(k1, (batch, n), dtype)
    c = 0.5 + 0.1 * jax.random.uniform(k2, (batch, n - 1), dtype)
    V = jax.random.normal(k3, (batch, n, r), dtype) / (n ** 0.5)
    b = jax.random.normal(k4, (batch, n, 2), dtype)
    return d, c, V, b


def test_operator_matvec_matches_fullmatrix():
    d, c, V, b = _mk()
    A = xt.TridiagLowRankOperator(d, c, V)
    x = b[..., 0]
    dense = A.fullmatrix()
    ref = jnp.einsum("...nm,...m->...n", dense, x)
    assert jnp.allclose(A.mv(x), ref, atol=1e-5)
    xt.checklinop(A)


def test_kernel_interpret_matches_dense():
    d, c, V, b = _mk()
    A = xt.TridiagLowRankOperator(d, c, V)
    cl, cu = A.full_couplings()
    x, it, res = structured_cg_pallas(d, cl, cu, V, b[..., 0],
                                      rtol=1e-6, atol=1e-9, interpret=True)
    ref = jnp.linalg.solve(A.fullmatrix(), b[..., 0:1])[..., 0]
    assert jnp.max(jnp.abs(x - ref)) < 1e-4
    assert float(jnp.max(res)) < 1e-4


def test_solve_method_structured_cg():
    d, c, V, b = _mk()
    A = xt.TridiagLowRankOperator(d, c, V)
    x, info = solve(A, b, method="structured_cg", rtol=1e-6, atol=1e-9,
                    interpret=True, return_info=True)
    ref = jnp.linalg.solve(A.fullmatrix(), b)
    assert jnp.max(jnp.abs(x - ref)) < 1e-4
    assert float(info["converged"]) == 1.0


def test_solve_structured_cg_grads():
    d, c, V, b = _mk(batch=2, n=16, r=1)

    def f(d, c, V, b):
        A = xt.TridiagLowRankOperator(d, c, V)
        return solve(A, b, method="structured_cg", rtol=1e-10, atol=1e-12,
                     interpret=True)

    check_grads(f, (d.astype(jnp.float64), c.astype(jnp.float64),
                    V.astype(jnp.float64), b.astype(jnp.float64)),
                order=2, modes=["rev"], atol=1e-4, rtol=1e-4)


def test_pure_tridiag_direct_path():
    d, c, V, b = _mk()
    A = xt.TridiagLowRankOperator(d, c)  # V=None -> direct Thomas
    x = solve(A, b, method="structured_cg", interpret=True)
    ref = jnp.linalg.solve(A.fullmatrix(), b)
    assert jnp.max(jnp.abs(x - ref)) < 1e-4


def test_scalar_coupling_and_no_coupling():
    d, c, V, b = _mk()
    A = xt.TridiagLowRankOperator(d, jnp.asarray(0.7), V)
    dense = A.fullmatrix()
    lowrank = jnp.einsum("...nk,...mk->...nm", V, V)
    assert jnp.allclose(dense[..., 0, 1] - lowrank[..., 0, 1], 0.7)
    x = solve(A, b, method="structured_cg", interpret=True,
              rtol=1e-7, atol=1e-9)
    assert jnp.max(jnp.abs(jnp.linalg.solve(dense, b) - x)) < 2e-4

    A0 = xt.TridiagLowRankOperator(d)  # diagonal only
    x0 = solve(A0, b, method="structured_cg", interpret=True)
    assert jnp.max(jnp.abs(x0 - b / d[..., None])) < 1e-5


def test_e_shift_stays_on_kernel():
    # (A - e_j I) x_j = b_j per column: a diagonal shift keeps the
    # structure (this is symeig's implicit-gradient shifted solve)
    d, c, V, b = _mk()
    A = xt.TridiagLowRankOperator(d, c, V)
    E = -jnp.asarray([1.0, 2.5], jnp.float32)  # below spectrum: posdef
    x, info = solve(A, b, E=E, method="structured_cg", rtol=1e-6,
                    atol=1e-9, interpret=True, return_info=True)
    assert float(info["converged"]) == 1.0
    dense = A.fullmatrix()
    eye = jnp.eye(d.shape[-1], dtype=jnp.float32)
    for j in range(2):
        ref = jnp.linalg.solve(dense - E[j] * eye, b[..., j:j + 1])[..., 0]
        assert jnp.max(jnp.abs(x[..., j] - ref)) < 2e-4


def test_symeig_grads_with_structured_bck():
    # lowest eigenvalue of a structured operator, implicit gradients with
    # the structured kernel doing the shifted backward solves
    from xitorch_tpu.linalg import symeig

    d, c, V, _ = _mk(batch=2, n=24, r=1)

    def f(dd):
        A = xt.TridiagLowRankOperator(dd, c, V)
        evals, _ = symeig(A, 2, "lowest", method="exacteig",
                          bck_options={"method": "structured_cg",
                                       "interpret": True})
        return jnp.sum(evals)

    g = jax.grad(f)(d)
    # Hellmann-Feynman: dE/dd_i = sum_k |psi_k(i)|^2
    A = xt.TridiagLowRankOperator(d, c, V)
    _, vecs = jnp.linalg.eigh(A.fullmatrix())
    ref = jnp.sum(vecs[..., :2] ** 2, axis=-1)
    assert jnp.max(jnp.abs(g - ref)) < 1e-3


def test_fallback_f64_uses_cg():
    # float64 is not kernel-eligible; the method silently falls back to cg
    d, c, V, b = _mk(dtype=jnp.float64)
    A = xt.TridiagLowRankOperator(d, c, V)
    x = solve(A, b, method="structured_cg", rtol=1e-12, atol=1e-14)
    ref = jnp.linalg.solve(A.fullmatrix(), b)
    assert jnp.max(jnp.abs(x - ref)) < 1e-9


def test_bad_shapes_raise():
    d = jnp.ones((3, 8))
    with pytest.raises(RuntimeError):
        xt.TridiagLowRankOperator(d, jnp.ones((3, 5)))
    with pytest.raises(RuntimeError):
        xt.TridiagLowRankOperator(d, None, jnp.ones((3, 7, 2)))


def test_structured_cg_shard_map_matches_single():
    """dp-sharded structured solve via shard_map == unsharded (the Pallas
    call is per-device; shard_map is the multi-chip pattern for it)."""
    from jax.sharding import PartitionSpec as P

    from xitorch_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 devices")

    d, c, V, b = _mk(batch=8, n=32, r=2)
    mesh = make_mesh(4, axis_names=("dp",))

    def local_solve(d, c, V, b):
        A = xt.TridiagLowRankOperator(d, c, V)
        return solve(A, b, method="structured_cg", rtol=1e-7, atol=1e-10,
                     interpret=True)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, so shard_map's vma check must be off for kernel bodies
    sharded = jax.shard_map(local_solve, mesh=mesh,
                            in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                            out_specs=P("dp"), check_vma=False)
    xs = jax.jit(sharded)(d, c, V, b)
    x1 = local_solve(d, c, V, b)
    assert jnp.max(jnp.abs(xs - x1)) < 1e-5


def test_banded_operator_matvec_and_solve():
    """Pentadiagonal + low-rank: bands at offsets 1 and 2."""
    k = jax.random.split(jax.random.PRNGKey(3), 5)
    B, n, r = 3, 40, 2
    d = 6.0 + jax.random.uniform(k[0], (B, n), jnp.float32)
    c1 = 0.5 * jax.random.uniform(k[1], (B, n - 1), jnp.float32)
    c2 = 0.3 * jax.random.uniform(k[2], (B, n - 2), jnp.float32)
    V = jax.random.normal(k[3], (B, n, r), jnp.float32) / (n ** 0.5)
    b = jax.random.normal(k[4], (B, n, 2), jnp.float32)

    A = xt.BandedLowRankOperator(d, {1: c1, 2: c2}, V)
    dense = A.fullmatrix()
    x0 = b[..., 0]
    ref_mv = jnp.einsum("...nm,...m->...n", dense, x0)
    assert jnp.max(jnp.abs(A.mv(x0) - ref_mv)) < 1e-5
    xt.checklinop(A)

    # rtol 1e-6: the honest measured-residual info reports converged
    # against the REQUESTED tolerance, and 1e-7 sits below the f32
    # achievable floor eps*||A||*||x|| for this system
    x, info = solve(A, b, method="structured_cg", rtol=1e-6, atol=1e-8,
                    interpret=True, return_info=True)
    ref = jnp.linalg.solve(dense, b)
    assert jnp.max(jnp.abs(x - ref)) < 2e-4
    assert float(info["converged"]) == 1.0


def test_banded_operator_grads():
    k = jax.random.split(jax.random.PRNGKey(4), 5)
    B, n = 2, 16
    d = 5.0 + jax.random.uniform(k[0], (B, n), jnp.float64)
    c2 = 0.4 * jax.random.uniform(k[1], (B, n - 2), jnp.float64)
    V = jax.random.normal(k[2], (B, n, 1), jnp.float64) / 4.0
    b = jax.random.normal(k[3], (B, n, 1), jnp.float64)

    def f(d, c2, V, b):
        A = xt.BandedLowRankOperator(d, {2: c2}, V)
        return solve(A, b, method="structured_cg", rtol=1e-11, atol=1e-13,
                     interpret=True)

    check_grads(f, (d, c2, V, b), order=2, modes=["rev"],
                atol=1e-4, rtol=1e-4)


def test_banded_no_lowrank_and_scalar_bands():
    d = 4.0 + jax.random.uniform(jax.random.PRNGKey(5), (2, 24), jnp.float32)
    A = xt.BandedLowRankOperator(d, {3: jnp.asarray(0.5)})
    b = jax.random.normal(jax.random.PRNGKey(6), (2, 24, 1), jnp.float32)
    x = solve(A, b, method="structured_cg", rtol=1e-7, atol=1e-10,
              interpret=True)
    ref = jnp.linalg.solve(A.fullmatrix(), b)
    assert jnp.max(jnp.abs(x - ref)) < 2e-4


def test_banded_bad_offsets_raise():
    d = jnp.ones((8,))
    with pytest.raises(RuntimeError):
        xt.BandedLowRankOperator(d, {0: jnp.ones((8,))})
    with pytest.raises(RuntimeError):
        xt.BandedLowRankOperator(d, {2: jnp.ones((3,))})


def test_structured_thomas_singular_shift_reports_failure():
    # regression: the direct Thomas path hardcoded converged=1/resid=0,
    # hiding garbage from (near-)singular E-shifted systems
    import warnings

    from xitorch_tpu import TridiagLowRankOperator
    from xitorch_tpu.linalg import solve

    n = 16
    d = jnp.full((n,), 2.0, jnp.float32)
    c = jnp.full((n - 1,), -1.0, jnp.float32)
    A = TridiagLowRankOperator(d, c)
    lam0 = float(jnp.linalg.eigvalsh(A.fullmatrix())[0])
    b = jnp.ones((n, 1), jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x, info = solve(A, b, E=jnp.asarray([lam0], jnp.float32),
                        method="structured_cg", return_info=True,
                        interpret=True)
    assert float(info["converged"]) == 0.0
    # a regular shift still reports success
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x2, info2 = solve(A, b, E=jnp.asarray([0.11], jnp.float32),
                          method="structured_cg", return_info=True,
                          interpret=True)
    assert float(info2["converged"]) == 1.0


def test_structured_default_method_stays_matrix_free():
    # regression: method=None routed structured operators to dense
    # exactsolve via the fullmatrix capability flag
    from xitorch_tpu import TridiagLowRankOperator
    from xitorch_tpu.linalg import solve

    n = 64
    d = jnp.full((n,), 4.0)
    A = TridiagLowRankOperator(d, jnp.full((n - 1,), 1.0))
    b = jnp.ones((n, 2))
    x = solve(A, b)  # must pick structured_cg (cg fallback on CPU)
    assert jnp.max(jnp.abs(A.mm(x) - b)) < 1e-5


def test_banded_diag_low_rank_default_solve():
    # regression: empty band set crashed full_bands() through the new
    # structured default route
    from xitorch_tpu import BandedLowRankOperator
    from xitorch_tpu.linalg import solve

    n = 32
    d = jnp.full((n,), 4.0)
    V = 0.1 * jnp.ones((n, 2))
    A = BandedLowRankOperator(d, bands=None, V=V)
    b = jnp.ones((n, 1))
    x = solve(A, b)
    assert jnp.max(jnp.abs(A.mm(x) - b)) < 1e-5
    x2 = solve(A, b, method="structured_cg", interpret=True)
    assert jnp.max(jnp.abs(A.mm(x2) - b)) < 1e-4
