"""Complex-hermitian eigh on the chip (VERDICT r3 item 6): measure the
batched c64 decomposition through the public symeig path — the Pallas
complex-pair Jacobi kernel inside its validated window (n <= 512) and the
XLA eigh fallback beyond it — and record where the fallback takes over
and at what relative cost.

Lines (JSON): batched (64, 256, 256) c64 exacteig with the kernel ON and
OFF (ops.jacobi_eigh.ENABLED), one n=700 batched point (always the XLA
fallback), and the reference torch CPU number for the same matrices.

Run alone on the chip: python benchmarks/bench_complex_eigh.py [--with-ref]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import maybe_force_cpu as _maybe_force_cpu  # noqa: E402

_maybe_force_cpu()

import importlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from xitorch_tpu import LinearOperator
from xitorch_tpu.linalg import symeig

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")

K, NEIG = 8, 8


def herm_np(seed, b, n):
    # host-side generation: the axon tunnel cannot transfer c64 arrays
    # back to host (UNIMPLEMENTED), so matrices and the oracle live in
    # numpy and only the timing body ships to the device
    rng = np.random.default_rng(seed)
    a = (rng.standard_normal((b, n, n)).astype(np.float32)
         + 1j * rng.standard_normal((b, n, n)).astype(np.float32)
         ).astype(np.complex64) / math.sqrt(n)
    return (a + np.swapaxes(a, -1, -2).conj()) / 2


def timed_pair(body, mats, rep=3):
    def run_k(m, nk):
        def b(s, k):
            evals, _ = body(m + (k * 0.0))
            return s + jnp.sum(evals), None
        s, _ = lax.scan(b, jnp.asarray(0.0, jnp.float32), jnp.arange(nk))
        return s

    f1 = jax.jit(lambda m: run_k(m, 1))
    fK = jax.jit(lambda m: run_k(m, K))
    float(f1(mats)); float(fK(mats))

    def t(f):
        ts = []
        for _ in range(rep):
            t0 = time.perf_counter(); float(f(mats))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((t(fK) - t(f1)) / (K - 1), 1e-9)


def measure(b, n, kernel_on):
    mats_np = herm_np(n, b, n)
    mats = jnp.asarray(mats_np)
    old = JE.ENABLED
    JE.ENABLED = kernel_on
    try:
        def body(m):
            A = LinearOperator.m(m, is_hermitian=True)
            return symeig(A, NEIG, "lowest", method="exacteig")

        # accuracy gate vs the f64 numpy oracle before timing
        evals, evecs = jax.jit(body)(mats)
        oracle = np.linalg.eigvalsh(mats_np.astype(np.complex128)
                                    )[:, :NEIG]
        scale = float(np.max(np.abs(oracle))) + 1e-30
        err = float(np.max(np.abs(np.asarray(evals) - oracle))) / scale
        assert err < 5e-5, "c64 eigh err %g (b=%d n=%d)" % (err, b, n)
        per = timed_pair(body, mats)
        print(json.dumps({
            "metric": "batched c64 symeig exacteig decomps/sec",
            "B": b, "n": n,
            "path": "jacobi-complex-kernel" if kernel_on and
                    JE.use_jacobi_for(mats) else "xla-eigh",
            "value": round(b / per, 1), "acc_err_rel": err}), flush=True)
    finally:
        JE.ENABLED = old


def ref_cpu(b, n):
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch as xtr  # noqa: F401 (used via xtr.linalg below)
    import xitorch.linalg  # noqa: F401
    torch.set_num_threads(1)
    t_m = torch.tensor(herm_np(n, b, n), dtype=torch.complex64)

    def run():
        A = xtr.LinearOperator.m(t_m, is_hermitian=True)
        return xtr.linalg.symeig(A, NEIG, "lowest", method="exacteig")

    run()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    print(json.dumps({"metric": "REF c64 symeig exacteig decomps/sec",
                      "B": b, "n": n,
                      "value": round(b / min(ts), 1)}), flush=True)


def measure_kernel_packed(b, n):
    """The axon image cannot execute OR transfer c64 at all
    (UNIMPLEMENTED even for a host->device copy of a c64 array), so the
    full public complex path cannot run on this chip; real TPUs support
    c64 via XLA decomposition.  What CAN be measured here is the
    complex-pair Pallas kernel itself — the packed [Re A | -Im A] real
    planes it operates on (jacobi_eigh's own packing, ops/jacobi_eigh.py
    "if iscomplex") are host-packed and shipped as f32; the sweep kernel
    is bit-identical to what a real TPU would run after packing."""
    mats_np = herm_np(n, b, n)
    planes = np.concatenate([mats_np.real, -mats_np.imag],
                            axis=-1).astype(np.float32)
    pj = jnp.asarray(planes)
    tol = float(np.finfo(np.float32).eps) * 4.0 * math.sqrt(n)

    def body(p):
        gt2 = JE._pallas_g_panel(p, 18, tol, False, complexpair=True)
        # eigenvalue extraction from row norms (real arithmetic): the
        # full path's c64 polish cannot run on this image
        return jnp.sqrt(jnp.sum(gt2 * gt2, axis=-1)), None

    # quality gate: eigenvalues of the shifted matrix from row norms
    # vs the f64 oracle (the kernel runs on the UNSHIFTED hermitian
    # input here: PSD only after the caller's shift; emulate it)
    absa = np.abs(mats_np)
    diag = np.real(np.einsum("bii->bi", mats_np))
    offsum = absa.sum(-1) - np.abs(diag)
    sigma = (np.maximum(-(diag - offsum).min(-1), 0)
             + 0.01 * np.linalg.norm(mats_np, axis=(1, 2)).real + 1e-30)
    sh = mats_np + sigma[:, None, None] * np.eye(n, dtype=np.complex64)
    planes_s = np.concatenate([sh.real, -sh.imag], axis=-1).astype(np.float32)
    pjs = jnp.asarray(planes_s)
    lam_shift = np.sort(np.asarray(jax.jit(lambda p: body(p)[0])(pjs)),
                        axis=-1) - sigma[:, None]
    oracle = np.linalg.eigvalsh(mats_np.astype(np.complex128))
    scale = float(np.max(np.abs(oracle))) + 1e-30
    err = float(np.max(np.abs(lam_shift - oracle))) / scale
    per = timed_pair(lambda m: body(m), pjs)
    print(json.dumps({
        "metric": "batched c64 symeig PACKED-KERNEL decomps/sec",
        "B": b, "n": n, "path": "jacobi-complex-kernel (sweep + eigenvalue "
        "extraction; c64 polish excluded — this image cannot execute c64)",
        "value": round(b / per, 1), "acc_err_rel": err}), flush=True)


def measure_svd_packed(b, m, n):
    """Complex SVD chip row (VERDICT r4 item 4b): the packed-plane
    Hestenes kernel on [Re(A^T) | Im(A^T)] host-packed f32 planes —
    bit-identical to jacobi_svd's complex branch after packing (this
    image cannot transfer c64; see measure_kernel_packed).  Singular
    values come straight from row norms (no PSD shift needed — s >= 0
    natively, one reason the native path beats the Gram route); the
    U/V polish (a few c64 matmuls on a real TPU) is excluded, like the
    eigh row's Rayleigh polish."""
    rng = np.random.default_rng(m * 1000 + n)
    a = (rng.standard_normal((b, m, n)).astype(np.float32)
         + 1j * rng.standard_normal((b, m, n)).astype(np.float32)
         ).astype(np.complex64) / math.sqrt(n)
    at = np.swapaxes(a, -1, -2)              # rows = columns of A
    planes = np.concatenate([at.real, at.imag], axis=-1).astype(np.float32)
    pj = jnp.asarray(planes)
    tol = float(np.finfo(np.float32).eps) * 4.0 * math.sqrt(n)

    def body(p):
        gt2 = JE._pallas_g_panel(p, 18, tol, False, complexpair=True)
        return jnp.sqrt(jnp.sum(gt2 * gt2, axis=-1)), None

    sv = np.sort(np.asarray(jax.jit(lambda p: body(p)[0])(pj)), axis=-1)
    oracle = np.sort(np.linalg.svd(a.astype(np.complex128),
                                   compute_uv=False), axis=-1)
    scale = float(oracle.max()) + 1e-30
    err = float(np.max(np.abs(sv - oracle))) / scale
    assert err < 5e-5, "c64 svd err %g (b=%d m=%d n=%d)" % (err, b, m, n)
    per = timed_pair(lambda p: body(p), pj)
    print(json.dumps({
        "metric": "batched c64 SVD PACKED-KERNEL decomps/sec",
        "B": b, "m": m, "n": n,
        "path": "jacobi-complex-pair Hestenes (sweeps + singular values "
        "from row norms; U/V polish excluded — this image cannot "
        "execute c64)",
        "value": round(b / per, 1), "acc_err_rel": err}), flush=True)


def ref_cpu_svd(b, m, n):
    sys.path.insert(0, "/root/reference")
    import torch
    import xitorch as xtr  # noqa: F401
    import xitorch.linalg  # noqa: F401
    torch.set_num_threads(1)
    rng = np.random.default_rng(m * 1000 + n)
    a = (rng.standard_normal((b, m, n)).astype(np.float32)
         + 1j * rng.standard_normal((b, m, n)).astype(np.float32)
         ).astype(np.complex64) / math.sqrt(n)
    t_m = torch.tensor(a)

    def run():
        A = xtr.LinearOperator.m(t_m)
        return xtr.linalg.svd(A, k=min(m, n))

    run()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); run(); ts.append(time.perf_counter() - t0)
    print(json.dumps({"metric": "REF c64 svd decomps/sec (Gram route)",
                      "B": b, "m": m, "n": n,
                      "value": round(b / min(ts), 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-ref", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    if jax.default_backend() == "cpu":
        measure(64, 256, kernel_on=True)     # complex-pair kernel window
        measure(64, 256, kernel_on=False)    # XLA eigh, same matrices
        measure(8, 700, kernel_on=True)      # past the window: XLA fallback
    else:
        measure_kernel_packed(64, 256)
        measure_kernel_packed(8, 512)        # top of the hardware-probed
        # window (m=1 per program under the raised _CX_VMEM_LIMIT)
        measure_svd_packed(64, 256, 256)
        measure_svd_packed(32, 384, 128)     # rectangular (tall) panel
    if args.with_ref:
        ref_cpu(64, 256)
        ref_cpu(8, 700)
        ref_cpu_svd(64, 256, 256)
        ref_cpu_svd(32, 384, 128)


if __name__ == "__main__":
    main()
