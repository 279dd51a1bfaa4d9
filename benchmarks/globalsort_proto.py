"""CPU prototype: DC(refine=1) -> GLOBAL rank sort by diag(T) ->
fixed equal unmasked window solves -> boundary windows.  Measures the
coupling field at each stage to test whether this pipeline reaches the
finisher tolerance (0 sweeps) where the segment-aligned one stalls."""
import math
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from xitorch_tpu.ops.dc_kernel import dc_precondition_tpu

HI = jax.lax.Precision.HIGHEST
B, N, LEVELS = 4, 256, 2
NS = 2 ** LEVELS
W = N // NS
BW = 32

rng = np.random.default_rng(2026)


def mk(kind):
    if kind == "wishart":
        w_ = rng.standard_normal((B, N, N)).astype(np.float32) / math.sqrt(N)
        a = w_ @ np.swapaxes(w_, -1, -2) + 0.05 * np.eye(N, dtype=np.float32)
    elif kind == "clustered":
        lam = np.sort(np.concatenate([
            rng.uniform(0.1, 0.11, (B, N // 4)),
            rng.uniform(1.0, 1.01, (B, N // 4)),
            rng.uniform(2.0, 4.0, (B, N // 2))], axis=1), axis=1)
        q, _ = np.linalg.qr(rng.standard_normal((B, N, N)))
        a = np.einsum("bik,bk,bjk->bij", q, lam, q).astype(np.float32)
        a = (a + np.swapaxes(a, -1, -2)) / 2
    else:  # degenerate
        lam = np.sort(np.concatenate([
            np.full((B, N // 2), 1.0),
            rng.uniform(2.0, 5.0, (B, N - N // 2))], axis=1), axis=1)
        q, _ = np.linalg.qr(rng.standard_normal((B, N, N)))
        a = np.einsum("bik,bk,bjk->bij", q, lam, q).astype(np.float32)
        a = (a + np.swapaxes(a, -1, -2)) / 2
    # gershgorin shift like jacobi_eigh does
    absa = np.abs(a)
    diag = np.einsum("bii->bi", a)
    offsum = absa.sum(-1) - np.abs(diag)
    sigma = (np.maximum(-(diag - offsum).min(-1), 0)
             + 0.01 * np.sqrt((absa ** 2).sum((1, 2))) + 1e-30)
    return a + sigma[:, None, None] * np.eye(N, dtype=np.float32)


def maxcos(T):
    d = np.sqrt(np.abs(np.einsum("bii->bi", T))) + 1e-30
    c = np.abs(T) / (d[:, :, None] * d[:, None, :])
    c[:, np.arange(N), np.arange(N)] = 0.0
    return c


def field_stats(tag, T):
    c = maxcos(T)
    print("  %-28s max=%.3e  n>tol=%d  n>1e-3=%d" %
          (tag, c.max(), int((c > 7.6e-6).sum()), int((c > 1e-3).sum())))
    return c


for kind in ("wishart", "clustered", "degenerate"):
    print("== %s ==" % kind)
    ash = jnp.asarray(mk(kind))
    g0, T, seg = dc_precondition_tpu(ash, levels=LEVELS, min_seg=2,
                                     interpret=True, return_t=True,
                                     return_seg=True, refine=1)
    g0 = np.asarray(g0, np.float64)
    T = np.asarray(T, np.float64)
    field_stats("after DC(refine=1)", T)
    # cross coupling between rank-sorted fixed windows BEFORE solves:
    order = np.argsort(np.einsum("bii->bi", T), axis=-1)
    Ts = np.stack([T[b][order[b]][:, order[b]] for b in range(B)])
    g0s = np.stack([g0[b][order[b]] for b in range(B)])
    cpre = maxcos(Ts)
    mask_in = np.zeros((N, N), bool)
    for k in range(NS):
        mask_in[k * W:(k + 1) * W, k * W:(k + 1) * W] = True
    print("  pre-solve cross-window field   max=%.3e" %
          cpre[:, ~mask_in].max())
    # stage 1: exact equal-window solves (numpy eigh = ideal kernel)
    for k in range(NS):
        sl = slice(k * W, (k + 1) * W)
        blk = (Ts[:, sl, sl] + np.swapaxes(Ts[:, sl, sl], -1, -2)) / 2
        _, v = np.linalg.eigh(blk)   # ascending
        R = np.swapaxes(v, -1, -2)
        g0s[:, sl, :] = R @ g0s[:, sl, :]
        Ts[:, sl, :] = R @ Ts[:, sl, :]
        Ts[:, :, sl] = Ts[:, :, sl] @ np.swapaxes(R, -1, -2)
    field_stats("after stage-1 windows", Ts)
    # stage 2: boundary windows
    for k in range(1, NS):
        sl = slice(k * W - BW // 2, k * W + BW // 2)
        blk = (Ts[:, sl, sl] + np.swapaxes(Ts[:, sl, sl], -1, -2)) / 2
        _, v = np.linalg.eigh(blk)
        R = np.swapaxes(v, -1, -2)
        g0s[:, sl, :] = R @ g0s[:, sl, :]
        Ts[:, sl, :] = R @ Ts[:, sl, :]
        Ts[:, :, sl] = Ts[:, :, sl] @ np.swapaxes(R, -1, -2)
    c = field_stats("after boundary windows", Ts)
    # where do survivors live?
    if c.max() > 7.6e-6:
        b, i, j = np.unravel_index(np.argmax(c), c.shape)
        lam = np.einsum("bii->bi", Ts)
        print("  worst pair b=%d i=%d j=%d cos=%.3e relgap=%.3e "
              "(win %d vs %d)" % (b, i, j, c.max(),
                                  abs(lam[b, i] - lam[b, j]) /
                                  (abs(lam[b]).max()), i // W, j // W))
