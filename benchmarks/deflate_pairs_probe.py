"""Pinpoint the leftover couplings after the deflated pipeline on chip:
top-k pairs with (i, j, seg_i, seg_j, dist-to-nearest-boundary, cos)."""
import importlib, json, math, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

JE = importlib.import_module("xitorch_tpu.ops.jacobi_eigh")
DC = importlib.import_module("xitorch_tpu.ops.dc_kernel")
HI = jax.lax.Precision.HIGHEST
B, N = 64, 256

rng = np.random.default_rng(2026)
w_ = rng.standard_normal((B, N, N)).astype(np.float32) / math.sqrt(N)
a = (w_ @ np.swapaxes(w_, -1, -2) + 0.05 * np.eye(N, dtype=np.float32)).astype(np.float32)
absa = np.abs(a); diag = np.einsum("bii->bi", a)
offsum = absa.sum(-1) - np.abs(diag)
sigma = np.maximum(-(diag - offsum).min(-1), 0) + 0.01 * np.sqrt((absa**2).sum((1, 2))) + 1e-30
ash = jnp.asarray(a + sigma[:, None, None] * np.eye(N, dtype=np.float32))


def panel_with_refine(x, refine, levels=2):
    # replicate _deflated_panel with parametrized refine
    B_, n, _ = x.shape
    ns = 2 ** levels
    dt = x.dtype
    g0, T, seg = DC.dc_precondition_tpu(x, levels=levels, min_seg=2,
                                        interpret=False, return_t=True,
                                        return_seg=True, refine=refine)
    seg = seg[:, :, 0]
    w = min(n, max(32, -(-3 * n // (2 * ns * 16)) * 16))
    starts = jnp.stack(
        [jnp.clip(jnp.sum((seg < s).astype(jnp.int32), axis=-1), 0, n - w)
         for s in range(ns)], axis=1)
    loc = jnp.arange(w, dtype=dt)

    def slice_block(Tb, segb, st, sid):
        blk = jax.lax.dynamic_slice(Tb, (st, st), (w, w))
        valid = jax.lax.dynamic_slice(segb, (st,), (w,)) == sid
        vv = valid[:, None] & valid[None, :]
        blk = (jnp.where(vv, blk, jnp.asarray(0.0, dt))
               + jnp.diag(jnp.where(valid, jnp.asarray(0.0, dt), 1.0 + loc)))
        return blk, valid

    blocks, valid = [jnp.stack(xx, axis=1) for xx in zip(
        *[jax.vmap(slice_block, in_axes=(0, 0, 0, None))(
            T, seg, starts[:, s], s) for s in range(ns)])]
    from xitorch_tpu.ops import _finisher_lab as LAB
    R = LAB._window_solve(blocks.reshape(B_ * ns, w, w), max_sweeps=18,
                          interpret=False, m_cap=LAB._S1_MCAP,
                         sort_valid=valid.reshape(B_ * ns, w)
                         ).reshape(B_, ns, w, w)

    def apply_rows(Pb, Rb, st):
        rows = jax.lax.dynamic_slice(Pb, (st, 0), (Rb.shape[0], Pb.shape[-1]))
        return jax.lax.dynamic_update_slice(
            Pb, jnp.matmul(Rb, rows, precision=HI), (st, 0))

    def apply_cols(Tb, Rb, st):
        cols = jax.lax.dynamic_slice(Tb, (0, st), (Tb.shape[0], Rb.shape[0]))
        return jax.lax.dynamic_update_slice(
            Tb, jnp.matmul(cols, jnp.swapaxes(Rb, -1, -2), precision=HI),
            (0, st))

    for s in range(ns):
        g0 = jax.vmap(apply_rows)(g0, R[:, s], starts[:, s])
        T = jax.vmap(apply_rows)(T, R[:, s], starts[:, s])
        T = jax.vmap(apply_cols)(T, R[:, s], starts[:, s])
    bw = 32
    bstarts = jnp.clip(starts[:, 1:] - 16, 0, n - bw)
    bblocks = jnp.stack(
        [jax.vmap(lambda Tb, st: jax.lax.dynamic_slice(
            Tb, (st, st), (bw, bw)))(T, bstarts[:, s])
         for s in range(ns - 1)],
        axis=1).reshape(B_ * (ns - 1), bw, bw)
    from xitorch_tpu.ops import _finisher_lab as LAB
    Rb2 = LAB._window_solve(bblocks, max_sweeps=18, interpret=False,
                            m_cap=LAB._S2_MCAP).reshape(B_, ns - 1, bw, bw)
    for s in range(ns - 1):
        g0 = jax.vmap(apply_rows)(g0, Rb2[:, s], bstarts[:, s])
        T = jax.vmap(apply_rows)(T, Rb2[:, s], bstarts[:, s])
        T = jax.vmap(apply_cols)(T, Rb2[:, s], bstarts[:, s])
    return g0, T, seg, starts


def report(refine):
    g0, T, seg, starts = jax.jit(lambda x: panel_with_refine(x, refine))(ash)
    # cos field in the T^2 (panel) metric AND the T (first-power) metric
    t2 = jnp.matmul(g0, jnp.swapaxes(g0, -1, -2), precision=HI)
    d2 = jnp.sqrt(jnp.diagonal(t2, axis1=-2, axis2=-1))
    cos2 = jnp.abs(t2) / (d2[:, :, None] * d2[:, None, :] + 1e-30)
    dT = jnp.abs(jnp.diagonal(T, axis1=-2, axis2=-1))
    cosT = jnp.abs(T) / (jnp.sqrt(dT[:, :, None] * dT[:, None, :]) + 1e-30)
    eye = jnp.eye(N, dtype=bool)[None]
    cos2 = np.asarray(jnp.where(eye, 0.0, cos2))
    cosT = np.asarray(jnp.where(eye, 0.0, cosT))
    segn = np.asarray(seg); startsn = np.asarray(starts)
    # top pairs by panel-metric cos
    flat = cos2.reshape(B, -1)
    T = np.asarray(T)
    out = []
    for b in range(B):
        ij = np.argmax(flat[b])
        i, j = divmod(ij, N)
        bnds = startsn[b][1:]
        di = int(min(abs(int(i) - bnds).min(), 999))
        dj = int(min(abs(int(j) - bnds).min(), 999))
        Tn = T[b]
        lam_i, lam_j = float(Tn[i, i]), float(Tn[j, j])
        lamscale = float(np.abs(np.diagonal(Tn)).max()) + 1e-30
        out.append((float(flat[b, ij]), int(i), int(j),
                    int(segn[b, i]), int(segn[b, j]), di, dj,
                    float(cosT[b, i, j]),
                    abs(lam_i - lam_j) / lamscale))
    out.sort(reverse=True)
    print(json.dumps({"refine": refine,
                      "max5": [dict(cos2=round(o[0], 5), i=o[1], j=o[2],
                                    si=o[3], sj=o[4], dbi=o[5], dbj=o[6],
                                    cosT=round(o[7], 7),
                                    lamgap=round(o[8], 6)) for o in out[:5]],
                      "median_permat_max": float(np.median([o[0] for o in out])),
                      "cosT_max": float(cosT.max()),
                      "cos2_max": float(cos2.max())}), flush=True)


print(json.dumps({"backend": jax.devices()[0].platform}), flush=True)
report(1)
report(0)
