"""Pallas TPU kernel for lane-major batched RNEA derivatives.

The XLA lane-major formulation (rbda._rnea_derivatives_flat) cut the
analytic-derivative pass from 72 to 34 ms at batch 512 x N14, but it still
materializes ~10 GB of (n, nv, 6, B) intermediates in HBM — 30x above the
~1 ms speed-of-light set by the pass's true in/out traffic (~90 MB).
This kernel keeps the heavy pass VMEM-resident: grid over 128-lane batch
tiles, one tile = one full derivative computation.

Mosaic-safe structure (round-3 lessons, solver/pallas_fac.py):
- structure-of-arrays over the 6 spatial components: every tensor is a
  Python list of arrays shaped (L, S, T) with L = links/dofs (leading,
  untiled, freely indexable), S = the second structural dim (sublanes),
  T = the 128-wide batch tile (lanes) — cross products are explicit
  component formulas, pure elementwise;
- the constant ancestry contractions run as UNROLLED TREE RECURSIONS
  (prefix sums over parents / subtree sums over children) of leading-dim
  slices — no dot_generals, no reshapes or transposes on tiled dims;
- no scatters: the external-force corrections at constant joints fold
  into the (linear) subtree sums as rank-1 anc-row broadcasts;
- tensors needed in both column (per-dof leading) and row (per-dof
  sublane) layouts — S_w, sdot — are passed in twice; the cheap O(n*6)
  forward quantities (V, A, Iv, IA, f) are computed outside in XLA.

Numerics match rbda.rnea_derivatives / _rnea_derivatives_flat to f32
roundoff (tests/test_pallas_rbda.py, interpret mode off-TPU).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rbda import (
    GRAVITY,
    fk,
    _world_motion_axes,
    _world_inertias,
    _ancestry_mask,
    _mcross_tb,
    _fcross_tb,
)

TILE = 128


def _cross3(a, b):
    """Component-list cross product (broadcasting elementwise arrays)."""
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _madd(x, y):
    return [xi + yi for xi, yi in zip(x, y)]


def _mcross(m1, m2):
    """motion_cross on component lists: [w1 x v2 + v1 x w2, w1 x w2]."""
    v1, w1 = m1[:3], m1[3:]
    v2, w2 = m2[:3], m2[3:]
    return _madd(_cross3(w1, v2), _cross3(v1, w2)) + _cross3(w1, w2)


def _fcross(m, f):
    """motion_cross_star on component lists: [w x fl, w x tau + v x fl]."""
    v, w = m[:3], m[3:]
    fl, tau = f[:3], f[3:]
    return _cross3(w, fl) + _madd(_cross3(w, tau), _cross3(v, fl))


def _topo(model):
    """Static tree data: parents and a child map."""
    n = model.n_links
    parent = [int(model.parent[i]) for i in range(n)]
    children = [[] for _ in range(n)]
    for i in range(1, n):
        children[parent[i]].append(i)
    return n, parent, children


def _rnea_derivs_kernel(model, ee_frames,
                        st_c_ref, st_r_ref, it_ref, vt_ref, at_ref,
                        sdr_ref, vl_ref, a_ref, iv_ref, ia_ref, f_ref,
                        fw_ref, pf_ref, anc_ref, dm_ref, ancc_ref, ancr_ref,
                        out_dq_ref, out_dv_ref, out_da_ref, out_df_ref):
    n, parent, children = _topo(model)
    # Constant 0/1 masks arrive as inputs (pallas_call forbids captured
    # constants): anc3 (n, nv, 1), DM3 (nv, nv, 1), plus per-joint anc rows
    # in column (n, nv, 1, 1) and row (n, 1, nv, 1) layouts for the
    # external-force rank-1 corrections.
    anc3 = anc_ref[...]
    DM3 = dm_ref[...]

    def anc_n(X):
        """out[i] = sum_m anc[i, m] X[m]: prefix sums down the tree.
        X: (nv, S, T) -> (n, S, T)."""
        L = [None] * n
        L[0] = X[0] + X[1] + X[2] + X[3] + X[4] + X[5]
        for i in range(1, n):
            L[i] = L[parent[i]] + X[6 + i - 1]
        return jnp.concatenate([x[None] for x in L], axis=0)

    def anc_k(Y):
        """out[k] = sum_i anc[i, k] Y[i]: subtree sums up the tree.
        Y: (n, S, T) -> (nv, S, T)."""
        S = [None] * n
        for i in range(n - 1, -1, -1):
            acc = Y[i]
            for c in children[i]:
                acc = acc + S[c]
            S[i] = acc
        rows = [S[0]] * 6 + [S[i] for i in range(1, n)]
        return jnp.concatenate([r[None] for r in rows], axis=0)

    def dof_gather(X):
        """(n, S, T) -> (nv, S, T): the link carrying each dof (6 base
        copies of link 0, then links 1..n-1)."""
        base = jnp.concatenate([X[0:1]] * 6, axis=0)
        return jnp.concatenate([base, X[1:]], axis=0)

    # ---- load (component lists) ------------------------------------------
    St_c = [st_c_ref[d] for d in range(6)]  # (nv, 1, T)
    St_r = [st_r_ref[d] for d in range(6)]  # (1, nv, T)
    It = [[it_ref[d, e] for e in range(6)] for d in range(6)]  # (n, 1, T)
    vt = vt_ref[...]  # (nv, 1, T)
    at = at_ref[...]
    sdot_r = [sdr_ref[d] for d in range(6)]  # (1, nv, T)
    Vl = [vl_ref[d] for d in range(6)]  # (n, 1, T)
    A = [a_ref[d] for d in range(6)]
    Iv = [iv_ref[d] for d in range(6)]
    IA = [ia_ref[d] for d in range(6)]
    f = [f_ref[d] for d in range(6)]

    svt = [St_c[d] * vt for d in range(6)]  # (nv, 1, T)
    Vdof = [dof_gather(Vl[d]) for d in range(6)]  # (nv, 1, T)

    # ---- d/da --------------------------------------------------------------
    # ISm[i, m] = sum_e I_i[d, e] s_m[e];  Z = anc_k(anc * ISm)
    dtau_da = jnp.zeros(out_da_ref.shape, out_da_ref.dtype)
    for d in range(6):
        ISm_d = sum(It[d][e] * St_r[e] for e in range(6))  # (n, nv, T)
        dtau_da = dtau_da + St_c[d] * anc_k(anc3 * ISm_d)
    out_da_ref[...] = dtau_da

    # ---- shared: dV_q[i, j] = s_j x (sum_m anc[i,m] DM[m,j] sv_m) ----------
    Vt = [anc_n(DM3 * svt[d]) for d in range(6)]  # (n, j, T)
    dV_q = _mcross(St_r, Vt)  # (n, j, T)

    # ---- d/dv ---------------------------------------------------------------
    dV_v = [anc3 * St_r[d] for d in range(6)]  # (n, m, T)
    dA_v = [dV_q[d] + anc3 * sdot_r[d] for d in range(6)]
    IdA_v = [sum(It[d][e] * dA_v[e] for e in range(6)) for d in range(6)]
    IdV_v = [sum(It[d][e] * dV_v[e] for e in range(6)) for d in range(6)]
    df_v = _madd(IdA_v, _madd(_fcross(dV_v, Iv), _fcross(Vl, IdV_v)))
    dtau_dv = jnp.zeros(out_dv_ref.shape, out_dv_ref.dtype)
    for d in range(6):
        dtau_dv = dtau_dv + St_c[d] * anc_k(df_v[d])
    out_dv_ref[...] = dtau_dv

    # ---- d/dq ---------------------------------------------------------------
    crossSS = _mcross(St_r, St_c)  # [m, j] = s_j x s_m  (nv, nv, T)
    dS = [DM3 * crossSS[d] for d in range(6)]
    dV_q_dof = [dof_gather(dV_q[d]) for d in range(6)]  # (nv, j, T)
    dsdot = _madd(
        _mcross(dV_q_dof, St_c),
        [DM3 * x for x in _mcross(Vdof, crossSS)],
    )
    dA_q = [anc_n(dS[d] * at + dsdot[d] * vt) for d in range(6)]  # (n, j, T)
    SxIA = _fcross(St_r, IA)  # (n, j, T) via (1,j,T)x(n,1,T) broadcasts
    SxA = _mcross(St_r, A)
    SxIv = _fcross(St_r, Iv)
    SxV = _mcross(St_r, Vl)
    dIA, dIv = [], []
    for d in range(6):
        I_SxA_d = sum(It[d][e] * SxA[e] for e in range(6))
        I_dA_q_d = sum(It[d][e] * dA_q[e] for e in range(6))
        dIA.append(anc3 * (SxIA[d] - I_SxA_d) + I_dA_q_d)
        I_SxV_d = sum(It[d][e] * SxV[e] for e in range(6))
        I_dV_q_d = sum(It[d][e] * dV_q[e] for e in range(6))
        dIv.append(anc3 * (SxIv[d] - I_SxV_d) + I_dV_q_d)
    df_q = _madd(dIA, _madd(_fcross(dV_q, Iv), _fcross(Vl, dIv)))

    # ---- subtree sums + external frame forces (linear corrections) ---------
    F_dof = [anc_k(f[d]) for d in range(6)]  # (k, 1, T)
    Zq = [anc_k(df_q[d]) for d in range(6)]  # (k, j, T)
    df_cols = []
    for idx, fname in enumerate(ee_frames):
        jid = model.frames[fname].parent_joint
        a_col = ancc_ref[jid]  # (k, 1, 1)
        a_row = ancr_ref[jid]  # (1, j, 1)
        fw3 = [fw_ref[3 * idx + c] for c in range(3)]  # (1, T)
        pf3 = [pf_ref[idx, c] for c in range(3)]  # (1, T)
        # f[jid] -= [fw, p_f x fw]  ->  F_dof[k] -= anc[jid,k] * delta
        pxf = _cross3(pf3, fw3)
        for d in range(6):
            delta = fw3[d] if d < 3 else pxf[d - 3]
            F_dof[d] = F_dof[d] - a_col * delta[None]
        # arm[c] = s[:3] + s[3:] x p_f, in both layouts
        arm_c = _madd(St_c[:3], _cross3(St_c[3:], [p[None] for p in pf3]))
        arm_r = _madd(St_r[:3], _cross3(St_r[3:], [p[None] for p in pf3]))
        # df_q[jid, j] -= [0, (anc[jid,j] arm_j) x fw]
        dFx_ang = _cross3([a_row * x for x in arm_r], [w[None] for w in fw3])
        for d in range(3):
            Zq[3 + d] = Zq[3 + d] - a_col * dFx_ang[d]
        # dtau/df columns: -anc[jid, k] arm[c][k]
        for c in range(3):
            df_cols.append(-a_col * arm_c[c])  # (k, 1, T)
    if df_cols:
        out_df_ref[...] = jnp.concatenate(
            [c[None] for c in df_cols], axis=0)  # (3*n_f, k, 1, T)
    else:
        out_df_ref[...] = jnp.zeros(out_df_ref.shape, out_df_ref.dtype)

    # ---- dtau_dq -------------------------------------------------------------
    dtau_dq = jnp.zeros(out_dq_ref.shape, out_dq_ref.dtype)
    for d in range(6):
        dtau_dq = dtau_dq + dS[d] * F_dof[d] + St_c[d] * Zq[d]
    out_dq_ref[...] = dtau_dq


def rnea_derivatives_pallas(model, q, v, a, ee_frames=(), forces_world=None,
                            interpret=False):
    """Flat-leading-batch analytic RNEA derivatives on TPU via Pallas.

    Same contract as mapping rbda.rnea_derivatives over axis 0 of
    (q, v, a, forces_world). The O(n*6) forward quantities (FK chain, link
    velocities/accelerations, body forces) are computed in XLA (cheap);
    the O(n*nv*6) derivative pass runs in VMEM, one 128-lane tile per
    grid step."""
    B = q.shape[0]
    nv = model.nv
    n = model.n_links
    with_f = forces_world is not None and len(ee_frames) > 0
    n_f = len(ee_frames) if with_f else 0

    def chain(q1):
        R_w, p_w = fk(model, q1)
        Sw = _world_motion_axes(model, R_w, p_w)
        I_w = _world_inertias(model, R_w, p_w)
        if with_f:
            pf = jnp.stack([
                R_w[model.frames[fn].parent_joint]
                @ jnp.asarray(model.frames[fn].p)
                + p_w[model.frames[fn].parent_joint]
                for fn in ee_frames
            ])  # (n_f, 3)
        else:
            pf = jnp.zeros((1, 3), dtype=q.dtype)
        return Sw, I_w, pf

    Sw, I_w, pf = jax.vmap(chain)(q)

    Bp = -(-B // TILE) * TILE
    pad = Bp - B
    dof_link = np.asarray([0] * 6 + list(range(1, n)))

    def tbm(x):  # (B, ...) -> (..., Bp)
        y = jnp.moveaxis(x, 0, -1)
        if pad:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
        return y

    # Forward world-frame quantities, trailing-batch (cheap XLA side).
    St = tbm(Sw)  # (nv, 6, Bp)
    It6 = tbm(I_w)  # (n, 6, 6, Bp)
    vt = tbm(v)  # (nv, Bp)
    at = tbm(a)
    anc = jnp.asarray(_ancestry_mask(model))
    svt = St * vt[:, None, :]
    Vl = jnp.tensordot(anc, svt, axes=([1], [0]))  # (n, 6, Bp)
    Vdof = Vl[dof_link]
    sdot = _mcross_tb(Vdof, St)  # (nv, 6, Bp)
    g_vec = jnp.concatenate(
        [jnp.array([0.0, 0.0, GRAVITY]), jnp.zeros(3)]).astype(q.dtype)
    sa = St * at[:, None, :] + sdot * vt[:, None, :]
    A = jnp.tensordot(anc, sa, axes=([1], [0])) + g_vec[None, :, None]
    Iv = sum(It6[:, :, e, :] * Vl[:, e, :][:, None, :] for e in range(6))
    IA = sum(It6[:, :, e, :] * A[:, e, :][:, None, :] for e in range(6))
    fb = IA + _fcross_tb(Vl, Iv)  # (n, 6, Bp)

    # Kernel input layouts: component-major with (L, S, T) blocks.
    st_c = St.transpose(1, 0, 2)[:, :, None, :]  # (6, nv, 1, Bp)
    st_r = St.transpose(1, 0, 2)[:, None, :, :]  # (6, 1, nv, Bp)
    it = It6.transpose(1, 2, 0, 3)[:, :, :, None, :]  # (6, 6, n, 1, Bp)
    vt_k = vt[:, None, :]  # (nv, 1, Bp)
    at_k = at[:, None, :]
    sdr = sdot.transpose(1, 0, 2)[:, None, :, :]  # (6, 1, nv, Bp)
    vl_k = Vl.transpose(1, 0, 2)[:, :, None, :]  # (6, n, 1, Bp)
    a_k = A.transpose(1, 0, 2)[:, :, None, :]
    iv_k = Iv.transpose(1, 0, 2)[:, :, None, :]
    ia_k = IA.transpose(1, 0, 2)[:, :, None, :]
    f_k = fb.transpose(1, 0, 2)[:, :, None, :]
    if with_f:
        fw = tbm(forces_world)[:, None, :]  # (3*n_f, 1, Bp)
        pfk = tbm(pf)[:, :, None, :]  # (n_f, 3, 1, Bp)
    else:
        fw = jnp.zeros((3, 1, Bp), dtype=q.dtype)
        pfk = jnp.zeros((1, 3, 1, Bp), dtype=q.dtype)

    def spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape + (TILE,), lambda i, z=zeros: z + (i,))

    def cspec(shape):  # constant (grid-invariant) input
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z)

    anc_m = np.asarray(_ancestry_mask(model), dtype=np.float32)
    anc_in = jnp.asarray(anc_m)[:, :, None]  # (n, nv, 1)
    dm_in = jnp.asarray(anc_m[dof_link])[:, :, None]  # (nv, nv, 1)
    ancc_in = jnp.asarray(anc_m)[:, :, None, None]  # (n, nv, 1, 1)
    ancr_in = jnp.asarray(anc_m)[:, None, :, None]  # (n, 1, nv, 1)

    ncol = max(3 * n_f, 1)
    out_shapes = [
        jax.ShapeDtypeStruct((nv, nv, Bp), q.dtype),  # dq
        jax.ShapeDtypeStruct((nv, nv, Bp), q.dtype),  # dv
        jax.ShapeDtypeStruct((nv, nv, Bp), q.dtype),  # da
        jax.ShapeDtypeStruct((ncol, nv, 1, Bp), q.dtype),  # df (col-major)
    ]
    kern = functools.partial(
        _rnea_derivs_kernel, model, tuple(ee_frames) if with_f else ())
    dq_t, dv_t, da_t, df_t = pl.pallas_call(
        kern,
        grid=(Bp // TILE,),
        in_specs=[
            spec((6, nv, 1)), spec((6, 1, nv)), spec((6, 6, n, 1)),
            spec((nv, 1)), spec((nv, 1)),
            spec((6, 1, nv)), spec((6, n, 1)), spec((6, n, 1)),
            spec((6, n, 1)), spec((6, n, 1)), spec((6, n, 1)),
            spec((fw.shape[0], 1)), spec((pfk.shape[0], 3, 1)),
            cspec((n, nv, 1)), cspec((nv, nv, 1)),
            cspec((n, nv, 1, 1)), cspec((n, 1, nv, 1)),
        ],
        out_shape=out_shapes,
        out_specs=[
            spec((nv, nv)), spec((nv, nv)), spec((nv, nv)),
            spec((ncol, nv, 1)),
        ],
        interpret=interpret,
        # The live set peaks at ~17 MB for the flagship shape (nv=24,
        # n=19), just over the 16 MB default scoped-vmem limit; v5e has
        # 128 MB of VMEM, so give the kernel headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(st_c, st_r, it, vt_k, at_k, sdr, vl_k, a_k, iv_k, ia_k, f_k, fw, pfk,
      anc_in, dm_in, ancc_in, ancr_in)

    def lb(x):  # (..., Bp) -> (B, ...)
        return jnp.moveaxis(x[..., :B], -1, 0)

    outs = (lb(dq_t), lb(dv_t), lb(da_t))
    if with_f:
        outs = outs + (lb(df_t[:, :, 0, :]).transpose(0, 2, 1),)
    return outs
