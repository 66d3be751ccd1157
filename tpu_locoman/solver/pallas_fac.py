"""Pallas TPU kernel: block-tridiagonal Cholesky factorization in VMEM.

Why a hand kernel here and nowhere else (see CLAUDE.md "Pallas analysis"):
the ADMM's per-iteration sweeps are streaming batched GEMMs — XLA already
emits the right thing — but the per-tick FACTORIZATION is small-matrix
sequential linear algebra. XLA lowers jnp.linalg.cholesky / triangular
solves to While loops whose every iteration is a separately dispatched
kernel, so the 15-node scan costs thousands of launch-latency-bound steps:
measured 127 ms of a 246 ms MPC tick (B2G rnea N=14, batch 512) against
~6 ms of actual compute+bandwidth. Inside one Pallas kernel the same
sequential column/panel recurrences are straight-line vector code on data
resident in VMEM — no launches, no HBM round trips between steps.

Layout: grid = scenario batch (one kernel instance factorizes one
scenario's whole horizon; vmap lifts the caller's batch into the grid).
Per-instance VMEM: H + U + Linv + W + V at (15, 112, 128) f32 tiles
~4.3 MB, well under the ~16 MB budget.

The factor layout matches solver.qp.BlockTridiagFactor (premultiplied
W/V couplings; see qp.factorize).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST


def _dot(a, b, ta=False, tb=False):
    """f32 matmul on the MXU. The KKT factorization is precision-critical
    (bf16 passes wrecked violations 0.8 -> 190 in round 1), so every
    contraction pins HIGHEST precision + f32 accumulation."""
    dn = (((0 if ta else 1,), (1 if tb else 0,)), ((), ()))
    return lax.dot_general(
        a, b, dimension_numbers=dn, precision=_HIGH,
        preferred_element_type=jnp.float32,
    )


def _chol_unrolled(A, rows_ge, onehots):
    """Cholesky of a small (b, b) SPD value via the right-looking rank-1
    recurrence, fully unrolled: b steps of VPU ops, no control flow.
    rows_ge[j] is the precomputed (b, 1) mask rows >= j; onehots[j] the
    (1, b) indicator of column j.  Columns are accumulated with one-hot
    multiply-adds because Mosaic's TC lowering has no dynamic_update_slice
    (first real-TPU compile failed on it, round 3)."""
    b = A.shape[-1]
    L = jnp.zeros_like(A)
    dinv = jnp.zeros((1, b), dtype=A.dtype)
    for j in range(b):
        d = lax.rsqrt(A[j, j])
        col = (A[:, j] * d)[:, None]  # (b, 1)
        col = jnp.where(rows_ge[j], col, 0.0)
        L = L + col * onehots[j]
        dinv = dinv + d * onehots[j]
        if j < b - 1:
            A = A - col * col.reshape(1, b)
    return L, dinv[0]


def _tri_inv_doubling(L, dinv, strict_lower):
    """L^-1 for small lower-triangular L via scalar-diagonal nilpotent
    doubling: A = -D^-1 N is strictly lower with A^b = 0, so
    L^-1 = (sum A^k) D^-1 in ceil(log2(b)) GEMM doublings."""
    b = L.shape[-1]
    A = -(L * strict_lower) * dinv[:, None]
    P = jnp.eye(b, dtype=L.dtype) + A
    k = 1
    while k < b - 1:
        A = _dot(A, A)
        P = P + _dot(A, P)
        k *= 2
    return P * dinv[None, :]


def _chol_inv_panels(S, s, base, masks):
    """(Linv) of an (s, s) SPD value by recursive 2x2 block Cholesky with
    unrolled small bases — the in-kernel counterpart of qp.chol_inv.
    Returns only Linv (the L blocks are consumed internally)."""
    if s <= base:
        L, dinv = _chol_unrolled(S, masks[s][0], masks[s][2])
        return _tri_inv_doubling(L, dinv, masks[s][1])
    k = (s + 1) // 2
    L1i = _chol_inv_panels(S[:k, :k], k, base, masks)
    L21 = _dot(S[k:, :k], L1i, tb=True)
    S2 = S[k:, k:] - _dot(L21, L21, tb=True)
    L2i = _chol_inv_panels(S2, s - k, base, masks)
    B21 = -_dot(L2i, _dot(L21, L1i))
    top = jnp.concatenate(
        [L1i, jnp.zeros((k, s - k), dtype=S.dtype)], axis=1
    )
    bot = jnp.concatenate([B21, L2i], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _base_sizes(s, base):
    """All block sizes the recursion visits (for mask precomputation)."""
    sizes = set()

    def rec(n):
        if n <= base:
            sizes.add(n)
            return
        k = (n + 1) // 2
        rec(k)
        rec(n - k)

    rec(s)
    return sorted(sizes)


def _factorize_kernel(H_ref, U_ref, Linv_ref, W_ref, V_ref, *, K, s, base):
    """One scenario: the qp.factorize recurrence, entirely in VMEM.

        S_i = H_i - F_{i-1}^T F_{i-1} + eps I
        Linv_i = chol_inv(S_i);  F_i = Linv_i U_i
        W_i = Linv_i F_{i-1}^T;  V_i = Linv_i^T F_i
    """
    masks = {}
    for b in _base_sizes(s, base):
        rows = lax.broadcasted_iota(jnp.int32, (b, 1), 0)
        cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
        rows_ge = [rows >= j for j in range(b)]
        strict_lower = (
            lax.broadcasted_iota(jnp.int32, (b, b), 0) > cols
        ).astype(jnp.float32)
        onehots = [
            (lax.broadcasted_iota(jnp.int32, (1, b), 1) == j).astype(
                jnp.float32)
            for j in range(b)
        ]
        masks[b] = (rows_ge, strict_lower, onehots)

    eps_eye = 1e-6 * jnp.eye(s, dtype=jnp.float32)
    F_prev = jnp.zeros((s, s), dtype=jnp.float32)
    # Python-unrolled node loop: K is small (15) and each body is mostly
    # GEMMs; unrolling lets Mosaic schedule across nodes.
    for i in range(K):
        S = H_ref[i] - _dot(F_prev, F_prev, ta=True) + eps_eye
        Linv = _chol_inv_panels(S, s, base, masks)
        F = _dot(Linv, U_ref[i])
        Linv_ref[i] = Linv
        W_ref[i] = _dot(Linv, F_prev, tb=True)
        V_ref[i] = _dot(Linv, F, ta=True)
        F_prev = F


@functools.partial(jax.jit, static_argnames=("base", "interpret"))
def factorize_pallas(H, U, base=16, interpret=False):
    """Drop-in replacement for qp.factorize (same inputs/outputs): H is
    (K, s, s) diagonal blocks, U is (K-1, s, s) couplings; returns a
    BlockTridiagFactor(Linv, W, V). Batch via vmap (lifts into the Pallas
    grid)."""
    from .qp import BlockTridiagFactor

    K, s, _ = H.shape
    U_pad = jnp.concatenate(
        [U, jnp.zeros((1, s, s), dtype=H.dtype)], axis=0
    )
    kern = functools.partial(_factorize_kernel, K=K, s=s, base=base)
    out = jax.ShapeDtypeStruct((K, s, s), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    Linv, W, V = pl.pallas_call(
        kern,
        out_shape=(out, out, out),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(H.astype(jnp.float32), U_pad.astype(jnp.float32))
    return BlockTridiagFactor(Linv=Linv, W=W, V=V)
