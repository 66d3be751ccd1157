"""Batched Pallas micro-kernel for the small-block Cholesky-inverse bases.

Motivation (round-3 TPU anatomy): the block-tridiagonal factorization is
launch-latency-bound, not compute-bound — XLA runs the per-node small
Cholesky as a While loop (one serialized dispatch per column, ~2.2k per
tick at N=14) and the fully-unrolled XLA alternative trades loop steps
for thousands of tiny (16, 16) ops (rejected in round 1: 10x slower).
The whole-factorization Pallas kernel (pallas_fac.py) fixes the dispatch
problem but serializes the scenario batch on the single TensorCore, so at
batch 512 it LOSES ~250 ms/tick (round-3 battery runs 02/06/07).

This kernel takes the middle road: only the base-case Cholesky inverse
(b <= ~32) moves into Pallas, BATCHED over scenarios inside one kernel
call — the unrolled column recurrence and the nilpotent-doubling
triangular inverse become straight-line vector ops on (cb, b, b) tiles
with NO per-step dispatch, while the recursion's big panel GEMMs stay in
XLA on the MXU where a (512, 56, 56) batched matmul is already optimal.

The batch is delivered explicitly via jax.custom_batching.custom_vmap:
under the production vmap-over-scenarios, the rule fires once with the
whole batch instead of Pallas lifting the batch into a serialized grid.

Symmetry trick: the Schur complements stay symmetric through the
recurrence, so column j equals row j — both the (cb, b, 1) column and the
(cb, 1, b) row views are plain slices, and the kernel needs no in-kernel
transposes (Mosaic transposes are expensive; dynamic_update_slice is
unsupported, hence one-hot accumulation, cf. pallas_fac.py).

Reference context: this implements the Blasfeo-style packed small-matrix
factorization role inside the Fatrop KKT solve (SURVEY.md L5;
/root/reference/optimization/ocp.py:248-263 hot loop).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bmm(A, B, b):
    """Per-scenario (cb, b, b) @ (cb, b, b) via an unrolled k-loop of
    rank-1 FMAs — keeps the lane batch intact (a lane-batched contraction
    is not an MXU op; for b <= 32 the VPU FMA chain is cheap)."""
    out = A[:, :, :1] * B[:, :1, :]
    for k in range(1, b):
        out = out + A[:, :, k:k + 1] * B[:, k:k + 1, :]
    return out


def _base_kernel(S_ref, out_ref, *, b):
    """Linv of (cb, b, b) SPD blocks: unrolled right-looking Cholesky +
    nilpotent-doubling triangular inverse, all straight-line vector code."""
    A = S_ref[...]
    dt = A.dtype
    rows = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    lanes = lax.broadcasted_iota(jnp.int32, (1, 1, b), 2)
    rows3 = lax.broadcasted_iota(jnp.int32, (1, b, b), 1)
    cols3 = lax.broadcasted_iota(jnp.int32, (1, b, b), 2)

    L = jnp.zeros_like(A)
    dinv_r = jnp.zeros_like(A[:, :1, :])  # (cb, 1, b): dinv along lanes
    dinv_c = jnp.zeros_like(A[:, :, :1])  # (cb, b, 1): dinv along rows
    for j in range(b):
        d = lax.rsqrt(A[:, j:j + 1, j:j + 1])  # (cb, 1, 1)
        col = jnp.where(rows >= j, A[:, :, j:j + 1] * d, jnp.zeros((), dt))
        # symmetry: row j of A is column j transposed — no transpose op
        row = jnp.where(lanes >= j, A[:, j:j + 1, :] * d, jnp.zeros((), dt))
        oh_r = (lanes == j).astype(dt)  # (1, 1, b)
        oh_c = (rows == j).astype(dt)   # (1, b, 1)
        L = L + col * oh_r
        dinv_r = dinv_r + d * oh_r
        dinv_c = dinv_c + d * oh_c
        if j < b - 1:
            A = A - col * row
    # L^-1 = (sum_k N^k) D^-1 with N = -D^-1 (strictly-lower L), N^b = 0
    strict = (rows3 > cols3).astype(dt)
    N = -(L * strict) * dinv_c
    P = (rows3 == cols3).astype(dt) + N
    k = 1
    while k < b - 1:
        N = _bmm(N, N, b)
        P = P + _bmm(N, P, b)
        k *= 2
    out_ref[...] = P * dinv_r


@functools.partial(jax.jit, static_argnames=("cb", "interpret"))
def chol_inv_base_batched(S, cb=128, interpret=False):
    """Linv of a batch of small SPD blocks: S (B, b, b) -> (B, b, b).

    One Pallas call; grid over ceil(B / cb) chunks of cb scenarios each.
    """
    B, b, _ = S.shape
    npad = (-B) % cb
    if npad:
        # identity-pad so the padded instances stay SPD
        eye = jnp.broadcast_to(jnp.eye(b, dtype=S.dtype), (npad, b, b))
        S = jnp.concatenate([S, eye], axis=0)
    n = S.shape[0] // cb
    out = pl.pallas_call(
        functools.partial(_base_kernel, b=b),
        out_shape=jax.ShapeDtypeStruct(S.shape, S.dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec((cb, b, b), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((cb, b, b), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(S)
    return out[:B] if npad else out
