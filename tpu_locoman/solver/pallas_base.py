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
triangular inverse become straight-line vector ops with NO per-step
dispatch, while the recursion's big panel GEMMs stay in XLA on the MXU
where a (512, 56, 56) batched matmul is already optimal.

LAYOUT IS THE POINT: the data is transposed (outside the kernel, one
cheap XLA transpose each way) to (b, b, cb) with the SCENARIO CHUNK IN
THE LANE DIMENSION. The natural (cb, b, b) layout pads b=14 lanes to 128
(9x VMEM/bandwidth waste) and the kernel's unrolled intermediates blew
the 16 MB scoped-VMEM stack on the first real-TPU compile (47.96M at
batch 512); lane-major tiles are (b, 16, 128) — fully utilized lanes and
~114 KB per live value.

The batch is delivered explicitly via jax.custom_batching.custom_vmap:
under the production vmap-over-scenarios, the rule fires once with the
whole batch instead of Pallas lifting the batch into a serialized grid.

Symmetry trick: the Schur complements stay symmetric through the
recurrence, so column j equals row j — both the (b, 1, cb) column and
the (1, b, cb) row views are plain slices, and the kernel needs no
in-kernel transposes (Mosaic transposes are expensive;
dynamic_update_slice is unsupported, hence one-hot accumulation, cf.
pallas_fac.py).

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
    """Lane-batched matmul C[i,j,c] = sum_k A[i,k,c] B[k,j,c] via an
    unrolled k-loop of rank-1 FMAs — a lane-batched contraction is not an
    MXU op; for b <= 32 the VPU FMA chain is cheap."""
    out = A[:, :1, :] * B[:1, :, :]
    for k in range(1, b):
        out = out + A[:, k:k + 1, :] * B[k:k + 1, :, :]
    return out


def _base_kernel(S_ref, out_ref, *, b):
    """Linv of (b, b, cb) SPD blocks (scenario chunk in lanes): unrolled
    right-looking Cholesky + nilpotent-doubling triangular inverse, all
    straight-line vector code."""
    A = S_ref[...]
    dt = A.dtype
    rows = lax.broadcasted_iota(jnp.int32, (b, 1, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, b, 1), 1)
    rows3 = lax.broadcasted_iota(jnp.int32, (b, b, 1), 0)
    cols3 = lax.broadcasted_iota(jnp.int32, (b, b, 1), 1)

    L = jnp.zeros_like(A)
    dinv_r = jnp.zeros_like(A[:1, :, :])  # (1, b, cb): dinv by column
    dinv_c = jnp.zeros_like(A[:, :1, :])  # (b, 1, cb): dinv by row
    for j in range(b):
        d = lax.rsqrt(A[j:j + 1, j:j + 1, :])  # (1, 1, cb)
        col = jnp.where(rows >= j, A[:, j:j + 1, :] * d, jnp.zeros((), dt))
        # symmetry: row j of A is column j transposed — no transpose op
        row = jnp.where(cols >= j, A[j:j + 1, :, :] * d, jnp.zeros((), dt))
        oh_r = (cols == j).astype(dt)  # (1, b, 1)
        oh_c = (rows == j).astype(dt)  # (b, 1, 1)
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

    One Pallas call in lane-major layout; grid over ceil(B / cb) chunks
    of cb scenarios each.
    """
    B, b, _ = S.shape
    npad = (-B) % cb
    if npad:
        # identity-pad so the padded instances stay SPD
        eye = jnp.broadcast_to(jnp.eye(b, dtype=S.dtype), (npad, b, b))
        S = jnp.concatenate([S, eye], axis=0)
    n = S.shape[0] // cb
    St = jnp.transpose(S, (1, 2, 0))  # (b, b, B): scenarios in lanes
    out = pl.pallas_call(
        functools.partial(_base_kernel, b=b),
        out_shape=jax.ShapeDtypeStruct(St.shape, St.dtype),
        grid=(n,),
        in_specs=[pl.BlockSpec((b, b, cb), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((b, b, cb), lambda i: (0, 0, i)),
        interpret=interpret,
    )(St)
    out = jnp.transpose(out, (2, 0, 1))
    return out[:B] if npad else out
