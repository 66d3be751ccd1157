"""Stagewise QP solver: OSQP-semantics ADMM over a block-tridiagonal KKT.

TPU-native replacement for the reference's OSQP inner QP (ocp.py:265-319,
375-422) and, structurally, for Fatrop's Riccati KKT solve.  The constraint
Jacobian of the transcription couples only adjacent stages, so

    M = P + sigma*I + rho * A^T A

is block-tridiagonal in the stage blocks s_i = [dx_i, u_i] (with per-row
rho, boosted 1e3x on equality rows as OSQP does).  We factor M once per SQP
iteration with a blocked Cholesky (lax.scan over the horizon), explicitly
invert the triangular blocks with GEMM-based nilpotent doubling, and run
fixed-count ADMM iterations whose sweeps are then pure batched GEMMs on the
MXU — no sequential triangular solves anywhere in the hot loop.

OSQP parameters mirror the reference settings (ocp.py:267-273):
alpha = 1.4 relaxation, rho = 2e-2 fixed, warm started.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ADMMConfig(NamedTuple):
    iters: int = 100  # reference max_iter (ocp.py:268)
    rho: float = 2e-2  # ocp.py:270
    sigma: float = 1e-6  # OSQP default
    alpha: float = 1.4  # ocp.py:269
    # Ruiz equilibration sweeps. Default 0: with a warm-started MPC the
    # problem is already well-posed and per-tick rescaling perturbs the
    # carried ADMM duals — violations are 3-10x SMALLER without scaling.
    # Enable (e.g. 3) for cold starts or badly scaled user problems.
    scaling_iters: int = 0
    eq_boost: float = 1e3  # rho multiplier on equality rows (OSQP default)
    # Matmul precision for the QP linear algebra. "highest" = true f32
    # (6-pass bf16 on TPU); "BF16_BF16_F32_X3" halves the pass count at
    # ~1e-6 relative error, usually indistinguishable at ADMM tolerances.
    precision: str = "highest"
    # "auto" (default) resolves at trace time: cholinv_pb on TPU (the
    # hardware-adjudicated batch winner, SHIPPING.json), sequential
    # elsewhere (cholinv_pb's Pallas base kernel would run interpreted).
    # "sequential" blocked Cholesky (depth N+1), "cholinv" the same scan
    # with the fully unrolled inverse-Cholesky (no XLA While loops —
    # hardware-adjudicated batch-512 default, SHIPPING.json: 2594 vs 1820
    # solves/s/chip round 3), "cholinv_pb" cholinv with the lane-batched
    # Pallas base kernel (solver/pallas_base.py), "cyclic" block cyclic
    # reduction (depth log2(N+1), parallel-Riccati style — measured
    # slower at N=14 and N=30), or "pallas" (the whole recurrence as ONE
    # TPU kernel per scenario, VMEM-resident — solver/pallas_fac.py;
    # best at batch 1, serializes the batch on the TensorCore otherwise;
    # falls back to the interpreter off TPU).
    factorizer: str = "auto"
    # Base-case width of the recursive chol_inv (cholinv/cholinv_pb
    # factorizers): the recursion bottoms out into the lane-batched Pallas
    # kernel (or the XLA unrolled chain) at blocks <= chol_base. A larger
    # base means fewer, bigger kernel launches per node — the factorize
    # scan is launch-latency-bound, not compute-bound.
    chol_base: int = 16
    # Matmul precision for ASSEMBLY only (the A^T rho A einsum building
    # M). Unlike rounding the factor (factor_dtype — diverges) or the
    # matvec operator, a slightly-perturbed M is still factorized
    # EXACTLY and consistently — the x-update solves a ~1e-6-perturbed
    # SPD system, indistinguishable from f32 roundoff. "high"
    # (BF16_BF16_F32_X3) halves the einsum's pass count.
    assemble_precision: str = "highest"
    # Storage dtype for the A/D blocks in the per-iteration matvecs
    # ("bfloat16" halves their HBM traffic; accumulation stays f32).
    # The Jacobian blocks are rounded to bf16 BEFORE assembling M so the
    # factorized operator matches the matvec operator exactly — the
    # round-1 bf16 failure (violation 445) was the f32-factor/bf16-matvec
    # mismatch destabilizing the splitting iteration. Consistent rounding
    # fixes the instability but still costs quality on the flagship
    # rollout (viol mean 0.21 -> 0.33 and drifting, tools/dtype_probe.py
    # round 5) for only the A-stream's ~25% of sweep traffic: measured
    # NOT worth it; keep float32.
    matvec_dtype: str = "float32"
    # Storage dtype for the factor blocks (Linv/W/V) read by every
    # solve_factorized sweep. "bfloat16" DIVERGES (viol ~1e8,
    # tools/dtype_probe.py): rounding the factor after the fact makes the
    # x-update an inexact solve of M with a ~0.4% systematic error that
    # compounds through the 2(N+1)-step back-substitution and feeds back
    # through the splitting iteration. Kept only as the recorded negative
    # result; float32 is the only sound setting.
    factor_dtype: str = "float32"
    # Equality-polish phase (OSQP's `polish` analog, accurate mode): after
    # the main iterations, refactorize with equality rho boosted by
    # polish_boost and run polish_iters more sweeps — drives the equality
    # residuals (the dominant violations) toward the Fatrop tolerance.
    polish_iters: int = 0
    polish_boost: float = 100.0


class BlockTridiagFactor(NamedTuple):
    """Cholesky factor of the block-tridiagonal M, stored in a
    solve-optimized form.

    Linv_i is the explicit inverse of the stage Cholesky block (so ADMM
    back-substitutions are batched GEMMs on the MXU instead of sequential
    triangular solves), and the scan couplings are pre-multiplied:

        W_i = Linv_i @ F_{i-1}^T   (W_0 = 0),   F_i = Linv_i @ U_i
        V_i = Linv_i^T @ F_i       (V_N = 0)

    so each forward/backward scan step of solve_factorized is ONE matvec
    (y_i = (Linv b)_i - W_i y_{i-1}; x_i = (Linv^T y)_i - V_i x_{i+1})
    with the Linv applications hoisted OUT of the scans as node-parallel
    batched GEMMs — the sequential critical path is half as long as the
    textbook two-matvec form."""

    Linv: jnp.ndarray  # (N+1, s, s)
    W: jnp.ndarray  # (N+1, s, s), W_0 = 0
    V: jnp.ndarray  # (N+1, s, k), V_N = 0; k < s when U had only k
    #                 nonzero columns (the c_eye_rows propagation pattern:
    #                 V's remaining columns are structurally zero, so the
    #                 backward scan reads x_{i+1}[:k] only)


def _tri_solve(L, b, lower=True, trans=False):
    return jax.scipy.linalg.solve_triangular(
        L, b, lower=lower, trans=1 if trans else 0
    )


def assemble_blocks(G, B, C, P_diag, rho_vec, sigma, box_idx=None,
                    c_eye_rows=None):
    """Build the tridiagonal blocks of M = P + sigma I + A^T diag(rho) A.

    G, B, C: (N, m, ndx), (N, m, nu), (N, m, ndx) stage Jacobians; node i's
    rows touch s_i via [G_i B_i] and s_{i+1} via [C_i 0].
    P_diag: (N+1, s) diagonal Hessian (includes the factor 2).
    rho_vec: (N, m) per-row penalty (OSQP uses 1e3 x rho on equality rows).
    Returns H (N+1, s, s) diagonal blocks and U (N, s, s) couplings.

    c_eye_rows: static count k when C is the constant propagation pattern
    (row m = e_m for m < k, zero below — every default formulation's
    dx_next block). The D-side products then have closed forms —
    D^T diag(rho) D = diag(rho[:k] padded) and A^T diag(rho) D =
    (rho A)[:, :k, :]^T padded — killing two of the three big einsums,
    and D is returned as the int k (the ADMM matvecs read/write a slice
    instead of streaming a (N, m, s) block of zeros-and-ones from HBM
    every sweep).
    """
    N, m, ndx = G.shape
    nu = B.shape[2]
    s = ndx + nu

    A = jnp.concatenate([G, B], axis=2)  # (N, m, s)

    md = m
    rho_dense = rho_vec[:, :md]
    rA = rho_dense[:, :, None] * A
    AtA = jnp.einsum("nms,nmt->nst", rA, A)

    if c_eye_rows is not None:
        # One (N+1, s, s) materialization + ONE diagonal scatter: all the
        # diagonal contributions (P + sigma, the D^T rho D identity rows,
        # the box-selector rho) are accumulated in an (N+1, s) vector
        # first — the naive three .at[] adds each round-trip the full H
        # through HBM (~2 GB at the flagship batch).
        k = c_eye_rows
        diag = P_diag + sigma
        diag = diag.at[1:, :k].add(rho_dense[:, :k])
        if box_idx is not None:
            diag = diag.at[:N, box_idx].add(rho_vec[:, md:])
        H = jnp.concatenate(
            [AtA, jnp.zeros((1, s, s), dtype=G.dtype)], axis=0)
        idx = jnp.arange(s)
        H = H.at[:, idx, idx].add(diag)
        # U has only k live columns (the propagation pattern): return it
        # skinny — factorize consumes exactly these columns, and the full
        # (N, s, s) block was pure zero-padding traffic.
        U = jnp.swapaxes(rA[:, :k, :], 1, 2)  # (N, s, k)
        return H, U, A, k

    H = jnp.zeros((N + 1, s, s), dtype=G.dtype)
    H = H.at[:N].add(AtA)
    H = H + jax.vmap(jnp.diag)(P_diag + sigma)
    if box_idx is not None:
        # selector rows contribute rho on the diagonal of their slots
        H = H.at[:N, box_idx, box_idx].add(rho_vec[:, md:])

    D = jnp.concatenate([C, jnp.zeros((N, m, nu), dtype=C.dtype)], axis=2)
    DtD = jnp.einsum("nms,nmt->nst", rho_dense[:, :, None] * D, D)
    AtD = jnp.einsum("nms,nmt->nst", rA, D)
    H = H.at[1:].add(DtD)
    U = AtD
    return H, U, A, D


def tri_inverse_lower(L, nb=3, depth=1):
    """Inverse of a lower-triangular matrix via block-nilpotent doubling —
    all GEMMs (MXU) instead of an O(s)-sequential triangular solve.

    L = D + N with D the (nb-)block diagonal; A = -D^{-1} N is nilpotent
    with A^nb = 0, so L^{-1} = (sum_{j<nb} A^j) D^{-1} computed by doubling.
    The diagonal blocks recurse (depth levels) before falling back to a
    small batched triangular solve, keeping the sequential sweep short.
    """
    s = L.shape[-1]
    b = -(-s // nb)  # ceil
    pad = nb * b - s
    if pad:
        # pad with identity diagonal to keep triangular + invertible
        L = jnp.pad(L, ((0, pad), (0, pad))) + jnp.diag(
            jnp.concatenate([jnp.zeros(s, L.dtype), jnp.ones(pad, L.dtype)])
        )
    sp = nb * b
    blocks = jnp.stack([L[i * b:(i + 1) * b, i * b:(i + 1) * b] for i in range(nb)])
    if depth > 1 and b > 8:
        dinv_blocks = jax.vmap(
            lambda Li: tri_inverse_lower(Li, nb=nb, depth=depth - 1)
        )(blocks)
    else:
        eye_b = jnp.eye(b, dtype=L.dtype)
        dinv_blocks = jax.vmap(lambda Li: _tri_solve(Li, eye_b))(blocks)
    Dinv = jax.scipy.linalg.block_diag(*[dinv_blocks[i] for i in range(nb)])
    N = L - jax.scipy.linalg.block_diag(*[blocks[i] for i in range(nb)])
    A = -Dinv @ N
    # sum_{j<nb} A^j by doubling (nb <= 4 covered by two steps)
    P = jnp.eye(sp, dtype=L.dtype) + A
    if nb > 2:
        A2 = A @ A
        P = P + A2 @ P  # I + A + A^2 + A^3 (extra nilpotent powers vanish)
    Linv = P @ Dinv
    return Linv[:s, :s] if pad else Linv


def _chol_base_unrolled(S):
    """Cholesky of a small (..., s, s) SPD block with NO control flow.

    XLA lowers jnp.linalg.cholesky to a While loop over columns; on TPU
    each loop iteration is a serialized kernel dispatch, so a batched
    35x35 cholesky costs ~35 sequential steps of mostly launch latency.
    For small s the right-looking outer-product recurrence unrolls into a
    chain of fused elementwise ops instead. Returns (L, dinv) with
    dinv = 1/diag(L) (the inverse assembly wants it anyway)."""
    s = S.shape[-1]
    bdims = S.ndim - 2
    A = S
    cols, dinvs = [], []
    for j in range(s):
        di = lax.rsqrt(A[..., 0, 0])  # (...,)
        col = A[..., :, 0] * di[..., None]  # (..., s - j)
        if j:
            col_p = jnp.pad(col, [(0, 0)] * bdims + [(j, 0)])
        else:
            col_p = col
        cols.append(col_p)
        dinvs.append(di)
        if j < s - 1:
            t = col[..., 1:]
            A = A[..., 1:, 1:] - t[..., :, None] * t[..., None, :]
    L = jnp.stack(cols, axis=-1)
    dinv = jnp.stack(dinvs, axis=-1)
    return L, dinv


def _tri_inv_doubling(L, dinv):
    """Inverse of small lower-triangular L via scalar-diagonal nilpotent
    doubling: A = -D^-1 N is strictly lower with A^s = 0, so
    L^-1 = (sum A^k) D^-1 in ceil(log2(s)) GEMM doublings — no loops."""
    s = L.shape[-1]
    N = L * (1.0 - jnp.eye(s, dtype=L.dtype)) * dinv[..., :, None]
    A = -N
    P = jnp.eye(s, dtype=L.dtype) + A
    k = 1
    while k < s - 1:
        A = A @ A
        P = P + A @ P
        k *= 2
    return P * dinv[..., None, :]


from jax.custom_batching import custom_vmap

# Platform the solver is being traced FOR (see _platform.py): 'auto'
# factorizer dispatch and the Pallas interpret flag must follow the export
# TARGET, not this host's backend (ADVICE r3). Re-exported here because
# aot.py and tests import them from this module.
from .._platform import target_platform, override_target_platform  # noqa: F401


@custom_vmap
def _chol_inv_base_cv(S):
    """Linv of one small (b, b) SPD base block.

    Unbatched: the XLA unrolled path. Batched (the production
    vmap-over-scenarios): one lane-batched Pallas call for the whole
    batch (solver/pallas_base.py) — the unrolled chain as straight-line
    in-kernel vector code instead of thousands of tiny dispatched XLA ops
    (the round-1 'unrolled chol_inv 10x slower' failure mode)."""
    L, dinv = _chol_base_unrolled(S)
    return _tri_inv_doubling(L, dinv)


@_chol_inv_base_cv.def_vmap
def _chol_inv_base_cv_vmap(axis_size, in_batched, S):
    from .pallas_base import chol_inv_base_batched

    if not in_batched[0]:
        # S is closed over (unbatched under this vmap): keep the plain XLA
        # path and report the output unbatched — feeding rank-2 data to the
        # lane-batched kernel would fail with a confusing unpack error
        # (ADVICE r3).
        L, dinv = _chol_base_unrolled(S)
        return _tri_inv_doubling(L, dinv), False
    interpret = target_platform() != "tpu"
    # S may carry extra leading dims besides the vmapped axis (e.g. the
    # BABE factorizer's 2-chain axis): flatten them all into the kernel's
    # batch and restore after.
    lead = S.shape[:-2]
    out = chol_inv_base_batched(
        S.reshape((-1,) + S.shape[-2:]), interpret=interpret)
    return out.reshape(lead + S.shape[-2:]), True


def chol_inv(S, base=16, base_impl="xla"):
    """(L, Linv) of an SPD block with NO data-dependent control flow.

    Recursive 2x2 block Cholesky: the diagonal chain is inherently
    sequential, but every step is either a GEMM (MXU) or a fused
    elementwise chain — no While loops, so the 15-node factorization scan
    stops being launch-latency-bound (measured: the in-context
    assemble+factorize was 127 ms of a 246 ms MPC tick with XLA's loop
    cholesky/trsm; see RESULTS.md round 2).

    base_impl='pallas' computes the base blocks with the lane-batched
    Pallas micro-kernel (L is not materialized for the bases then — only
    Linv, which is all the factorization consumes)."""
    s = S.shape[-1]
    if s <= base:
        if base_impl == "pallas":
            Linv = _chol_inv_base_cv(S)
            return None, Linv
        L, dinv = _chol_base_unrolled(S)
        return L, _tri_inv_doubling(L, dinv)
    k = (s + 1) // 2
    L1, L1i = chol_inv(S[..., :k, :k], base, base_impl)
    L21 = jnp.einsum("...ij,...kj->...ik", S[..., k:, :k], L1i)
    S2 = S[..., k:, k:] - jnp.einsum("...ij,...kj->...ik", L21, L21)
    L2, L2i = chol_inv(S2, base, base_impl)
    B21 = -jnp.einsum("...ij,...jk,...kl->...il", L2i, L21, L1i)
    bshape = S.shape[:-2]
    zer = jnp.zeros(bshape + (k, s - k), dtype=S.dtype)
    # the Pallas base path materializes only Linv (all the factorization
    # consumes); L is assembled only when the bases produced it
    L = None
    if L1 is not None and L2 is not None:
        L = jnp.concatenate([
            jnp.concatenate([L1, zer], axis=-1),
            jnp.concatenate([L21, L2], axis=-1),
        ], axis=-2)
    Linv = jnp.concatenate([
        jnp.concatenate([L1i, zer], axis=-1),
        jnp.concatenate([B21, L2i], axis=-1),
    ], axis=-2)
    return L, Linv


def chol_blocked(S, panels=3):
    """Right-looking blocked Cholesky — bandwidth-shaped for TPU.

    XLA's native cholesky is UNBLOCKED: every column step re-reads the
    whole trailing matrix, so a (512, 105, 105) batch moves ~105 x 22.6 MB
    = 2.4 GB of HBM traffic (measured 7.7 ms — pure bandwidth). Panel
    factorization moves the trailing matrix only once per PANEL and does
    the updates as MXU GEMMs: `panels` small cholesky calls plus
    O(panels) GEMM sweeps (~35x less traffic at panels=3, s=105).
    """
    s = S.shape[-1]
    if s <= 48:  # small blocks: XLA's loop is fine
        return jnp.linalg.cholesky(S)
    b = -(-s // panels)  # ceil
    starts = list(range(0, s, b))
    cols = []  # per-panel full-height column blocks of L
    T = S  # trailing matrix, shrinks by b rows/cols per panel
    for j, st in enumerate(starts):
        bj = min(b, s - st)
        L11 = jnp.linalg.cholesky(T[..., :bj, :bj])
        L21 = jnp.einsum(
            "...ij,...kj->...ik",
            T[..., bj:, :bj],
            tri_inverse_lower(L11) if bj > 16 else
            _tri_solve(L11, jnp.eye(bj, dtype=S.dtype)),
        )
        col = jnp.concatenate([L11, L21], axis=-2)  # (s - st, bj)
        if st:
            col = jnp.pad(col, [(0, 0)] * (S.ndim - 2) + [(st, 0), (0, 0)])
        cols.append(col)
        T = T[..., bj:, bj:] - jnp.einsum("...ij,...kj->...ik", L21, L21)
    return jnp.concatenate(cols, axis=-1)


def factorize(H, U, chol_impl="blocked", base=16, u_cols=None):
    """Blocked Cholesky of the tridiagonal M via lax.scan.

    M = L L^T with L block lower-bidiagonal: L_{ii} = L_i,
    L_{i+1,i} = F_i^T where F_i = L_i^{-1} U_i.

    chol_impl picks the per-node (s, s) inverse-Cholesky:
      - "blocked": chol_blocked panels (XLA While-loop cholesky per panel)
        + GEMM triangular inversion — the round-2 default.
      - "cholinv": fully unrolled recursive chol_inv — no While loops at
        all, so the scan body is pure fused-elementwise + GEMM dispatches
        (the While iterations are launch-latency-bound on TPU; see
        RESULTS.md tick anatomy).
      - "cholinv_pb": chol_inv with the lane-batched Pallas base kernel
        (solver/pallas_base.py) — the base blocks for the whole scenario
        batch in one kernel call per recursion leaf.

    u_cols: static count k when only U[:, :, :k] is nonzero (the
    c_eye_rows propagation pattern, assemble_blocks): F/W/V and the Schur
    update then run as skinny GEMMs (105^3-shaped products drop to
    105^2 x 48 / 48^2 x 105 — roughly half the factorize flops at the
    flagship shape) and V is stored as its k live columns.
    """
    s = H.shape[1]
    base_impl = "pallas" if chol_impl == "cholinv_pb" else "xla"
    # U may arrive already skinny (assemble_blocks' c_eye_rows path).
    k = U.shape[2] if u_cols is None else u_cols
    U = U if U.shape[2] == k else U[:, :, :k]

    def step(carry, inp):
        prev_F = carry  # F_{i-1} (or zeros for i=0), (s, k)
        H_i, U_i = inp
        S = H_i.at[:k, :k].add(-(prev_F.T @ prev_F))
        # f32 jitter: keeps the Schur complements SPD under roundoff
        S = S + 1e-6 * jnp.eye(s, dtype=H.dtype)
        if chol_impl.startswith("cholinv"):
            _, Linv_i = chol_inv(S, base, base_impl)
        else:
            L_i = chol_blocked(S)
            Linv_i = tri_inverse_lower(L_i)
        F_i = Linv_i @ U_i
        return F_i, (Linv_i, F_i)

    U_pad = jnp.concatenate([U, jnp.zeros((1, s, k), dtype=H.dtype)], axis=0)
    _, (Linv, F) = lax.scan(
        step, jnp.zeros((s, k), dtype=H.dtype), (H, U_pad)
    )
    # Pre-multiplied scan couplings (see BlockTridiagFactor): node-parallel
    # GEMMs here buy one-matvec scan steps in every subsequent solve.
    # W_i = Linv_i F_{i-1}^T has only k live columns in the product's inner
    # dim (F's dead columns are zero), so it contracts over k.
    F_prev = jnp.concatenate(
        [jnp.zeros((1, s, k), dtype=H.dtype), F[:-1]], axis=0
    )
    W = jnp.einsum("nik,njk->nij", Linv[:, :, :k], F_prev)
    # F's last entry is Linv_N @ 0 = 0, so V_N = 0 falls out for free.
    V = jnp.einsum("nji,njk->nik", Linv, F)
    return BlockTridiagFactor(Linv=Linv, W=W, V=V)


# ---------------------------------------------------------------------------
# Parallel factorization: block cyclic reduction (the parallel-Riccati /
# parallel-KKT idea of PAPERS.md applied to the SPD tridiagonal M).
# Sequential depth drops from N+1 to log2(N+1); every level's block ops are
# batched GEMMs over the remaining blocks (and, under vmap, scenarios).
# ---------------------------------------------------------------------------

class CyclicFactor(NamedTuple):
    """Per-level data for block-cyclic-reduction solves.

    levels: tuple of (Ho_inv, U_even, U_odd) — the inverses of the odd
    diagonal blocks and the couplings needed for rhs reduction and
    back-substitution; top_inv: inverse of the final single block.
    """

    levels: tuple
    top_inv: jnp.ndarray
    n_blocks: int  # original (unpadded) block count


def _spd_inverse(H):
    """Batched SPD inverse via blocked Cholesky + GEMM triangular
    inversion (chol_blocked keeps the sequential column sweep short; the
    batch over remaining odd blocks rides the leading dims)."""
    S = H + 1e-6 * jnp.eye(H.shape[-1], dtype=H.dtype)
    if H.ndim == 3:
        L = jax.vmap(chol_blocked)(S)
        Linv = jax.vmap(tri_inverse_lower)(L)
    else:
        L = chol_blocked(S)
        Linv = tri_inverse_lower(L)
    return jnp.einsum("...ji,...jk->...ik", Linv, Linv)


def factorize_cyclic(H, U):
    """Block cyclic reduction of the SPD block-tridiagonal (H, U).

    H: (K, s, s) diagonal blocks; U: (K-1, s, s) couplings (block i to i+1).
    Pads K to a power of two with identity blocks.
    """
    K, s, _ = H.shape
    Kp = 1
    while Kp < K:
        Kp *= 2
    if Kp != K:
        pad = Kp - K
        eye = jnp.broadcast_to(jnp.eye(s, dtype=H.dtype), (pad, s, s))
        H = jnp.concatenate([H, eye], axis=0)
        U = jnp.concatenate(
            [U, jnp.zeros((pad, s, s), dtype=H.dtype)], axis=0
        )  # U length Kp-1 after this (K-1 + pad)
    levels = []
    while H.shape[0] > 1:
        L2 = H.shape[0] // 2
        He, Ho = H[::2], H[1::2]
        U_even = U[::2]  # (L2, s, s): couples even 2t -> odd 2t+1
        U_odd = U[1::2]  # (L2-1, s, s): couples odd 2t+1 -> even 2t+2
        Ho_inv = _spd_inverse(Ho)
        levels.append((Ho_inv, U_even, U_odd))

        # Schur updates on the even blocks.
        right = jnp.einsum("tij,tjk,tlk->til", U_even, Ho_inv, U_even)
        H_new = He - right
        left = jnp.einsum("tji,tjk,tkl->til", U_odd, Ho_inv[:-1], U_odd)
        H_new = H_new.at[1:].add(-left)
        U_new = -jnp.einsum(
            "tij,tjk,tkl->til", U_even[:-1], Ho_inv[:-1], U_odd
        )
        H, U = H_new, U_new
    top_inv = _spd_inverse(H[0])
    return CyclicFactor(levels=tuple(levels), top_inv=top_inv, n_blocks=K)


def solve_cyclic(fac: CyclicFactor, b):
    """Solve M x = b with the cyclic-reduction factor; b is (K, s)."""
    K, s = b.shape
    Kp = 1
    while Kp < K:
        Kp *= 2
    if Kp != K:
        b = jnp.concatenate([b, jnp.zeros((Kp - K, s), dtype=b.dtype)], axis=0)

    # Forward: reduce rhs level by level, remembering the odd rhs.
    saved = []
    for Ho_inv, U_even, U_odd in fac.levels:
        be, bo = b[::2], b[1::2]
        hbo = jnp.einsum("tij,tj->ti", Ho_inv, bo)
        be_new = be - jnp.einsum("tij,tj->ti", U_even, hbo)
        be_new = be_new.at[1:].add(
            -jnp.einsum("tji,tj->ti", U_odd, hbo[:-1])
        )
        saved.append(bo)
        b = be_new

    x = (fac.top_inv @ b[0])[None]

    # Backward: recover odd blocks at each level.
    for (Ho_inv, U_even, U_odd), bo in zip(
        reversed(fac.levels), reversed(saved)
    ):
        rhs = bo - jnp.einsum("tji,tj->ti", U_even, x)
        rhs = rhs.at[:-1].add(-jnp.einsum("tij,tj->ti", U_odd, x[1:]))
        xo = jnp.einsum("tij,tj->ti", Ho_inv, rhs)
        L2 = x.shape[0]
        merged = jnp.zeros((2 * L2, s), dtype=x.dtype)
        merged = merged.at[::2].set(x)
        merged = merged.at[1::2].set(xo)
        x = merged

    return x[:K]


def solve_factorized(fac: BlockTridiagFactor, b):
    """Solve M x = b given the blocked factor; b is (N+1, s).

    The Linv applications are node-parallel batched GEMMs hoisted out of
    the scans; each sequential scan step is a single matvec against the
    pre-multiplied W/V couplings — half the critical-path work of the
    textbook back-substitution (and no triangular solves anywhere).

    When the factor blocks are stored bf16 (ADMMConfig.factor_dtype), the
    scan matvecs run as native bf16 x bf16 MXU products with f32
    accumulation — the solve becomes the exact solve of a bf16-rounded M,
    i.e. an inexact-ADMM x-update (accepted where the violation budget
    tolerates it; the factorization itself always runs f32)."""
    s = b.shape[1]
    bf16 = fac.Linv.dtype == jnp.bfloat16
    f32 = b.dtype

    def mv(M_i, v):
        if bf16:
            return jnp.matmul(M_i, v.astype(jnp.bfloat16),
                              preferred_element_type=f32)
        return M_i @ v

    # The scan bodies are single small matvecs; fully unrolling them trades
    # a little compile time for zero While-loop overhead on the sweep's
    # critical path (the horizon is short and static: N+1 <= ~31).
    unroll = fac.W.shape[0] <= 32

    Pb = _bmv(fac.Linv, b, "nij,nj->ni")

    def fwd(y_prev, inp):
        W_i, pb_i = inp
        y_i = pb_i - mv(W_i, y_prev)
        return y_i, y_i

    _, Y = lax.scan(fwd, jnp.zeros(s, dtype=f32), (fac.W, Pb),
                    unroll=unroll)

    if bf16:
        T = jnp.einsum("nji,nj->ni", fac.Linv, Y.astype(jnp.bfloat16),
                       preferred_element_type=f32)
    else:
        T = jnp.einsum("nji,nj->ni", fac.Linv, Y)

    kv = fac.V.shape[-1]  # < s when U had only kv nonzero columns

    def bwd(x_next, inp):
        V_i, t_i = inp
        x_i = t_i - mv(V_i, x_next[:kv])
        return x_i, x_i

    _, X = lax.scan(bwd, jnp.zeros(s, dtype=f32), (fac.V, T), reverse=True,
                    unroll=unroll)
    return X


def _bmv(blocks, vec, spec):
    """Batched block matvec; when blocks are stored bf16, feed the MXU a
    native bf16 x bf16 product with f32 accumulation (the vector cast is
    free next to the block stream; a mixed-dtype einsum would upcast the
    blocks to f32 in HBM instead, forfeiting the bandwidth win)."""
    if blocks.dtype == jnp.bfloat16:
        return jnp.einsum(spec, blocks, vec.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum(spec, blocks, vec)


class BabeFactor(NamedTuple):
    """Two-chain "burn-at-both-ends" Cholesky of the block-tridiagonal M.

    The horizon is eliminated from BOTH ends simultaneously toward a
    middle separator node p = S//2 (one-level nested dissection, aka the
    twisted/BABE factorization): the left chain (nodes 0..p-1) and the
    MIRRORED right chain (nodes S-1..p+1, couplings U^T) run as ONE
    lax.scan with a 2-wide chain axis, so the sequential depth of the
    factorization scan and of every ADMM back-substitution HALVES. The
    scans are launch-latency-bound, not flop-bound (RESULTS.md round-5
    anatomy: factorize ~10x its bandwidth floor), which is why cyclic
    reduction lost (log-depth but 2.4x flops) while this costs only ~15%
    extra flops (the mirrored chain's couplings are dense, so both chains
    give up the u_cols skinny structure inside the scan).

    Chain step t holds node t (left) / node S-1-t (right); a shorter
    chain is front-padded with identity nodes (Linv=I, coupling 0 —
    eliminated first, contributing nothing).

    Reference context: the role of Fatrop's Riccati recursion over the
    horizon (SURVEY.md §2.3 "horizon parallelism"; ref optimization/
    ocp.py:248-263 hot loop), parallelized across the stage dimension.
    """

    Linv: jnp.ndarray      # (d, 2, s, s) per-step inverse Cholesky blocks
    W: jnp.ndarray         # (d, 2, s, s)  Linv_t @ P_{t-1}^T (fwd coupling)
    V: jnp.ndarray         # (d, 2, s, s)  Linv_t^T @ P_t (bwd coupling)
    Pfin: jnp.ndarray      # (2, s, s) whitened couplings into the separator
    Linv_sep: jnp.ndarray  # (s, s) separator inverse Cholesky


def factorize_babe(H, U, chol_impl="cholinv", base=16):
    """BABE factorization of the SPD block tridiagonal (see BabeFactor).

    H: (S, s, s) diagonal blocks; U: (S-1, s, k) couplings (k live
    columns accepted — padded dense internally, the mirrored chain needs
    U^T anyway).
    """
    S_, s = H.shape[0], H.shape[1]
    k = U.shape[2]
    base_impl = "pallas" if chol_impl == "cholinv_pb" else "xla"
    p = S_ // 2
    nl, nr = p, S_ - 1 - p
    d = max(nl, nr)
    dt = H.dtype
    if k < s:
        U = jnp.concatenate(
            [U, jnp.zeros((S_ - 1, s, s - k), dtype=dt)], axis=2)
    eye = jnp.eye(s, dtype=dt)

    HL, CL = H[:p], U[:p]                       # left: node t, coupling U_t
    HR = H[p + 1:][::-1]                        # right: node S-1-t
    CR = jnp.swapaxes(U[p:], 1, 2)[::-1]        # coupling U_{S-2-t}^T
    if nl < d:
        HL = jnp.concatenate(
            [jnp.broadcast_to(eye, (d - nl, s, s)), HL], axis=0)
        CL = jnp.concatenate(
            [jnp.zeros((d - nl, s, s), dtype=dt), CL], axis=0)
    if nr < d:
        HR = jnp.concatenate(
            [jnp.broadcast_to(eye, (d - nr, s, s)), HR], axis=0)
        CR = jnp.concatenate(
            [jnp.zeros((d - nr, s, s), dtype=dt), CR], axis=0)
    Hs = jnp.stack([HL, HR], axis=1)            # (d, 2, s, s)
    Cs = jnp.stack([CL, CR], axis=1)

    def step(P_prev, inp):
        H_t, C_t = inp
        Ssch = H_t - jnp.einsum("cji,cjl->cil", P_prev, P_prev)
        Ssch = Ssch + 1e-6 * eye
        _, Linv_t = chol_inv(Ssch, base, base_impl)
        P_t = jnp.einsum("cij,cjk->cik", Linv_t, C_t)
        return P_t, (Linv_t, P_t)

    Pfin, (Linv, Pout) = lax.scan(
        step, jnp.zeros((2, s, s), dtype=dt), (Hs, Cs))

    Ssep = (H[p] - Pfin[0].T @ Pfin[0] - Pfin[1].T @ Pfin[1]
            + 1e-6 * eye)
    _, Linv_sep = chol_inv(Ssep, base, base_impl)

    # Premultiplied scan couplings (same trick as BlockTridiagFactor):
    # node-parallel GEMMs here buy one-matvec scan steps in every solve.
    P_prev_seq = jnp.concatenate(
        [jnp.zeros((1, 2, s, s), dtype=dt), Pout[:-1]], axis=0)
    W = jnp.einsum("dcik,dcjk->dcij", Linv, P_prev_seq)
    V = jnp.einsum("dcji,dcjk->dcik", Linv, Pout)
    return BabeFactor(Linv=Linv, W=W, V=V, Pfin=Pfin, Linv_sep=Linv_sep)


def solve_babe(fac: BabeFactor, b):
    """Solve M x = b given the BABE factor; b is (S, s).

    Critical path: one depth-d 2-chain fwd scan, the separator solve, one
    depth-d 2-chain bwd scan — ~half of solve_factorized's 2(S-1) steps.
    """
    S_, s = b.shape
    d = fac.Linv.shape[0]
    p = S_ // 2
    nl, nr = p, S_ - 1 - p
    dt = b.dtype

    bl = b[:p]
    br = b[p + 1:][::-1]
    if nl < d:
        bl = jnp.concatenate([jnp.zeros((d - nl, s), dtype=dt), bl], axis=0)
    if nr < d:
        br = jnp.concatenate([jnp.zeros((d - nr, s), dtype=dt), br], axis=0)
    bs = jnp.stack([bl, br], axis=1)            # (d, 2, s)

    unroll = d <= 32
    Pb = jnp.einsum("dcij,dcj->dci", fac.Linv, bs)

    def fwd(y_prev, inp):
        W_t, pb_t = inp
        y_t = pb_t - jnp.einsum("cij,cj->ci", W_t, y_prev)
        return y_t, y_t

    y_fin, Y = lax.scan(fwd, jnp.zeros((2, s), dtype=dt), (fac.W, Pb),
                        unroll=unroll)

    b_sep = b[p] - fac.Pfin[0].T @ y_fin[0] - fac.Pfin[1].T @ y_fin[1]
    x_sep = fac.Linv_sep.T @ (fac.Linv_sep @ b_sep)

    T = jnp.einsum("dcji,dcj->dci", fac.Linv, Y)

    def bwd(x_next, inp):
        V_t, t_t = inp
        x_t = t_t - jnp.einsum("cij,cj->ci", V_t, x_next)
        return x_t, x_t

    _, X = lax.scan(bwd, jnp.stack([x_sep, x_sep]), (fac.V, T),
                    reverse=True, unroll=unroll)
    xl = X[d - nl:, 0]
    xr = X[d - nr:, 1][::-1]
    return jnp.concatenate([xl, x_sep[None], xr], axis=0)


def _A_matvec(A, D, X, box_idx=None):
    """w_i = A_i s_i + D_i s_{i+1}; X is (N+1, s) -> (N, m).

    D may be a static int k (C = constant propagation pattern, see
    assemble_blocks): D_i s_{i+1} is then a padded slice instead of a GEMM
    against a streamed block of zeros-and-ones.

    box_idx: static slot indices of pure-selector (box) rows appended after
    the dense rows — their products are gathers, not GEMMs."""
    out = _bmv(A, X[:-1], "nms,ns->nm")
    if isinstance(D, int):
        out = out.at[:, :D].add(X[1:, :D])
    else:
        out = out + _bmv(D, X[1:], "nms,ns->nm")
    if box_idx is not None:
        out = jnp.concatenate([out, X[:-1][:, box_idx]], axis=1)
    return out


def _At_matvec(A, D, W, box_idx=None):
    """X_i = A_i^T w_i + D_{i-1}^T w_{i-1}; W is (N, m) -> (N+1, s)."""
    N = W.shape[0]
    s = A.shape[2]
    md = A.shape[1]
    out = jnp.zeros((N + 1, s), dtype=W.dtype)
    out = out.at[:-1].add(_bmv(A, W[:, :md], "nms,nm->ns"))
    if isinstance(D, int):
        out = out.at[1:, :D].add(W[:, :D])
    else:
        out = out.at[1:].add(_bmv(D, W[:, :md], "nms,nm->ns"))
    if box_idx is not None:
        out = out.at[:-1, box_idx].add(W[:, md:])
    return out


def ruiz_equilibrate(G, B, C, P_diag, iters):
    """Modified Ruiz equilibration of [P A^T; A 0] (OSQP's scaling), adapted
    to the stage-block structure.

    Returns row scalings E (N, m) and column scalings Dc (N+1, s).  Column j
    of stage block i appears in P (diagonal), in node i's rows through
    [G_i B_i], and (dx part only) in node i-1's rows through C_{i-1}.
    """
    N, m, ndx = G.shape
    nu = B.shape[2]
    s = ndx + nu
    dt = G.dtype
    E = jnp.ones((N, m), dtype=dt)
    Dc = jnp.ones((N + 1, s), dtype=dt)

    def body(_, carry):
        E, Dc = carry
        A = jnp.concatenate([G, B], axis=2) * E[:, :, None] * Dc[:-1, None, :]
        D = C * E[:, :, None] * Dc[1:, None, :ndx]
        # row inf-norms over [A D]
        row_norm = jnp.maximum(
            jnp.max(jnp.abs(A), axis=2), jnp.max(jnp.abs(D), axis=2)
        )
        # Zero (masked) rows keep unit scaling — amplifying them would blow
        # up their stored duals when the contact schedule reactivates them.
        E_new = jnp.where(
            row_norm > 1e-8, E / jnp.sqrt(jnp.maximum(row_norm, 1e-8)), E
        )
        E_new = jnp.clip(E_new, 1e-4, 1e4)  # OSQP MIN/MAX_SCALING
        # column inf-norms: P diag + all touching rows
        colA = jnp.max(jnp.abs(A), axis=1)  # (N, s)
        colD = jnp.max(jnp.abs(D), axis=1)  # (N, ndx)
        col = jnp.zeros((N + 1, s), dtype=dt)
        col = col.at[:-1].max(colA)
        col = col.at[1:, :ndx].max(colD)
        col = jnp.maximum(col, jnp.abs(P_diag) * Dc * Dc)
        Dc_new = jnp.where(
            col > 1e-8, Dc / jnp.sqrt(jnp.maximum(col, 1e-8)), Dc
        )
        Dc_new = jnp.clip(Dc_new, 1e-4, 1e4)
        return E_new, Dc_new

    E, Dc = lax.fori_loop(0, iters, body, (E, Dc))
    return E, Dc


def kkt_polish(G, B, C, P_diag, q, l, u, z, box_idx=None,
               sigma=1e-6, delta=1e-7, act_tol=1e-5):
    """OSQP-style polish: exact equality-KKT solve on the active set.

    OSQP refines its ADMM solution by solving the KKT system restricted to
    the active constraints (osqp 'polish'); the reference inherits that
    behavior through the osqp backend (ocp.py:305-313). Here the diagonal
    Hessian P makes the constraint-space Schur complement

        S = A_act (P + sigma)^-1 A_act^T + delta I

    block-tridiagonal in node space, so one blocked factorization + one
    solve produces a step satisfying the active rows to f32 roundoff —
    no ADMM iteration limit in the way.

    Inactive inequality rows are masked (their lambda rows become the
    trivial equation lambda = 0), keeping shapes static under jit. Box
    selector rows are not polished (they are inactive in steady gait).
    Returns the polished step d (N+1, s).
    """
    N, m, ndx = G.shape
    s = P_diag.shape[1]
    ld, ud = l[:, :m], u[:, :m]
    zd = z[:, :m]

    eq = (ud - ld) < 1e-7
    act_l = (zd - ld) < act_tol
    act_u = (ud - zd) < act_tol
    W = (eq | act_l | act_u).astype(G.dtype)  # (N, m) active mask
    r = jnp.where(eq | act_l, ld, ud)  # target value on active rows

    Pinv = 1.0 / (P_diag + sigma)  # (N+1, s)

    A = jnp.concatenate([G, B], axis=2) * W[:, :, None]  # (N, m, s)
    D = jnp.concatenate(
        [C, jnp.zeros((N, m, s - ndx), dtype=C.dtype)], axis=2
    ) * W[:, :, None]

    APi = A * Pinv[:-1, None, :]
    DPi = D * Pinv[1:, None, :]
    S_diag = (
        jnp.einsum("nms,nks->nmk", APi, A)
        + jnp.einsum("nms,nks->nmk", DPi, D)
    )
    # inactive rows: identity equation lambda = 0
    S_diag = S_diag + jax.vmap(jnp.diag)(delta + (1.0 - W))
    S_off = jnp.einsum("nms,nks->nmk", DPi[:-1], A[1:])  # couples i -> i+1

    # Symmetric Jacobi equilibration keeps the f32 Cholesky honest: S rows
    # span ~1e-2 (velocity rows) to ~1e9 (RNEA rows x 1/P_min).
    dscale = 1.0 / jnp.sqrt(jnp.maximum(
        jax.vmap(jnp.diag)(S_diag), 1e-12))
    S_diag = S_diag * dscale[:, :, None] * dscale[:, None, :]
    S_off = S_off * dscale[:-1, :, None] * dscale[1:, None, :]

    # rhs = -(A_act Pinv q + r)  in the lambda equation
    # (sign: KKT  P d + q + A^T lam = 0,  A d = r  =>  S lam = -(A Pinv q + r))
    rhs = -(jnp.einsum("nms,ns->nm", APi, q[:-1])
            + jnp.einsum("nms,ns->nm", DPi, q[1:])
            + W * r)
    rhs = rhs * dscale

    fac = factorize(S_diag, S_off)
    lam = solve_factorized(fac, rhs) * dscale  # unscale back

    # d = -Pinv (q + A^T lam)
    Atl = jnp.zeros((N + 1, s), dtype=q.dtype)
    Atl = Atl.at[:-1].add(jnp.einsum("nms,nm->ns", A, lam))
    Atl = Atl.at[1:].add(jnp.einsum("nms,nm->ns", D, lam))
    return -Pinv * (q + Atl)


def _factorize_by_name(H, U, factorizer="sequential", u_cols=None, base=16):
    """Factorizer dispatch shared by prepare/kkt_polish/eq_project."""
    if factorizer == "auto":
        factorizer = ("cholinv_pb" if target_platform() == "tpu"
                      else "sequential")
    if factorizer == "pallas":
        from .pallas_fac import factorize_pallas

        interpret = target_platform() != "tpu"
        if interpret:
            import warnings

            warnings.warn(
                "factorizer='pallas' is running in Pallas interpreter mode "
                "(backend is not TPU) — correct but slow; use "
                "factorizer='sequential' off-TPU", stacklevel=3)
        return factorize_pallas(H, U, interpret=interpret)
    if factorizer == "cyclic":
        return factorize_cyclic(H, U)
    if factorizer in ("babe", "babe_pb"):
        return factorize_babe(
            H, U, chol_impl="cholinv_pb" if factorizer == "babe_pb"
            else "cholinv", base=base)
    if factorizer in ("cholinv", "cholinv_pb"):
        return factorize(H, U, chol_impl=factorizer, u_cols=u_cols,
                         base=base)
    return factorize(H, U, u_cols=u_cols)


def eq_project(G, B, C, P_diag, resid, W, sigma=1e-6, delta=1e-7,
               refine=2, factorizer="sequential", base=16):
    """Minimum-norm correction zeroing the masked (equality) rows.

        delta_z = argmin 1/2 d^T Mw d   s.t.   (A d)_row = resid_row  (W=1)

    Unlike `kkt_polish` this does NOT re-solve the whole QP on a guessed
    active set — it projects the CURRENT iterate onto the linearized
    equality manifold, leaving the ADMM's inequality handling intact (in
    steady gait the inequalities are strictly inactive; see the
    accuracy_probe row-group reports). This is the accurate-mode closer:
    the ADMM primal-residual tail on the heavy RNEA equality rows is
    removed by one constraint-space block-tridiagonal solve.

    Conditioning (measured on B2G rnea N=5): the exact-P metric gives the
    Schur complement S = A P^-1 A^T condition 1.4e15 — unsolvable in f32
    (the f32 residual EXCEEDS |r|). Three changes make the f32 solve exact
    to ~1e-5 relative:
      * clamp the metric inverse to a 1e4 spread around its median
        (cond 7e8 -> 1.6e5),
      * row-normalize the masked rows (inf-norm 1) before forming S,
      * 2 rounds of iterative refinement reusing the factorization.

    W: (N, m) 0/1 mask of rows to enforce (equality rows with nonzero
    Jacobian). resid: (N, m) desired row values (ignored where W=0).
    Returns delta (N+1, s).
    """
    N, m, ndx = G.shape
    s = P_diag.shape[1]
    Pinv = 1.0 / (P_diag + sigma)  # (N+1, s)
    med = jnp.median(Pinv)
    Pinv = jnp.clip(Pinv, med * 1e-2, med * 1e2)

    A = jnp.concatenate([G, B], axis=2) * W[:, :, None]  # (N, m, s)
    D = jnp.concatenate(
        [C, jnp.zeros((N, m, s - ndx), dtype=C.dtype)], axis=2
    ) * W[:, :, None]
    rn = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(A), axis=2), jnp.max(jnp.abs(D), axis=2)),
        1e-8,
    )
    A = A / rn[:, :, None]
    D = D / rn[:, :, None]
    rhs = (W * resid) / rn

    APi = A * Pinv[:-1, None, :]
    DPi = D * Pinv[1:, None, :]
    S_diag = (
        jnp.einsum("nms,nks->nmk", APi, A)
        + jnp.einsum("nms,nks->nmk", DPi, D)
    )
    # masked rows become the trivial equation lambda = 0
    S_diag = S_diag + jax.vmap(jnp.diag)(delta + (1.0 - W))
    S_off = jnp.einsum("nms,nks->nmk", DPi[:-1], A[1:])

    # Symmetric Jacobi equilibration (diag -> 1) for the f32 Cholesky.
    dscale = 1.0 / jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(S_diag), 1e-12))
    S_diag = S_diag * dscale[:, :, None] * dscale[:, None, :]
    S_off = S_off * dscale[:-1, :, None] * dscale[1:, None, :]
    rhs = rhs * dscale

    def S_matvec(lam):
        out = jnp.einsum("nmk,nk->nm", S_diag, lam)
        out = out.at[:-1].add(jnp.einsum("nmk,nk->nm", S_off, lam[1:]))
        out = out.at[1:].add(jnp.einsum("nmk,nm->nk", S_off, lam[:-1]))
        return out

    # cyclic factors don't fit solve_factorized; fall back to sequential
    fac = _factorize_by_name(
        S_diag, S_off,
        factorizer if factorizer in ("pallas", "cholinv", "cholinv_pb",
                                     "auto", "babe", "babe_pb")
        else "sequential",
        base=base,
    )
    solve = solve_babe if isinstance(fac, BabeFactor) else solve_factorized
    lam = solve(fac, rhs)
    for _ in range(refine):
        lam = lam + solve(fac, rhs - S_matvec(lam))
    lam = lam * dscale

    # delta = Pinv A^T lam  (sign: A Pinv A^T lam = r  =>  A delta = r)
    Atl = jnp.zeros((N + 1, s), dtype=resid.dtype)
    Atl = Atl.at[:-1].add(jnp.einsum("nms,nm->ns", A, lam))
    Atl = Atl.at[1:].add(jnp.einsum("nms,nm->ns", D, lam))
    return Pinv * Atl


def admm_solve(G, B, C, P_diag, q, l, u, cfg: ADMMConfig,
               x0=None, z0=None, y0=None, box_idx=None, return_work=False,
               c_eye_rows=None):
    """Solve min 1/2 d^T P d + q^T d  s.t.  l <= A d <= u  (OSQP splitting).

    Returns (d, z, y): primal step (N+1, s), constraint auxiliary (N, m) and
    duals (N, m) for warm starting the next MPC tick (reference carries
    lam_g the same way, ocp.py:373).

    return_work=True additionally returns the factorized QPWork so callers
    can run cheap follow-up solves against the same linearization (the SQP
    corrector pass); only supported with scaling_iters == 0.
    """
    with jax.default_matmul_precision(cfg.precision):
        out = _admm_solve_impl(G, B, C, P_diag, q, l, u, cfg, x0, z0, y0,
                               box_idx, return_work, c_eye_rows)
        return out


class QPWork(NamedTuple):
    """Factorized QP data reusable across ADMM phases (and across cheap
    corrector solves that keep the same linearization)."""

    fac: tuple
    A: jnp.ndarray
    D: jnp.ndarray
    rho_vec: jnp.ndarray
    cyclic: bool


def prepare(G, B, C, P_diag, l, u, cfg: ADMMConfig, box_idx=None,
            rho_vec=None, c_eye_rows=None):
    """Assemble + factorize M for the (unscaled) problem data."""
    if rho_vec is None:
        rho_vec = jnp.where(u - l < 1e-7, cfg.eq_boost * cfg.rho, cfg.rho)
    if cfg.matvec_dtype == "bfloat16":
        # Round the Jacobian blocks BEFORE assembly so M is built from
        # exactly the operator the sweeps will apply — a factor/matvec
        # mismatch destabilizes the splitting iteration (round-1 ledger:
        # violation 445 from bf16 matvecs against an f32 factor).
        G = G.astype(jnp.bfloat16).astype(G.dtype)
        B = B.astype(jnp.bfloat16).astype(B.dtype)
        C = C.astype(jnp.bfloat16).astype(C.dtype)
    with jax.default_matmul_precision(cfg.assemble_precision):
        H, U, A, D = assemble_blocks(G, B, C, P_diag, rho_vec, cfg.sigma,
                                     box_idx=box_idx, c_eye_rows=c_eye_rows)
    cyclic = cfg.factorizer == "cyclic"
    if cfg.factorizer in ("pallas", "cyclic") and U.shape[2] < H.shape[1]:
        # these factorizers take the full-width coupling block
        U = jnp.concatenate(
            [U, jnp.zeros(U.shape[:2] + (H.shape[1] - U.shape[2],),
                          dtype=U.dtype)], axis=2)
    fac = _factorize_by_name(H, U, cfg.factorizer, base=cfg.chol_base)
    if cfg.matvec_dtype == "bfloat16":
        A = A.astype(jnp.bfloat16)
        if not isinstance(D, int):
            D = D.astype(jnp.bfloat16)
    if cfg.factor_dtype == "bfloat16":
        if isinstance(fac, BlockTridiagFactor):
            fac = BlockTridiagFactor(
                Linv=fac.Linv.astype(jnp.bfloat16),
                W=fac.W.astype(jnp.bfloat16),
                V=fac.V.astype(jnp.bfloat16),
            )
        else:
            # Don't silently report a bf16-factor run that actually ran
            # f32 (would corrupt A/B probes).
            import warnings

            warnings.warn(
                f"factor_dtype='bfloat16' is only implemented for the "
                f"sequential/cholinv factorizers; ignored for "
                f"{type(fac).__name__}", stacklevel=2)
    return QPWork(fac=fac, A=A, D=D, rho_vec=rho_vec, cyclic=cyclic)


def run_iters(work: QPWork, q, l, u, cfg: ADMMConfig, x, z, y, iters,
              box_idx=None):
    """Fixed-count ADMM sweeps on prepared data (OSQP splitting)."""
    if work.cyclic:
        solve = solve_cyclic
    elif isinstance(work.fac, BabeFactor):
        solve = solve_babe
    else:
        solve = solve_factorized
    rho_vec = work.rho_vec

    def body(_, carry):
        x, z, y = carry
        rhs = cfg.sigma * x - q + _At_matvec(work.A, work.D,
                                             rho_vec * z - y, box_idx)
        x_t = solve(work.fac, rhs)
        z_t = _A_matvec(work.A, work.D, x_t, box_idx)
        x_new = cfg.alpha * x_t + (1.0 - cfg.alpha) * x
        z_relax = cfg.alpha * z_t + (1.0 - cfg.alpha) * z
        z_new = jnp.clip(z_relax + y / rho_vec, l, u)
        y_new = y + rho_vec * (z_relax - z_new)
        return x_new, z_new, y_new

    return lax.fori_loop(0, iters, body, (x, z, y))


def _admm_solve_impl(G, B, C, P_diag, q, l, u, cfg, x0, z0, y0, box_idx,
                     return_work=False, c_eye_rows=None):
    if cfg.scaling_iters > 0:
        # Ruiz scaling multiplies C row/column-wise — it is no longer the
        # pure propagation pattern, so the specialized D path is off.
        c_eye_rows = None
    N, m, _ = G.shape  # m = dense rows; l/u may carry extra box rows
    ndx = G.shape[2]
    s = P_diag.shape[1]

    # Per-row penalty from the *unscaled* bounds: OSQP boosts rho on
    # equality rows (l == u).
    rho_vec = jnp.where(u - l < 1e-7, cfg.eq_boost * cfg.rho, cfg.rho)

    # Ruiz equilibration (OSQP scaling; the reference relies on OSQP's
    # built-in scaling, osqp defaults at ocp.py:305-313).
    m_rows_all = l.shape[1]
    if cfg.scaling_iters > 0:
        E, Dc = ruiz_equilibrate(G, B, C, P_diag, cfg.scaling_iters)
        if box_idx is not None:
            # Box rows are pure selectors applied to the SCALED variable
            # (coefficient exactly 1 in _A_matvec), so their row scaling must
            # be E = 1/Dc at the selected slot for the unscaled bounds to
            # stay exact: l*E <= x/Dc <= u*E  <=>  l <= x <= u.
            E = jnp.concatenate([E, 1.0 / Dc[:-1][:, box_idx]], axis=1)
    else:
        E = jnp.ones((N, m_rows_all), dtype=q.dtype)
        Dc = jnp.ones((N + 1, s), dtype=q.dtype)
    Ed = E[:, :m]
    G = G * Ed[:, :, None] * Dc[:-1, None, :ndx]
    B = B * Ed[:, :, None] * Dc[:-1, None, ndx:]
    C = C * Ed[:, :, None] * Dc[1:, None, :ndx]
    P_diag = P_diag * Dc * Dc
    q = q * Dc
    l = l * E
    u = u * E

    work = prepare(G, B, C, P_diag, l, u, cfg, box_idx=box_idx,
                   rho_vec=rho_vec, c_eye_rows=c_eye_rows)

    m_rows = l.shape[1]
    x = jnp.zeros((N + 1, s), dtype=q.dtype) if x0 is None else x0 / Dc
    z = jnp.zeros((N, m_rows), dtype=q.dtype) if z0 is None else z0 * E
    y = jnp.zeros((N, m_rows), dtype=q.dtype) if y0 is None else y0 / E

    x, z, y = run_iters(work, q, l, u, cfg, x, z, y, cfg.iters,
                        box_idx=box_idx)

    if cfg.polish_iters > 0:
        # Equality-polish: boost rho on equality rows, refactorize, run a
        # few more sweeps with the carried (x, z, y). Inequalities keep
        # their rho (they are almost never the binding violation in steady
        # gait; see accuracy_probe row-group output).
        eq = (u - l) < 1e-7
        rho_p = jnp.where(eq, cfg.polish_boost * rho_vec, rho_vec)
        work_p = prepare(G, B, C, P_diag, l, u, cfg, box_idx=box_idx,
                         rho_vec=rho_p, c_eye_rows=c_eye_rows)
        x, z, y = run_iters(work_p, q, l, u, cfg, x, z, y,
                            cfg.polish_iters, box_idx=box_idx)

    # Unscale back to problem units.
    if return_work:
        if cfg.scaling_iters != 0:
            # Hard error (not assert: -O would strip it and silently hand
            # scaled-units work to the corrector, producing wrong steps).
            raise ValueError(
                "admm_solve(return_work=True) requires scaling_iters == 0: "
                "corrector steps reuse the factorization in problem units")
        return (x * Dc, z / E, y * E), work
    return x * Dc, z / E, y * E
