"""Unit tests for the block-tridiagonal ADMM QP solver against dense
reference solutions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_locoman.solver.qp import (
    ADMMConfig,
    admm_solve,
    assemble_blocks,
    factorize,
    solve_factorized,
)


def random_blocks(rng, N=5, m=7, ndx=4, nu=3, scale_spread=False):
    G = rng.normal(size=(N, m, ndx))
    B = rng.normal(size=(N, m, nu))
    C = rng.normal(size=(N, m, ndx))
    s = ndx + nu
    P = np.abs(rng.normal(size=(N + 1, s))) + 0.1
    if scale_spread:
        # badly scaled rows/cols like the real OCP (1e-3 .. 1e4)
        G *= 10.0 ** rng.uniform(-2, 2, size=(N, m, 1))
        P *= 10.0 ** rng.uniform(-3, 4, size=(N + 1, s))
    return (
        jnp.asarray(G, dtype=jnp.float32),
        jnp.asarray(B, dtype=jnp.float32),
        jnp.asarray(C, dtype=jnp.float32),
        jnp.asarray(P, dtype=jnp.float32),
    )


def dense_A(G, B, C):
    N, m, ndx = G.shape
    nu = B.shape[2]
    s = ndx + nu
    A = np.zeros((N * m, (N + 1) * s))
    for i in range(N):
        A[i * m:(i + 1) * m, i * s:i * s + ndx] = G[i]
        A[i * m:(i + 1) * m, i * s + ndx:(i + 1) * s] = B[i]
        A[i * m:(i + 1) * m, (i + 1) * s:(i + 1) * s + ndx] = C[i]
    return A


def test_block_tridiag_solve_matches_dense():
    rng = np.random.default_rng(1)
    G, B, C, P = random_blocks(rng)
    N, m, ndx = G.shape
    s = P.shape[1]
    rho, sigma = 0.1, 1e-6
    rho_vec = jnp.full((N, m), rho, dtype=jnp.float32)
    H, U, A, D = assemble_blocks(G, B, C, P, rho_vec, sigma)
    fac = factorize(H, U)
    b = jnp.asarray(rng.normal(size=(N + 1, s)), dtype=jnp.float32)
    x = solve_factorized(fac, b)

    Ad = dense_A(np.asarray(G), np.asarray(B), np.asarray(C))
    Md = np.diag(np.asarray(P).ravel() + sigma) + rho * Ad.T @ Ad
    x_dense = np.linalg.solve(Md, np.asarray(b).ravel())
    np.testing.assert_allclose(
        np.asarray(x).ravel(), x_dense, rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("spread", [False, True])
def test_admm_equality_qp_matches_kkt(spread):
    """Equality-constrained QP (l == u) has a closed-form KKT solution."""
    rng = np.random.default_rng(2)
    G, B, C, P = random_blocks(rng, N=4, m=3, ndx=4, nu=2, scale_spread=spread)
    N, m, ndx = G.shape
    s = P.shape[1]
    q = jnp.asarray(rng.normal(size=(N + 1, s)), dtype=jnp.float32)
    beq = jnp.asarray(rng.normal(size=(N, m)), dtype=jnp.float32)

    cfg = ADMMConfig(iters=600, rho=0.1, sigma=1e-6, alpha=1.6)
    x, z, y = admm_solve(G, B, C, P, q, beq, beq, cfg)

    Ad = dense_A(np.asarray(G), np.asarray(B), np.asarray(C))
    n = (N + 1) * s
    Pd = np.diag(np.asarray(P, dtype=np.float64).ravel())
    KKT = np.block([
        [Pd, Ad.T],
        [Ad, np.zeros((N * m, N * m))],
    ])
    rhs = np.concatenate([-np.asarray(q).ravel(), np.asarray(beq).ravel()])
    sol = np.linalg.solve(KKT, rhs)
    x_ref = sol[:n]
    scale = np.abs(x_ref).max() + 1.0
    np.testing.assert_allclose(
        np.asarray(x).ravel(), x_ref, atol=2e-2 * scale
    )


def test_admm_box_qp_kkt_conditions():
    """Inequality QP: check primal feasibility + stationarity residuals."""
    rng = np.random.default_rng(3)
    G, B, C, P = random_blocks(rng, N=4, m=5, ndx=4, nu=2)
    N, m, ndx = G.shape
    s = P.shape[1]
    q = jnp.asarray(rng.normal(size=(N + 1, s)), dtype=jnp.float32)
    l = jnp.asarray(rng.normal(size=(N, m)) - 2.0, dtype=jnp.float32)
    u = jnp.asarray(np.asarray(l) + np.abs(rng.normal(size=(N, m))) + 0.5)

    cfg = ADMMConfig(iters=800, rho=0.1, sigma=1e-6, alpha=1.6)
    x, z, y = admm_solve(G, B, C, P, q, l, u, cfg)

    Ad = dense_A(np.asarray(G), np.asarray(B), np.asarray(C))
    xf = np.asarray(x).ravel()
    Ax = Ad @ xf
    # primal feasibility
    assert np.max(np.asarray(l).ravel() - Ax) < 1e-2
    assert np.max(Ax - np.asarray(u).ravel()) < 1e-2
    # stationarity: P x + q + A^T y ~ 0
    r = np.diag(np.asarray(P).ravel()) @ xf + np.asarray(q).ravel() + Ad.T @ np.asarray(y).ravel()
    assert np.abs(r).max() < 5e-2 * (np.abs(q).max() + 1.0)


def test_cyclic_reduction_matches_dense():
    from tpu_locoman.solver.qp import factorize_cyclic, solve_cyclic

    rng = np.random.default_rng(5)
    for N in [4, 5, 14]:  # block counts N+1 = 5, 6, 15 (non powers of two)
        G, B, C, P = random_blocks(rng, N=N, m=6, ndx=4, nu=3)
        s = P.shape[1]
        rho_vec = jnp.full((N, 6), 0.1, dtype=jnp.float32)
        H, U, A, D = assemble_blocks(G, B, C, P, rho_vec, 1e-6)
        fac = factorize_cyclic(H, U)
        b = jnp.asarray(rng.normal(size=(N + 1, s)), dtype=jnp.float32)
        x = solve_cyclic(fac, b)

        Ad = dense_A(np.asarray(G), np.asarray(B), np.asarray(C))
        Md = np.diag(np.asarray(P, dtype=np.float64).ravel() + 1e-6) + (
            Ad.T * 0.1
        ) @ Ad
        x_dense = np.linalg.solve(Md, np.asarray(b).ravel())
        scale = np.abs(x_dense).max() + 1.0
        np.testing.assert_allclose(
            np.asarray(x).ravel(), x_dense, atol=5e-3 * scale
        )


def test_factorize_cholinv_matches_blocked():
    """factorize(chol_impl='cholinv') — the While-loop-free variant — must
    match the blocked-panel default to f32 roundoff at the flagship
    block shape."""
    from tpu_locoman.solver.qp import factorize, solve_factorized

    rng = np.random.default_rng(11)
    K, s = 15, 112
    A = rng.standard_normal((K, s, s)).astype(np.float32)
    H = jnp.asarray(A @ A.transpose(0, 2, 1) + 10 * np.eye(s, dtype=np.float32))
    U = jnp.asarray(0.1 * rng.standard_normal((K - 1, s, s)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((K, s)).astype(np.float32))
    x1 = np.asarray(solve_factorized(factorize(H, U), b))
    x2 = np.asarray(
        solve_factorized(factorize(H, U, chol_impl="cholinv"), b)
    )
    np.testing.assert_allclose(x2, x1, atol=1e-4 * (np.abs(x1).max() + 1))

    # cholinv_pb: the lane-batched Pallas base kernel fires through its
    # custom_vmap rule under the production vmap-over-scenarios
    # (interpret mode off-TPU). Three INDEPENDENT systems so distinct
    # lanes (and the identity-padding path) carry distinct data, each
    # lane checked against its own blocked-factorizer solution (ADVICE r3).
    import functools

    As = rng.standard_normal((3,) + A.shape).astype(np.float32)
    Hb = jnp.asarray(
        As @ As.transpose(0, 1, 3, 2) + 10 * np.eye(s, dtype=np.float32))
    Ub = jnp.asarray(
        0.1 * rng.standard_normal((3,) + U.shape).astype(np.float32))
    bb = jnp.asarray(rng.standard_normal((3,) + b.shape).astype(np.float32))
    fpb = jax.vmap(functools.partial(factorize, chol_impl="cholinv_pb"))
    x3 = np.asarray(jax.vmap(solve_factorized)(fpb(Hb, Ub), bb))
    for lane in range(3):
        ref = np.asarray(
            solve_factorized(factorize(Hb[lane], Ub[lane]), bb[lane]))
        np.testing.assert_allclose(
            x3[lane], ref, atol=1e-4 * (np.abs(ref).max() + 1))


def test_admm_cyclic_matches_sequential():
    rng = np.random.default_rng(6)
    G, B, C, P = random_blocks(rng, N=6, m=5, ndx=4, nu=2)
    N = 6
    q = jnp.asarray(rng.normal(size=(N + 1, P.shape[1])), dtype=jnp.float32)
    l = jnp.asarray(rng.normal(size=(N, 5)) - 2.0, dtype=jnp.float32)
    u = jnp.asarray(np.asarray(l) + 1.0)
    xs, _, _ = admm_solve(G, B, C, P, q, l, u,
                          ADMMConfig(iters=300, factorizer="sequential"))
    xc, _, _ = admm_solve(G, B, C, P, q, l, u,
                          ADMMConfig(iters=300, factorizer="cyclic"))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xc),
                               atol=2e-2 * (np.abs(np.asarray(xs)).max() + 1))


def test_admm_box_rows_match_dense_selectors():
    """Box mode (selector rows via gather/scatter) must match the same
    problem posed with explicit dense selector rows."""
    rng = np.random.default_rng(9)
    N, m, ndx, nu = 5, 6, 4, 3
    s = ndx + nu
    G, B, C, P = random_blocks(rng, N=N, m=m, ndx=ndx, nu=nu)
    nbox = 3
    box_idx = np.array([1, 4, 5])  # slots within the stage block
    q = jnp.asarray(rng.normal(size=(N + 1, s)), dtype=jnp.float32)
    l_d = jnp.asarray(rng.normal(size=(N, m)) - 2.0, dtype=jnp.float32)
    u_d = jnp.asarray(np.asarray(l_d) + 1.0)
    l_b = jnp.asarray(rng.normal(size=(N, nbox)) - 1.0, dtype=jnp.float32)
    u_b = jnp.asarray(np.asarray(l_b) + 2.0)
    cfg = ADMMConfig(iters=400)

    # box mode
    x1, z1, y1 = admm_solve(
        G, B, C, P, q,
        jnp.concatenate([l_d, l_b], axis=1),
        jnp.concatenate([u_d, u_b], axis=1),
        cfg, box_idx=box_idx,
    )
    # dense-equivalent: append explicit selector rows
    sel = np.zeros((N, nbox, s), dtype=np.float32)
    for k, idx in enumerate(box_idx):
        sel[:, k, idx] = 1.0
    G2 = jnp.concatenate([G, jnp.asarray(sel[:, :, :ndx])], axis=1)
    B2 = jnp.concatenate([B, jnp.asarray(sel[:, :, ndx:])], axis=1)
    C2 = jnp.concatenate(
        [C, jnp.zeros((N, nbox, ndx), dtype=jnp.float32)], axis=1
    )
    x2, z2, y2 = admm_solve(
        G2, B2, C2, P, q,
        jnp.concatenate([l_d, l_b], axis=1),
        jnp.concatenate([u_d, u_b], axis=1),
        cfg,
    )
    scale = float(jnp.max(jnp.abs(x2))) + 1.0
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               atol=5e-3 * scale)


def test_pallas_factorize_matches_xla():
    """The Pallas VMEM factorization kernel (solver/pallas_fac.py) must
    reproduce qp.factorize exactly (same recurrence, f32): Linv/W/V blocks
    and the resulting solve. Runs the kernel in interpreter mode (CPU
    conftest); on TPU the same code path compiles to one kernel per
    scenario."""
    from tpu_locoman.solver.pallas_fac import factorize_pallas

    rng = np.random.default_rng(7)
    K, s = 6, 37  # odd size: exercises uneven recursion splits + padding
    A = rng.normal(size=(K, s, s)).astype(np.float32)
    H = jnp.asarray(
        np.einsum("nij,nkj->nik", A, A) / s + 3.0 * np.eye(s, dtype=np.float32)
    )
    U = jnp.asarray(0.1 * rng.normal(size=(K - 1, s, s)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K, s)).astype(np.float32))

    f_ref = factorize(H, U)
    f_pal = factorize_pallas(H, U, interpret=jax.default_backend() != "tpu")
    for name in ("Linv", "W", "V"):
        np.testing.assert_allclose(
            np.asarray(getattr(f_pal, name)),
            np.asarray(getattr(f_ref, name)),
            atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(solve_factorized(f_pal, b)),
        np.asarray(solve_factorized(f_ref, b)),
        atol=1e-5,
    )

    # batched via vmap (lifts into the Pallas grid on TPU)
    Hb = jnp.stack([H, H + 0.1 * jnp.eye(s)])
    Ub = jnp.stack([U, 0.5 * U])
    fb = jax.vmap(
        lambda h, u: factorize_pallas(
            h, u, interpret=jax.default_backend() != "tpu"
        )
    )(Hb, Ub)
    f1 = factorize(Hb[1], Ub[1])
    np.testing.assert_allclose(
        np.asarray(fb.Linv[1]), np.asarray(f1.Linv), atol=1e-5
    )


def test_pallas_factorize_flagship_n30_shape():
    """The long-horizon shape the round-3 battery drives on hardware
    (BENCH_NODES=30 -> K=31 blocks at the REAL b2g whole_body_rnea stage
    width): recursion splits, padding, and the kernel recurrence must stay
    exact, and the per-instance VMEM footprint must stay inside the ~16 MB
    budget the kernel assumes (solver/pallas_fac.py docstring)."""
    from tpu_locoman import B2G, MPC, SQPConfig
    from tpu_locoman.solver.pallas_fac import factorize_pallas

    robot = B2G()
    robot.set_gait_sequence("trot", 0.8)
    s = MPC(robot, dynamics="whole_body_rnea", nodes=3,
            config=SQPConfig()).trans.s  # stage width: nodes-independent
    K = 31
    rng = np.random.default_rng(11)
    A = rng.normal(size=(K, s, s)).astype(np.float32)
    H = jnp.asarray(
        np.einsum("nij,nkj->nik", A, A) / s + 3.0 * np.eye(s, dtype=np.float32)
    )
    U = jnp.asarray(0.1 * rng.normal(size=(K - 1, s, s)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(K, s)).astype(np.float32))

    # 5 resident (K, s_pad=lane-128-padded) f32 arrays per grid instance
    s_sub = ((s + 7) // 8) * 8
    s_lane = ((s + 127) // 128) * 128
    vmem_mb = 5 * K * s_sub * s_lane * 4 / 2**20
    assert vmem_mb < 12.0, f"VMEM estimate {vmem_mb:.1f} MB too close to 16"

    f_ref = factorize(H, U)
    f_pal = factorize_pallas(H, U, interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(
        np.asarray(solve_factorized(f_pal, b)),
        np.asarray(solve_factorized(f_ref, b)),
        atol=1e-5,
    )


def test_return_work_requires_unscaled():
    """return_work=True with Ruiz scaling enabled must hard-error (the
    corrector would otherwise silently reuse scaled-units QP work)."""
    rng = np.random.default_rng(7)
    G, B, C, P = random_blocks(rng, N=3, m=3, ndx=3, nu=2)
    N, m, _ = G.shape
    s = P.shape[1]
    q = jnp.zeros((N + 1, s), dtype=jnp.float32)
    b = jnp.zeros((N, m), dtype=jnp.float32)
    cfg = ADMMConfig(iters=2, scaling_iters=1)
    with pytest.raises(ValueError, match="scaling_iters"):
        admm_solve(G, B, C, P, q, b, b, cfg, return_work=True)


def test_assemble_c_eye_rows_specialization():
    """assemble_blocks with c_eye_rows (the constant propagation pattern)
    must match the dense-D path bit-for-bit in H/U, and the int-D ADMM
    matvecs must match the dense-D matvecs."""
    from tpu_locoman.solver.qp import (assemble_blocks, _A_matvec,
                                       _At_matvec)

    rng = np.random.default_rng(7)
    N, m, ndx, nu, k = 4, 9, 5, 3, 5
    s = ndx + nu
    G = jnp.asarray(rng.standard_normal((N, m, ndx)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((N, m, nu)).astype(np.float32))
    C_pat = np.zeros((m, ndx), dtype=np.float32)
    C_pat[:k, :k] = np.eye(k, dtype=np.float32)
    C = jnp.broadcast_to(jnp.asarray(C_pat), (N, m, ndx))
    P_diag = jnp.asarray(
        np.abs(rng.standard_normal((N + 1, s))).astype(np.float32) + 0.5)
    box_idx = np.asarray([1, 6], dtype=np.int32)
    rho = jnp.asarray(
        np.abs(rng.standard_normal((N, m + 2))).astype(np.float32) + 0.1)

    H0, U0, A0, D0 = assemble_blocks(G, B, C, P_diag, rho, 1e-6,
                                     box_idx=box_idx)
    H1, U1, A1, D1 = assemble_blocks(G, B, C, P_diag, rho, 1e-6,
                                     box_idx=box_idx, c_eye_rows=k)
    assert D1 == k
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-5)
    # the c_eye path returns U skinny: its k live columns must match the
    # dense U's, whose remaining columns are structurally zero
    assert U1.shape == (N, s, k)
    np.testing.assert_allclose(np.asarray(U1), np.asarray(U0[:, :, :k]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(U0[:, :, k:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0))

    X = jnp.asarray(rng.standard_normal((N + 1, s)).astype(np.float32))
    Wv = jnp.asarray(rng.standard_normal((N, m + 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_A_matvec(A1, k, X, box_idx)),
        np.asarray(_A_matvec(A0, D0, X, box_idx)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(_At_matvec(A1, k, Wv, box_idx)),
        np.asarray(_At_matvec(A0, D0, Wv, box_idx)), atol=1e-5)


def test_factorize_u_cols_matches_dense():
    """factorize(u_cols=k) on a U with only k live columns must produce
    the same solve as the dense path (V stored as its k live columns)."""
    from tpu_locoman.solver.qp import factorize, solve_factorized

    rng = np.random.default_rng(13)
    N1, s, k = 5, 12, 5
    As = rng.standard_normal((N1, s, s)).astype(np.float32)
    H = jnp.asarray(As @ As.transpose(0, 2, 1) + 8 * np.eye(s, dtype=np.float32))
    U = np.zeros((N1 - 1, s, s), dtype=np.float32)
    U[:, :, :k] = rng.standard_normal((N1 - 1, s, k)).astype(np.float32)
    U = jnp.asarray(U)
    b = jnp.asarray(rng.standard_normal((N1, s)).astype(np.float32))

    x_dense = solve_factorized(factorize(H, U), b)
    fac_k = factorize(H, U, u_cols=k)
    assert fac_k.V.shape[-1] == k
    x_k = solve_factorized(fac_k, b)
    np.testing.assert_allclose(
        np.asarray(x_k), np.asarray(x_dense),
        atol=1e-4 * (np.abs(np.asarray(x_dense)).max() + 1))


@pytest.mark.parametrize("S_", [15, 16, 8, 5])
def test_babe_solve_matches_sequential(S_):
    """The burn-at-both-ends factorizer (factorize_babe/solve_babe) must
    match the sequential block-tridiagonal solve to f32 roundoff, for odd
    and even horizon lengths (chain padding) and with skinny U."""
    from tpu_locoman.solver.qp import factorize_babe, solve_babe

    rng = np.random.default_rng(11)
    s, k = 9, 4
    H = rng.standard_normal((S_, s, s)).astype(np.float32)
    H = H @ np.swapaxes(H, 1, 2) + 10 * np.eye(s, dtype=np.float32)
    U = np.zeros((S_ - 1, s, s), dtype=np.float32)
    U[:, :, :k] = rng.standard_normal((S_ - 1, s, k)).astype(np.float32)
    b = rng.standard_normal((S_, s)).astype(np.float32)

    fac_seq = factorize(jnp.asarray(H), jnp.asarray(U))
    x_seq = np.asarray(solve_factorized(fac_seq, jnp.asarray(b)))

    for Uin in (jnp.asarray(U), jnp.asarray(U[:, :, :k])):  # full + skinny
        fac_b = factorize_babe(jnp.asarray(H), Uin)
        x_b = np.asarray(solve_babe(fac_b, jnp.asarray(b)))
        np.testing.assert_allclose(x_b, x_seq, rtol=2e-3, atol=2e-4)


def test_babe_admm_matches_sequential_in_context():
    """admm_solve with factorizer='babe' must produce the same solution as
    the sequential factorizer on a random stage QP."""
    rng = np.random.default_rng(3)
    G, B, C, P = random_blocks(rng)
    N, m, _ = G.shape
    q = jnp.asarray(rng.normal(size=(N + 1, P.shape[1])), dtype=jnp.float32)
    l = jnp.asarray(rng.normal(size=(N, m)) - 2.0, dtype=jnp.float32)
    u = l + jnp.asarray(np.abs(rng.normal(size=(N, m))) + 0.5,
                        dtype=jnp.float32)
    from tpu_locoman.solver.qp import ADMMConfig, admm_solve

    outs = {}
    for fz in ("sequential", "babe"):
        cfg = ADMMConfig(iters=150, factorizer=fz, scaling_iters=0)
        x, z, y = admm_solve(G, B, C, P, q, l, u, cfg)
        outs[fz] = np.asarray(x)
    np.testing.assert_allclose(outs["babe"], outs["sequential"],
                               rtol=1e-3, atol=1e-4)
