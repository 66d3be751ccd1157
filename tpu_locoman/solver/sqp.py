"""SQP outer loop with Armijo-style filter line search.

TPU-native counterpart of the reference's custom OSQP-SQP solver
(ocp.py:375-422) including its line-search acceptance logic (ocp.py:430-496).
One jitted solve = linearize (vmapped jacfwd) -> block-tridiagonal ADMM QP ->
vectorized line search.  The while-loop line search of the reference is
replaced by evaluating all candidate step sizes in parallel and replaying
the same sequential acceptance rules as a cheap lax.scan over scalars.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .qp import (ADMMConfig, admm_solve, eq_project, kkt_polish, run_iters,
                 _A_matvec)


class SQPConfig(NamedTuple):
    sqp_iters: int = 1  # reference runs 1 SQP iteration per tick (ocp.py:383)
    admm: ADMMConfig = ADMMConfig()
    # Optional per-SQP-iteration ADMM iteration counts, e.g. (10, 5) runs a
    # second cheap corrector pass that knocks down gait-transition spikes
    # (CLAUDE.md roadmap item 4). None = admm.iters for every iteration.
    admm_schedule: tuple = None
    # Corrector pass: after the line search, re-evaluate the residuals at
    # the updated iterate and run this many extra ADMM sweeps REUSING the
    # existing linearization and factorization (a second-order correction:
    # fresh g, stale A). Much cheaper than a full second SQP iteration —
    # costs ~2 residual evaluations + the sweeps. 0 = off.
    corrector_iters: int = 0
    # OSQP-style polish: after the ADMM pass, solve the active-set equality
    # KKT exactly via a second block-tridiagonal factorization (qp.kkt_polish)
    # so the linearized equalities are satisfied to f32 roundoff instead of
    # the ADMM iteration floor. The accurate-mode backbone.
    kkt_polish: bool = False
    # Equality-projection passes (accurate mode): after the line search /
    # corrector, Newton-project the iterate onto the linearized equality
    # manifold (qp.eq_project) — removes the ADMM primal-residual tail on
    # the heavy equality rows exactly (one constraint-space factorization
    # per pass) without touching the inequality handling. Each pass is
    # guarded: an iterate is kept only if its true violation improves.
    eq_projection: int = 0
    line_search: bool = True
    # Line-search parameters (ocp.py:431-438).
    armijo_factor: float = 1e-4
    a_decay: float = 0.5
    n_trials: int = 8  # a = 1, 0.5, ..., 0.5^7 (alpha=1 in steady MPC)
    g_max: float = 1e-3
    g_min: float = 1e-5
    gamma: float = 1e-5

    # -- shipping presets ----------------------------------------------
    @classmethod
    def fast(cls):
        """The real-time hot config (bench default): 1 SQP iteration with
        10 warm-started ADMM sweeps per tick — the throughput end of the
        frontier (reference analog: ocp.py:383 one-iteration MPC)."""
        return cls(sqp_iters=1, admm=ADMMConfig(iters=10))

    @classmethod
    def accurate(cls):
        """Production-tolerance preset: holds mean max-violation <= 1e-3
        over a rollout — the tolerance the reference's production solver
        ships (Fatrop tol 1e-3, ocp.py:256-257).

        Round-3 frontier sweeps (tools/accurate_frontier.py): quality is
        carried almost entirely by the equality-projection pass count —
        4 passes on top of the HOT config (1 SQP x 10 warm ADMM) measure
        mean 1.7e-4 / worst tick 2.7e-4 on the flagship b2g rnea N=14 and
        2.2e-5 on go2 N=8 (30-40 tick CPU rollouts), identical to heavy
        sqp3 x admm25-50 variants at ~1/3 their cost and ~30x cheaper
        than the round-2 brute-force sqp6 x admm400 golden config. Extra
        SQP iterations/ADMM sweeps do NOT move the floor; the 4th
        projection pass does (3 passes floor at ~1.2e-3 flagship)."""
        return cls(sqp_iters=1, admm=ADMMConfig(iters=10), eq_projection=4)


PRESETS = {"fast": SQPConfig.fast, "accurate": SQPConfig.accurate}


class SolverState(NamedTuple):
    """Warm-start carry between MPC ticks (primal iterate + ADMM duals,
    mirroring the reference's DX_prev/U_prev/lam_g persistence,
    ocp.py:196-198,373)."""

    Z: jnp.ndarray  # (N+1, s)
    z_admm: jnp.ndarray  # (N, m)
    y_admm: jnp.ndarray  # (N, m)


class SQPSolver:
    def __init__(self, transcription, config: SQPConfig = SQPConfig()):
        if config.sqp_iters < 1:
            raise ValueError("SQPConfig.sqp_iters must be >= 1")
        self.trans = transcription
        self.cfg = config

    def init_state(self, dtype=jnp.float32):
        t = self.trans
        return SolverState(
            Z=jnp.zeros((t.nodes + 1, t.s), dtype=dtype),
            z_admm=jnp.zeros((t.nodes, t.m), dtype=dtype),
            y_admm=jnp.zeros((t.nodes, t.m), dtype=dtype),
        )

    def _violation(self, g, l, u):
        viol = jnp.maximum(0.0, l - g) + jnp.maximum(0.0, g - u)
        return jnp.sqrt(jnp.sum(viol * viol))

    def _line_search(self, Z, d, obj, stage_params, shared, l_b, u_b, g_at_Z):
        """Vectorized replay of ocp.py:430-480."""
        cfg = self.cfg
        t = self.trans
        alphas = cfg.a_decay ** jnp.arange(cfg.n_trials, dtype=Z.dtype)

        def merit(alpha):
            Zc = Z + alpha * d
            f = t.objective_value(Zc, obj)
            g = t.evaluate(Zc, stage_params, shared)
            viol = jnp.maximum(0.0, l_b - g) + jnp.maximum(0.0, g - u_b)
            return f, jnp.sqrt(jnp.sum(viol * viol)), jnp.max(viol), g

        new_fs, new_gs, new_maxv, new_res = jax.vmap(merit)(alphas)

        f0 = t.objective_value(Z, obj)
        g0 = self._violation(g_at_Z, l_b, u_b)  # reuse linearize's residual
        armijo_metric = jnp.sum(t.objective_gradient(Z, obj) * d)

        def step(carry, inp):
            accepted, alpha_acc, maxv_acc, g_acc = carry
            alpha_k, new_f, new_g, new_mv, new_r = inp
            # Acceptance rules (ocp.py:448-467), evaluated against the
            # incumbent iterate (f0, g0). The reference compares against the
            # previous *trial* instead, which lets a diverging step get
            # accepted because it "improves" on an even worse trial; using
            # the incumbent is the stable variant of the same filter.
            c1 = (new_g > cfg.g_max) & (new_g < (1.0 - cfg.gamma) * g0)
            c2 = (
                (new_g <= cfg.g_max)
                & (jnp.maximum(new_g, g0) < cfg.g_min)
                & (armijo_metric < 0)
                & (new_f <= f0 + cfg.armijo_factor * armijo_metric * alpha_k)
            )
            # c3 mirrors the reference's elif fall-through exactly: branch 2
            # captures the trial only when BOTH its guards hold (tiny
            # violations AND a descent direction); with armijo >= 0 the
            # reference falls to rule 3 even when violations are tiny.
            c3 = (
                (new_g <= cfg.g_max)
                & ~((jnp.maximum(new_g, g0) < cfg.g_min) & (armijo_metric < 0))
                & (
                    (new_f <= f0 - cfg.gamma * new_g)
                    | (new_g < (1.0 - cfg.gamma) * g0)
                )
            )
            accept_now = (~accepted) & (c1 | c2 | c3)
            alpha_acc = jnp.where(accept_now, alpha_k, alpha_acc)
            maxv_acc = jnp.where(accept_now, new_mv, maxv_acc)
            g_acc = jnp.where(accept_now, new_r, g_acc)
            return (accepted | accept_now, alpha_acc, maxv_acc, g_acc), None

        # max violation at the incumbent (for the rejected-everything case)
        viol0 = jnp.maximum(0.0, l_b - g_at_Z) + jnp.maximum(0.0, g_at_Z - u_b)
        (accepted, alpha_acc, maxv_acc, g_acc), _ = lax.scan(
            step,
            (jnp.array(False), jnp.zeros((), Z.dtype), jnp.max(viol0),
             g_at_Z),
            (alphas, new_fs, new_gs, new_maxv, new_res),
        )
        alpha = jnp.where(accepted, alpha_acc, 0.0)
        # g_acc is evaluate() at the RETURNED iterate Z + alpha d (the
        # incumbent's residual if every trial was rejected) — callers (the
        # corrector) reuse it instead of paying another evaluate.
        return Z + alpha * d, alpha, maxv_acc, g_acc

    def solve(self, state: SolverState, stage_params, shared):
        """One MPC solve. Returns (new_state, stats dict).

        Wrapped in highest matmul precision: TPU's default bf16 matmul
        passes destroy KKT-solve accuracy (violations 0.8 -> 190 on the
        flagship config)."""
        with jax.default_matmul_precision("highest"):
            return self._solve(state, stage_params, shared)

    def _solve(self, state: SolverState, stage_params, shared):
        t = self.trans
        cfg = self.cfg
        obj = t.objective_data(shared)
        P_diag = t.hessian_diag(obj)
        l_b, u_b = t.bounds(stage_params, shared)

        Z = state.Z
        z_admm, y_admm = state.z_admm, state.y_admm
        alpha = jnp.zeros((), Z.dtype)

        def one_iteration(Z, z_admm, y_admm, admm_cfg, want_work):
            """One full SQP iteration: linearize -> ADMM QP -> line search.

            Returns (Z, z_admm, y_admm, alpha, max_viol, bad, d, qp_work,
            g_new) with qp_work None unless want_work; g_new is
            evaluate() at the returned Z (reused by the corrector)."""
            g, G, B, C = t.linearize(Z, stage_params, shared)
            q = t.objective_gradient(Z, obj)
            l = l_b - g
            u = u_b - g
            qp_work = None
            c_eye = getattr(t, "c_eye_rows", None)
            if want_work:
                (d, z_new, y_new), qp_work = admm_solve(
                    G, B, C, P_diag, q, l, u, admm_cfg, z0=z_admm,
                    y0=y_admm, box_idx=t.box_slots, return_work=True,
                    c_eye_rows=c_eye,
                )
            else:
                d, z_new, y_new = admm_solve(
                    G, B, C, P_diag, q, l, u, admm_cfg, z0=z_admm,
                    y0=y_admm, box_idx=t.box_slots, c_eye_rows=c_eye,
                )
            if cfg.kkt_polish:
                with jax.default_matmul_precision(cfg.admm.precision):
                    d = kkt_polish(G, B, C, P_diag, q, l, u, z_new)
            # A failed solve (NaN) must not poison the iterate: treat it as
            # a zero step, like the reference's opti.debug fallback
            # (ocp.py:362-365).
            bad = jnp.any(jnp.isnan(d))
            d = jnp.where(bad, jnp.zeros_like(d), d)
            z_new = jnp.where(bad, jnp.zeros_like(z_new), z_new)
            y_new = jnp.where(bad, jnp.zeros_like(y_new), y_new)
            if cfg.line_search:
                Z_new, alpha, max_viol, g_new = self._line_search(
                    Z, d, obj, stage_params, shared, l_b, u_b, g
                )
            else:
                Z_new = Z + d
                alpha = jnp.ones((), Z.dtype)
                g_new = t.evaluate(Z_new, stage_params, shared)
                viol = jnp.maximum(0.0, l_b - g_new) + jnp.maximum(
                    0.0, g_new - u_b
                )
                max_viol = jnp.max(viol)
            return (Z_new, z_new, y_new, alpha, max_viol, bad, d, qp_work,
                    g_new)

        # Identical leading iterations run as a lax.scan so the (large:
        # linearize + factorize + ADMM) body is traced and COMPILED ONCE —
        # python-unrolling 6 SQP iterations used to produce XLA programs
        # big enough to OOM LLVM on the CPU backend (CLAUDE.md). The final
        # iteration stays unrolled: it may return the QP work for the
        # corrector pass and feeds alpha/max_viol into the stats.
        n_scan = 0
        if cfg.admm_schedule is None and cfg.sqp_iters >= 3:
            n_scan = cfg.sqp_iters - 1

            def scan_body(carry, _):
                Z, z_admm, y_admm = carry
                Z, z_admm, y_admm, *_rest = one_iteration(
                    Z, z_admm, y_admm, cfg.admm, False
                )
                return (Z, z_admm, y_admm), None

            (Z, z_admm, y_admm), _ = lax.scan(
                scan_body, (Z, z_admm, y_admm), None, length=n_scan
            )

        for it in range(n_scan, cfg.sqp_iters):
            admm_cfg = cfg.admm
            if cfg.admm_schedule is not None:
                admm_cfg = admm_cfg._replace(iters=cfg.admm_schedule[it])
            want_work = cfg.corrector_iters > 0 and it == cfg.sqp_iters - 1
            Z, z_admm, y_admm, alpha, max_viol, bad, d, qp_work, g_new = (
                one_iteration(Z, z_admm, y_admm, admm_cfg, want_work)
            )

        if cfg.corrector_iters > 0:
            # Second-order correction: fresh residuals at the stepped
            # iterate against the SAME linearization/factorization, warm
            # started from the main QP's ADMM state shifted by the taken
            # step (alpha*d): x0 = (1-alpha)d, z0 = z - alpha*A d.
            # The residual at Z was already computed by the line search
            # (its accepted trial's evaluate) — reuse it (~8 ms/tick at
            # batch 512 on TPU).
            with jax.default_matmul_precision(cfg.admm.precision):
                g2 = g_new
                q2 = t.objective_gradient(Z, obj)
                Ad = _A_matvec(qp_work.A, qp_work.D, d, t.box_slots)
                d2, z_admm, y_admm = run_iters(
                    qp_work, q2, l_b - g2, u_b - g2, cfg.admm,
                    (1.0 - alpha) * d, z_admm - alpha * Ad, y_admm,
                    cfg.corrector_iters, box_idx=t.box_slots,
                )
            bad2 = jnp.any(jnp.isnan(d2))
            d2 = jnp.where(bad2, jnp.zeros_like(d2), d2)
            bad = bad | bad2  # a failed corrector QP must surface in status
            Z = Z + d2
            g3 = t.evaluate(Z, stage_params, shared)
            viol3 = jnp.maximum(0.0, l_b - g3) + jnp.maximum(0.0, g3 - u_b)
            max_viol = jnp.max(viol3)

        if cfg.eq_projection > 0:
            # Accurate-mode closer: Gauss-Newton projection onto the
            # equality manifold. Each pass RE-LINEARIZES at the current
            # iterate (fresh A — the rnea rows are nonlinear enough that a
            # stale-Jacobian projection stalls around 1e-2) and solves the
            # minimum-P-norm correction zeroing the equality rows. The
            # inequalities stay with the ADMM (strictly inactive in steady
            # gait).
            #
            # The iteration runs UNGUARDED and only the final result is
            # safeguarded (best-so-far): the first pass routinely
            # overshoots on rnea curvature (5.7e-3 -> 1.4e-2 measured on
            # B2G N=5) before the second pass lands at ~1e-4 — a per-pass
            # guard freezes the iterate and stalls the whole loop at the
            # ADMM floor. The passes run as a lax.scan so the (linearize +
            # factorize) body compiles once regardless of the pass count.
            with jax.default_matmul_precision("highest"):
                md = t.m_dense
                eq_rows = (u_b[:, :md] - l_b[:, :md]) < 1e-7

                def proj_body(carry, _):
                    Z, best_Z, best_viol = carry
                    g_now, Gf, Bf, Cf = t.linearize(Z, stage_params, shared)
                    row_norm = jnp.maximum(
                        jnp.max(jnp.abs(Gf), axis=2),
                        jnp.maximum(jnp.max(jnp.abs(Bf), axis=2),
                                    jnp.max(jnp.abs(Cf), axis=2)),
                    )
                    W = (eq_rows & (row_norm > 1e-8)).astype(Z.dtype)
                    r = l_b[:, :md] - g_now[:, :md]
                    dlt = eq_project(Gf, Bf, Cf, P_diag, r, W,
                                     factorizer=cfg.admm.factorizer,
                                     base=cfg.admm.chol_base)
                    Z = Z + dlt
                    g_try = t.evaluate(Z, stage_params, shared)
                    viol_try = jnp.max(
                        jnp.maximum(0.0, l_b - g_try)
                        + jnp.maximum(0.0, g_try - u_b)
                    )
                    finite = jnp.isfinite(viol_try)
                    better = finite & (viol_try <= best_viol)
                    best_Z = jnp.where(better, Z, best_Z)
                    best_viol = jnp.where(better, viol_try, best_viol)
                    # a NaN step must not poison the next pass either
                    Z = jnp.where(finite, Z, best_Z)
                    return (Z, best_Z, best_viol), None

                (Z, best_Z, best_viol), _ = lax.scan(
                    proj_body, (Z, Z, max_viol), None,
                    length=cfg.eq_projection,
                )
                Z, max_viol = best_Z, best_viol

        # Solution status (the reference leaves this as a TODO, ocp.py:369):
        # 0 = ok, 1 = line search rejected every step, 2 = QP solve failed.
        status = jnp.where(
            bad, 2, jnp.where(alpha <= 0.0, 1, 0)
        ).astype(jnp.int32)
        stats = {
            "max_violation": max_viol,
            "objective": t.objective_value(Z, obj),
            "alpha": alpha,
            "status": status,
        }
        return SolverState(Z=Z, z_admm=z_admm, y_admm=y_admm), stats
