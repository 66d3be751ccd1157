"""Microbenchmark of the block-tridiagonal factorize/solve pieces on TPU.

The tick profile (tools/profile_tick.py) shows the ADMM's standalone cost
is dominated by a large fixed intercept (~150 ms at batch 512, N=14,
s=105) rather than the per-iteration sweeps (~6.7 ms). This isolates the
suspects with synthetic SPD data — no MPC program, so compiles are
seconds, not minutes:

  - jnp.linalg.cholesky on (B, s, s)
  - solve_triangular base case of tri_inverse_lower
  - tri_inverse_lower as a whole
  - factorize (scan over nodes)
  - solve_factorized (the per-iteration solve)

Env: MB_BATCH, MB_NODES, MB_S.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from tpu_locoman.solver.qp import (
    factorize,
    solve_factorized,
    tri_inverse_lower,
)


def timeit(fn, *args, iters=20, label=""):
    tc = time.time()
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    compile_s = time.time() - tc
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / iters
    print(f"{label:22s} {1000 * dt:8.2f} ms   (compile {compile_s:5.1f} s)")
    return dt


def main():
    B = int(os.environ.get("MB_BATCH", "512"))
    N = int(os.environ.get("MB_NODES", "14"))
    s = int(os.environ.get("MB_S", "105"))
    rng = np.random.default_rng(0)

    # Synthetic SPD tridiagonal blocks in the flagship's regime.
    A = rng.normal(size=(B, N + 1, s, s)).astype(np.float32)
    H = np.einsum("bnij,bnkj->bnik", A, A) / s + 3.0 * np.eye(
        s, dtype=np.float32
    )
    U = 0.1 * rng.normal(size=(B, N, s, s)).astype(np.float32)
    b = rng.normal(size=(B, N + 1, s)).astype(np.float32)
    H = jnp.asarray(H)
    U = jnp.asarray(U)
    b = jnp.asarray(b)
    L0 = jnp.asarray(np.linalg.cholesky(np.asarray(H[:, 0])))

    print(f"batch={B} nodes={N} s={s}")

    chol_b = jax.jit(lambda X: jnp.linalg.cholesky(X))
    timeit(chol_b, H[:, 0], label="cholesky (B,s,s)")

    chol_all = jax.jit(
        lambda X: jnp.linalg.cholesky(X.reshape(-1, s, s))
    )
    timeit(chol_all, H, label="cholesky (B*(N+1))")

    trinv_b = jax.jit(jax.vmap(tri_inverse_lower))
    timeit(trinv_b, L0, label="tri_inverse (B,s,s)")

    tri_solve_b = jax.jit(
        lambda L: jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(jnp.eye(s, dtype=L.dtype), L.shape),
            lower=True,
        )
    )
    timeit(tri_solve_b, L0, label="trsm full (B,s,s)")

    fac_b = jax.jit(jax.vmap(factorize))
    fac = timeit(fac_b, H, U, label="factorize(blocked)")

    # Round-3: the While-loop-free cholinv path at several recursion bases
    # (dispatch-count/fusion tradeoff), plus the Pallas VMEM kernel.
    import functools

    for bs in (16, 28, 56):
        f = jax.jit(jax.vmap(functools.partial(
            factorize, chol_impl="cholinv", base=bs)))
        timeit(f, H, U, label=f"factorize(cholinv{bs})")

    for bs in (16, 28):
        f = jax.jit(jax.vmap(functools.partial(
            factorize, chol_impl="cholinv_pb", base=bs)))
        timeit(f, H, U, label=f"factorize(cholinv_pb{bs})")

    if jax.default_backend() == "tpu":
        from tpu_locoman.solver.pallas_fac import factorize_pallas

        fp = jax.jit(jax.vmap(factorize_pallas))
        timeit(fp, H, U, label="factorize(pallas)")

    fac0 = fac_b(H, U)
    solve_b = jax.jit(jax.vmap(solve_factorized))
    timeit(solve_b, fac0, b, label="solve_factorized")


if __name__ == "__main__":
    main()
