"""Where does assemble's ~13 ms go? Times the AtA einsum at the flagship
shape under each matmul precision, plus the H-diagonal construction.

WARNING (round-5 lesson, CLAUDE.md): standalone jits measured over the
axon tunnel produced numbers ~1000x off (2 s for a 13 ms op) — only
in-context prefix deltas (tools/profile_qp.py) are trustworthy there.
Kept for local-CPU relative comparisons only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = fn_j(*args)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {1000 * dt:7.2f} ms", flush=True)


def main():
    B, N, m, s, k = 512, 14, 110, 105, 48
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((B, N, m, s)).astype(np.float32))
    rho = jnp.asarray(
        np.abs(rng.standard_normal((B, N, m)).astype(np.float32)) + 0.1)
    diag = jnp.asarray(
        np.abs(rng.standard_normal((B, N + 1, s)).astype(np.float32)) + 0.5)

    for prec in ("highest", "high", "default"):
        def ata(A, rho):
            with jax.default_matmul_precision(prec):
                rA = rho[..., None] * A
                return jnp.einsum("bnms,bnmt->bnst", rA, A)
        timeit(f"AtA einsum precision={prec}", ata, A, rho)

    def h_build(A, rho, diag):
        with jax.default_matmul_precision("highest"):
            rA = rho[..., None] * A
            AtA = jnp.einsum("bnms,bnmt->bnst", rA, A)
            H = jnp.concatenate(
                [AtA, jnp.zeros((B, 1, s, s), dtype=A.dtype)], axis=1)
            idx = jnp.arange(s)
            H = H.at[:, :, idx, idx].add(diag)
            U = jnp.swapaxes(rA[:, :, :k, :], 2, 3)
            return H, U
    timeit("full H+U build (highest)", h_build, A, rho, diag)

    def h_build_old(A, rho, diag):
        with jax.default_matmul_precision("highest"):
            rA = rho[..., None] * A
            AtA = jnp.einsum("bnms,bnmt->bnst", rA, A)
            H = jnp.zeros((B, N + 1, s, s), dtype=A.dtype)
            H = H.at[:, :N].add(AtA)
            H = H + jax.vmap(jax.vmap(jnp.diag))(diag)
            U = jnp.zeros((B, N, s, s), dtype=A.dtype)
            U = U.at[:, :, :, :k].set(jnp.swapaxes(rA[:, :, :k, :], 2, 3))
            return H, U
    timeit("full H+U build (old 3-add layout)", h_build_old, A, rho, diag)


if __name__ == "__main__":
    main()
