"""KKT factorize+solve throughput (BASELINE.md config 4).

Times the inertia-corrected factor+solve (``reg_solve_kkt``) on a
KKT-structured matrix of the n=4096, 256-equality-constraint dense NLP —
the hot path the reference delegates to LAPACK — and reports GFLOP/s
against the LDL^T flop count K^3/3.

    python benchmarks/bench_kkt.py [--n 4096] [--m 256] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pyipm_tpu.config import IPMConfig

    D, M = args.n, args.m
    K = D + M
    cfg = IPMConfig(float_dtype="float32", ldlt_block=args.block)

    key = jax.random.key(0)
    kg, kj, kr = jax.random.split(key, 3)
    G = jax.random.normal(kg, (D, D), jnp.float32) / jnp.sqrt(D)
    W = G @ G.T + 0.5 * jnp.eye(D, dtype=jnp.float32)     # PD primal block
    Je = jax.random.normal(kj, (D, M), jnp.float32) / jnp.sqrt(D)
    H = jnp.zeros((K, K), jnp.float32)
    H = H.at[:D, :D].set(W).at[:D, D:].set(Je).at[D:, :D].set(Je.T)
    g = jax.random.normal(kr, (K,), jnp.float32)

    from pyipm_tpu.ops.linalg import reg_solve_kkt

    @jax.jit
    def run(H, g):
        with jax.default_matmul_precision("highest"):
            return reg_solve_kkt(
                H, g, jnp.zeros(()), jnp.asarray(0.1),
                nvar=D, neq=M, nineq=0, eps=cfg.eps,
                reg_coef=cfg.reg_coef, eta=cfg.eta, beta=cfg.beta,
                delta0=cfg.delta0, max_retries=4, method="ldlt",
                block=args.block)

    dz, _, _ = jax.block_until_ready(run(H, g))
    t0 = time.perf_counter()
    for r in range(args.reps):
        dz, _, _ = jax.block_until_ready(run(H + 1e-6 * r, g))
    dt = (time.perf_counter() - t0) / args.reps

    flops = K ** 3 / 3 * 2          # LDL^T multiply-adds
    resid = float(jnp.linalg.norm(H @ dz - g) / jnp.linalg.norm(g))
    print(json.dumps({
        "metric": "kkt_factor_solve_gflops",
        "value": round(flops / dt / 1e9, 1),
        "unit": "GFLOP/s",
        "vs_baseline": None,
        "K": K, "wall_s": round(dt, 4),
        "rel_residual": resid,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
