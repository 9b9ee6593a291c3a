"""Shape sweep: Pallas lane-batched LDL^T kernels vs unrolled-XLA forms.

Decides the batched small-system dispatch (ops/pallas_ldlt.py) with data:
for each (B, n) on the grid, times factor+solve through

  - the Pallas lane-batched kernels (batched_ldlt_factor/_solve), and
  - the statically-unrolled XLA factorization + log-depth-inverse solve
    (ops/linalg.ldlt_factor_unrolled / ldlt_solve_inv — the solver's
    current default on all backends),

and prints one JSON line per cell plus a winner table.  Run on TPU:

    python benchmarks/bench_lane_kernels.py [--reps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bs", type=int, nargs="*",
                    default=[128, 512, 2048, 8192])
    ap.add_argument("--ns", type=int, nargs="*", default=[8, 16, 32, 64])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pyipm_tpu.ops import linalg as L
    from pyipm_tpu.ops.pallas_ldlt import (
        batched_ldlt_factor, batched_ldlt_solve,
    )

    def make_ops(n):
        def xla_fs(A, b):
            Lf, d = L.ldlt_factor_unrolled(A)
            return L.ldlt_solve_inv(Lf, d, b)

        def lane_fs(A, b):
            Lf, d = batched_ldlt_factor(A)
            return batched_ldlt_solve(Lf, d, b)

        return {"xla_unrolled": jax.jit(xla_fs), "pallas_lane": jax.jit(lane_fs)}

    def timed(fn, A, b, reps):
        # scalar fetch as barrier; best-of-3 medians of rep batches
        out = fn(A, b)
        float(jnp.sum(out))             # warm + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(A, b)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    results = {}
    for n in args.ns:
        ops = make_ops(n)
        for B in args.bs:
            key = jax.random.key(B * 1000 + n)
            kg, kb = jax.random.split(key)
            G = jax.random.normal(kg, (B, n, n), jnp.float32)
            A = jnp.einsum("bij,bkj->bik", G, G) / n \
                + jnp.eye(n, dtype=jnp.float32)[None]
            b = jax.random.normal(kb, (B, n), jnp.float32)
            row = {}
            for name, fn in ops.items():
                # correctness guard before timing
                x = fn(A, b)
                resid = float(jnp.max(jnp.linalg.norm(
                    jnp.einsum("bij,bj->bi", A, x) - b, axis=-1)))
                row[name] = {"ms": round(timed(fn, A, b, args.reps) * 1e3, 4),
                             "max_resid": resid}
            winner = min(row, key=lambda k: row[k]["ms"])
            results[(B, n)] = (row, winner)
            print(json.dumps({"B": B, "n": n, **{k: v["ms"] for k, v in
                                                 row.items()},
                              "winner": winner,
                              "backend": jax.default_backend()}))

    print("\nwinner table (rows B, cols n):")
    header = "B\\n   " + "".join(f"{n:>14}" for n in args.ns)
    print(header)
    for B in args.bs:
        cells = "".join(f"{results[(B, n)][1]:>14}" for n in args.ns)
        print(f"{B:<6}{cells}")


if __name__ == "__main__":
    main()
