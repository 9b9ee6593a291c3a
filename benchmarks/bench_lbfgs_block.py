"""Distributed per-block L-BFGS at LARGE d — past the dense boundary.

The d-sweep (results/r04/schur_dsweep.json) shows dense per-block
factorization degrading beyond d ~ 1024-2048; this bench solves a
block-separable NLP whose blocks are so large (d = 65,536 per block —
the dense (d)^3/3 factorization would be ~9e13 MACs PER BLOCK PER
ITERATION) that only the per-block compact L-BFGS mode (cfg.lbfgs > 0,
parallel/schur.py) is viable: separable convex objective, box bounds
through the ci_identity diagonal fast path, linear coupling through the
bordered Schur complement.

    python benchmarks/bench_lbfgs_block.py [--blocks 8] [--d 65536]
        [--out results/r04/schur_lbfgs_largeblock.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--d", type=int, default=65536)
    ap.add_argument("--mc", type=int, default=4)
    ap.add_argument("--lbfgs", type=int, default=8)
    ap.add_argument("--niter", type=int, default=20)
    ap.add_argument("--miter", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyipm_tpu.config import IPMConfig
    from pyipm_tpu.parallel.schur import BlockNLP, box_ci, make_block_solver

    K, d, mc, p = args.blocks, args.d, args.mc, args.mc
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("model",))

    # diagonal-quadratic blocks (no dense d^2 data), box bounds, linear
    # coupling over p pooled features
    kq, kc, ka, kx = jax.random.split(jax.random.key(5), 4)
    q = 0.5 + jax.random.uniform(kq, (K, d), jnp.float32)
    c = jax.random.normal(kc, (K, d), jnp.float32)
    A = jax.random.normal(ka, (K, p, d), jnp.float32) / np.sqrt(K * d)
    lb = jnp.full((K, d), -3.0, jnp.float32)
    xfeas = jax.random.normal(kx, (K, d), jnp.float32) * 0.1
    b = jnp.einsum("kpd,kd->p", A, xfeas)
    theta = {"q": q, "c": c, "A": A, "lb": lb}

    def f_blk(xk, th):
        return 0.5 * xk @ (th["q"] * xk) + th["c"] @ xk

    def g_blk(xk, th):
        return th["A"] @ xk

    spec = BlockNLP(f_blk=f_blk, d=d, ci_blk=box_ci("lb"), ni=d,
                    ci_identity=True, g_blk=g_blk,
                    cc=lambda u, ccd: u - ccd["b"], p=p, mc=mc)
    cfg = IPMConfig(float_dtype="float32", verbosity=0, lbfgs=args.lbfgs,
                    niter=args.niter, miter=args.miter)
    fn = make_block_solver(spec, mesh, cfg)
    x0 = jnp.zeros((K, d), jnp.float32)
    ccdata = {"b": b}

    t0 = time.perf_counter()
    res = fn(x0, theta, ccdata=ccdata)
    _ = float(res.fval)                 # scalar fetch = barrier
    compile_wall = time.perf_counter() - t0
    walls = []
    for i in range(3):
        x0i = x0 + jnp.asarray(1e-6 * (i + 1), jnp.float32)
        t0 = time.perf_counter()
        res = fn(x0i, theta, ccdata=ccdata)
        _ = float(res.fval)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))
    assert wall > 0.01, wall

    kkt = np.asarray(res.kkt)
    out = {
        "metric": "schur_lbfgs_largeblock",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": None,
        "nvars": K * d, "blocks": K, "d": d, "mc": mc,
        "lbfgs_mem": args.lbfgs,
        "iters": int(res.iter_count), "signal": int(res.signal),
        "kkt": [float(v) for v in kkt],
        "converged": bool(np.all(kkt <= cfg.Ktol * 10)),
        "compile_wall_s": round(compile_wall - wall, 3),
        "iters_per_s": round(int(res.iter_count) / wall, 3),
        "dense_equivalent_macs_per_iter": K * d ** 3 / 3,
        "backend": jax.default_backend(),
        "note": ("dense per-block factorization at this d would cost "
                 "~{:.1e} MACs/iteration; the compact-memory Woodbury "
                 "direction makes the solve interactive".format(
                     K * d ** 3 / 3)),
    }
    print(json.dumps(out))
    if args.out:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            args.out)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
