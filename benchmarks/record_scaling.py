"""Assemble the round's scaling artifact (SCALING_r{N}.json at the repo
root) from the individual bench results (VERDICT r2 #3 / BASELINE.md
weak-scaling row):

  - DP weak scaling (bench_scaling.py, virtual CPU mesh — advisory),
  - Schur weak scaling (bench_schur_scaling.py --mode weak, advisory),
  - the 1M-variable block-separable solve on the real chip
    (bench_schur_scaling.py --mode million),
  - an analytic ICI roofline argument for the >=90% target on real
    multi-chip hardware (the virtual mesh cannot certify it: all virtual
    devices share one host's cores).

    python benchmarks/record_scaling.py --round 3
"""

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def _load(path):
    p = os.path.join(HERE, path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def ici_roofline(million, census):
    """Analytic weak-scaling prediction for the Schur path on a real TPU
    mesh, with BOTH cost terms the r3 roofline lacked: per iteration a
    device pays (a) the border psum PAYLOAD over ~45 GB/s ICI links and
    (b) N small-collective LATENCIES, where N is the measured static
    all-reduce count per compiled iteration
    (benchmarks/collective_census.py — the r3 roofline counted only the
    1,152-byte payload and so wrongly predicted ~100% for every config).
    Collective latency for a sub-KB all-reduce on an ICI ring is assumed
    ~5 us (order-of-magnitude; it is the COUNT x latency product that
    dominates payload by >100x at these sizes)."""
    if million is None:
        return None
    d = million["d"]
    mc = million["mc"]
    blocks = million["blocks"]
    # measured per-device compute time per iteration (real chip)
    comp_s = million["value"] / max(million["iters"], 1)
    payload = (mc * mc + 2 * mc + 64) * 4 * 2
    ici_bps = 45e9
    lat_s = 5e-6
    rows = (census or {}).get("rows", [])

    def n_coll(name, default):
        for r in rows:
            if r["config"] == name:
                return r["lowered_total"]
        return default

    # the d16 predictions key on the d16 CONFIG'S OWN census row (the r4
    # roofline used the general-coupled row, overstating the d16 count)
    n_default = n_coll("weakscale_like_d16_linear_cc", 29)
    n_lean = n_coll("weakscale_d16_refine0", 19)
    n_general = n_coll("general_coupled_adaptive", 29)

    def eff(comp, n):
        comm = n * lat_s + payload / ici_bps
        return comp / (comp + comm)

    # the committed d=16 weak-scaling config runs ~1 ms steps: it is
    # collective-LATENCY bound and does NOT clear the 90% bar at the
    # default refinement setting; the large-compute configs clear it
    # with two orders of magnitude of headroom.
    d16_comp = 1e-3
    return {
        "per_iter_compute_s_million_cfg": round(comp_s, 6),
        "per_iter_border_bytes": payload,
        "assumed_ici_bytes_per_s": ici_bps,
        "assumed_small_collective_latency_s": lat_s,
        "collectives_per_iter_d16_default": n_default,
        "collectives_per_iter_refine0": n_lean,
        "collectives_per_iter_general_adaptive": n_general,
        "predicted_efficiency_million_cfg": round(
            eff(comp_s, n_general), 6),
        "predicted_efficiency_d16_default": round(
            eff(d16_comp, n_default), 4),
        "predicted_efficiency_d16_refine0": round(
            eff(d16_comp, n_lean), 4),
        "compute_floor_for_90pct_default_s": round(
            9 * n_default * lat_s, 6),
        "note": (f"count x latency dominates: a config clears 90% only "
                 f"when its per-iteration compute exceeds ~9*N*latency "
                 f"({9 * n_default * lat_s * 1e3:.2f} ms at "
                 f"N={n_default}).  The r5 collective surgery (carried-"
                 f"residual refinement riding the border psum, linear-"
                 f"coupling fusion, mega-packed post-direction phase) "
                 f"cut the d=16 config from 29 to {n_default} all-"
                 f"reduces/iter WITH guarded 2-step refinement kept: "
                 f"~1 ms steps now predict {eff(d16_comp, n_default):.3f}"
                 f" at defaults (r4: 0.87), {eff(d16_comp, n_lean):.3f} "
                 f"at schur_refine_steps=0, and the 1M-variable config "
                 f"({comp_s * 1e3:.0f} ms/iter compute) is predicted "
                 f">0.999 regardless"),
        "blocks": blocks, "d": d, "mc": mc,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    args = ap.parse_args()
    r = f"r{args.round:02d}"

    dp = _load(f"results/{r}/dp_weak_scaling.json")
    schur = _load(f"results/{r}/schur_weak_scaling.json")
    million = _load(f"results/{r}/schur_million_var.json")
    largeblock = _load(f"results/{r}/schur_largeblock_262k.json")
    census = _load(f"results/{r}/collective_census.json")
    dsweep = _load(f"results/{r}/schur_dsweep.json")
    lbfgs_big = _load(f"results/{r}/schur_lbfgs_largeblock.json")

    out = {
        "round": args.round,
        "dp_weak_scaling": dp,
        "schur_weak_scaling": schur,
        "million_var_solve": million,
        "largeblock_d1024_solve": largeblock,
        "dense_d_boundary_sweep": dsweep,
        "lbfgs_largeblock_d65536": lbfgs_big,
        "ici_roofline": ici_roofline(million, census),
        "collective_census": census,
        "caveat": ("real multi-chip hardware is unavailable in this "
                   "environment; virtual-CPU-mesh timings validate the "
                   "sharding/collective STRUCTURE only (all virtual "
                   "devices share one host's cores, so measured "
                   "'efficiency' there reflects host-core contention, "
                   "not ICI behavior).  The single-chip million-variable "
                   "run plus the border-payload roofline are the "
                   "achievable proxies for the >=90% target."),
    }
    path = os.path.join(ROOT, f"SCALING_{r}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    print(json.dumps({"metric": "scaling_artifact", "round": args.round,
                      "million_converged": (million or {}).get("converged"),
                      "schur_weak_structure_ok": schur is not None}))


if __name__ == "__main__":
    main()
