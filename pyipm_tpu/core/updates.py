"""Shared scalar update formulas of the interior-point iteration.

One implementation of the merit-penalty (nu) threshold and the adaptive
centrality-based barrier (mu) update, composed by BOTH the single-device
solver core (core/solver.py) and the sharded Schur path (parallel/schur.py)
— the latter feeds psum-reduced inputs, so the formulas themselves stay
device-topology-agnostic.
"""

from __future__ import annotations

import jax.numpy as jnp


def nu_threshold(barrier_dot, con_l1, rho, tiny):
    """Merit-penalty threshold (reference pyipm.py:1727-1735):

        nu_thr = (grad(phi_barrier) . dz) / ((1 - rho) * ||c||_1)

    ``barrier_dot`` is the barrier-objective gradient dotted with the
    primal(+slack) direction; ``con_l1`` the l1 constraint infeasibility.
    The tiny guard on the denominator avoids NaN poisoning when the
    iterate is feasible (the reference divides unguarded).  The caller
    takes ``max(nu, nu_thr)``."""
    return barrier_dot / ((1.0 - rho) * con_l1 + tiny)


def centrality_mu(sl, smin, ntot, eps, mu_floor, dtype):
    """Adaptive Fiacco-McCormick/centrality barrier update (reference
    pyipm.py:1804-1814):

        xi = N * min(s o lambda_i) / (s . lambda_i)
        mu = 0.1 * min(0.05 (1 - xi)/xi, 2)^3 * (s . lambda_i) / N

    Inputs are the (possibly psum-reduced) scalars: ``sl`` = s . lambda_i,
    ``smin`` = min(s o lambda_i), ``ntot`` = number of inequality
    constraints.  Floored at ``mu_floor`` instead of the reference's 0
    (see IPMConfig.mu_floor: a 0 floor drives active slacks below float32
    resolution)."""
    xi = ntot * smin / (sl + eps)
    mu_new = (0.1 * jnp.minimum(0.05 * (1.0 - xi) / (xi + eps), 2.0) ** 3
              * sl / ntot)
    return jnp.maximum(mu_new, jnp.asarray(mu_floor, dtype))
