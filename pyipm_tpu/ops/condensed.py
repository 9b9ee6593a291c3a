"""Condensed KKT direction: exact elimination of the slack/ineq-multiplier
blocks before factorization.

The reference factors the full (D+2N+M)^2 primal-dual matrix every
iteration (reference pyipm.py:816-844, 1717-1721).  The slack rows are
trivially eliminable: with Sigma = diag(lda_i/(s+guard)), the Newton system

    [ W    0    Je   Ji ] [dx ]   [g1]
    [ 0   Sig   0    -I ] [ds ]   [g2]
    [ Je'  0    0     0 ] [da ] = [g3]
    [ Ji' -I    0     0 ] [db ]   [g4]

reduces EXACTLY (no inverse of Sigma required) to the (D+M)^2 system

    [ W + Ji Sig Ji' + delta*I   Je ] [dx]   [g1 + Ji (Sig g4 + g2)]
    [ Je'                         0 ] [da] = [g3]

with  ds = Ji' dx - g4  and  db = Sig ds - g2  recovered elementwise.
The eliminated 2x2 block contributes exactly N positive and N negative
eigenvalues, so the reference's inertia condition (M+N negatives on the
full matrix, pyipm.py:1381) becomes M negatives on the condensed matrix —
same delta-escalation semantics, same eq-block regularization, SAME Newton
step, at (D+M)^3/(D+2N+M)^3 of the factorization cost (166x for the
benchmark QP family), with the Ji Sig Ji' formation an MXU matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from pyipm_tpu.core import kkt as K
from pyipm_tpu.core.problem import Problem
from pyipm_tpu.ops.linalg import reg_solve_kkt


def condensed_direction(problem: Problem, cfg, x, s, lda, mu, delta):
    """Solve the full KKT Newton system via condensation.

    Returns (dz, delta_new, retries) with dz in the FULL composite layout
    [dx; ds; da; db] (so the surrounding solver logic — multiplier sign
    flip, fraction-to-boundary, line search — is untouched).
    """
    D, M, N = problem.nvar, problem.neq, problem.nineq
    dtype = x.dtype
    guard = jnp.sqrt(jnp.finfo(dtype).tiny)

    g = -K.grad(problem, x, s, lda, mu)
    g1 = g[:D]
    g2 = g[D:D + N]
    g3 = g[D + N:D + N + M]
    g4 = g[D + N + M:]

    d2L = problem.hess_lagrangian(x, lda)
    # same upper-triangle mirror as the full assembly (pyipm.py:843-844)
    W = jnp.triu(d2L) + jnp.triu(d2L, 1).T

    if N:
        Ji = problem.jac_ci(x)                       # (D, N)
        sig = lda[M:] / (s + guard)
        A = W + (Ji * sig[None, :]) @ Ji.T
        rhs1 = g1 + Ji @ (sig * g4 + g2)
    else:
        Ji = jnp.zeros((D, 0), dtype)
        sig = jnp.zeros((0,), dtype)
        A = W
        rhs1 = g1

    if M:
        Je = problem.jac_ce(x)                       # (D, M)
        Kc = jnp.zeros((D + M, D + M), dtype)
        Kc = Kc.at[:D, :D].set(A)
        Kc = Kc.at[:D, D:].set(Je)
        Kc = Kc.at[D:, :D].set(Je.T)
        rhs = jnp.concatenate([rhs1, g3])
    else:
        Kc = A
        rhs = rhs1

    # symmetrize exactly (A is symmetric analytically; enforce bitwise)
    Kc = (Kc + Kc.T) * jnp.asarray(0.5, dtype)

    dxa, delta_new, retries, apply_factors, applied = reg_solve_kkt(
        Kc, rhs, delta, mu,
        nvar=D, neq=M, nineq=0, eps=cfg.eps, reg_coef=cfg.reg_coef,
        eta=cfg.eta, beta=cfg.beta, delta0=cfg.delta0,
        max_retries=cfg.max_reg_retries, method="ldlt",
        block=cfg.ldlt_block, want_solver=True,
    )
    delta_applied, eq_applied = applied

    if M:
        Je = problem.jac_ce(x)
    else:
        Je = jnp.zeros((D, 0), dtype)

    def recover(dxa_):
        dx = dxa_[:D]
        da = dxa_[D:]
        ds = Ji.T @ dx - g4 if N else jnp.zeros((0,), dtype)
        db = sig * ds - g2 if N else jnp.zeros((0,), dtype)
        return dx, ds, da, db

    def full_residual(dx, ds, da, db):
        """Residual of the REGULARIZED (D+2N+M) Newton system via block
        matvecs — no materialized full matrix.  Refining against the full
        system matters in float32: forming Ji Sig Ji' loses digits before
        the factorization, and condensed-only refinement cannot see that
        error, costing extra outer iterations.  The applied delta/eq-reg
        shifts MUST be included: the algorithm's direction is defined by
        the shifted system (reference pyipm.py:1718-1721), and refining
        against the unshifted one would pull dz toward the wrong-inertia
        solution."""
        r1 = g1 - (W @ dx + delta_applied * dx + Je @ da + Ji @ db)
        r2 = g2 - (sig * ds - db) if N else g2
        r3 = g3 - (Je.T @ dx - eq_applied * da) if M else g3
        r4 = g4 - (Ji.T @ dx - ds) if N else g4
        return r1, r2, r3, r4

    def condensed_apply(r1, r2, r3, r4):
        """One condensed solve of the residual system against the CACHED
        factors (no refactorization)."""
        rr1 = r1 + (Ji @ (sig * r4 + r2) if N else 0.0)
        rr = jnp.concatenate([rr1, r3]) if M else rr1
        sol = apply_factors(rr)
        ex = sol[:D]
        ea = sol[D:]
        es = Ji.T @ ex - r4 if N else jnp.zeros((0,), dtype)
        eb = sig * es - r2 if N else jnp.zeros((0,), dtype)
        return ex, es, ea, eb

    dx, ds, da, db = recover(dxa)
    # full-system refinement steps, each kept only if it reduces the
    # residual (cheap: block matvecs + cached triangular solves)
    for _ in range(2):
        r = full_residual(dx, ds, da, db)
        rn0 = sum(jnp.sum(ri ** 2) for ri in r)
        ex, es, ea, eb = condensed_apply(*r)
        dx2, ds2, da2, db2 = dx + ex, ds + es, da + ea, db + eb
        r2_ = full_residual(dx2, ds2, da2, db2)
        rn1 = sum(jnp.sum(ri ** 2) for ri in r2_)
        better = rn1 < rn0
        dx = jnp.where(better, dx2, dx)
        ds = jnp.where(better, ds2, ds)
        da = jnp.where(better, da2, da)
        db = jnp.where(better, db2, db)

    dz = jnp.concatenate([dx, ds, da, db])
    return dz, delta_new, retries
