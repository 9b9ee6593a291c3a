"""Fraction-to-the-boundary stepping and the merit line search.

The reference implements fraction-to-the-boundary as a host-side
golden-section search (reference pyipm.py:1408-1436) and the merit line
search as Python control flow with try/except solves (pyipm.py:1438-1565).
Both are host-loop artifacts, not algorithmic requirements:

  - the fraction-to-the-boundary rule has a closed form (a masked min
    reduction), exact instead of golden-section-approximate;
  - the backtracking search becomes a bounded ``lax.while_loop`` with the
    abort signal carried in the loop state;
  - the second-order correction's try-square-solve/except-lstsq is replaced
    by an unconditional minimum-norm least squares (which is what the
    reference actually computes: its eq-only square solve always throws due
    to the reshape bug at pyipm.py:1525 and silently falls back to lstsq).

Everything here is jittable and vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pyipm_tpu.core import kkt as K
from pyipm_tpu.core.problem import Problem
from pyipm_tpu.ops.linalg import lstsq_minnorm


def max_step_ftb(z, dz, tau):
    """Largest alpha in [0,1] with z + alpha*dz >= (1-tau)*z.

    Closed form of the reference's golden-section search
    (pyipm.py:1408-1436): alpha*dz_i >= -tau*z_i, binding only where
    dz_i < 0."""
    if z.shape[0] == 0:
        return jnp.ones((), dtype=z.dtype)
    tau_ = jnp.asarray(tau, z.dtype)
    neg = dz < 0
    denom = jnp.where(neg, -dz, jnp.ones((), z.dtype))
    ratio = jnp.where(neg, tau_ * z / denom, jnp.inf)
    return jnp.minimum(jnp.ones((), z.dtype), jnp.min(ratio))


class SearchResult(NamedTuple):
    x: jnp.ndarray
    s: jnp.ndarray
    lda: jnp.ndarray
    signal: jnp.ndarray      # -2 on unreliable direction, else unchanged
    alpha: jnp.ndarray       # accepted primal step length
    soc: jnp.ndarray         # bool: second-order correction accepted


def search(problem: Problem, cfg, x0, s0, lda0, dz, alpha_smax, alpha_lmax,
           mu, nu, signal):
    """Backtracking merit line search with second-order correction
    (reference IPM.search, pyipm.py:1438-1565).

    Returns updated (x, s, lda) and the (possibly -2) abort signal; on abort
    the original iterates are returned unchanged (pyipm.py:1502-1503).
    """
    D, M, N = problem.nvar, problem.neq, problem.nineq
    dtype = x0.dtype
    eps = jnp.asarray(cfg.eps, dtype)
    eta = jnp.asarray(cfg.eta, dtype)
    tau = jnp.asarray(cfg.tau, dtype)

    dx = dz[:D]
    ds = dz[D:D + N]
    dl = dz[D + N:]

    phi0 = K.phi(problem, x0, s0, mu, nu)
    dphi0 = K.dphi(problem, x0, s0, dz[:D + N], mu, nu)

    # Roundoff-aware Armijo slack: once the required decrease a*eta*dphi0
    # falls below the floating-point resolution of phi itself, the strict
    # test (reference pyipm.py:1462) compares pure noise and the search
    # aborts with signal=-2.  Accepting within ~10 ulps of phi0 is the
    # standard low-precision fix; at f64 the slack (~1e-14*|phi0|) is
    # far below Ktol-relevant scales and preserves reference behavior.
    slack = 10.0 * eps * (1.0 + jnp.abs(phi0))

    def armijo_rhs(a):
        return phi0 + a * eta * dphi0 + slack

    def phi_at(a_s):
        return K.phi(problem, x0 + a_s * dx, s0 + a_s * ds, mu, nu)

    def backtrack(a_s_in, a_l_in):
        """Shrink both step lengths by tau until Armijo passes or the step
        is unreliable to machine precision (pyipm.py:1490-1505).

        The reference walks the geometric trial sequence
        a_k = a_in * tau^(k+1) one test per host iteration; with the
        default tau = 0.995 that is hundreds-to-thousands of SEQUENTIAL
        merit evaluations, and under vmap every instance pays the batch
        maximum.  The schedule is closed-form, so the scan is vectorized:
        each loop step evaluates a CHUNK of trial step lengths at once
        (one vmapped merit evaluation — elementwise + matmul work the TPU
        eats for free) and takes the first index where the sequential
        walk would have stopped.  The accepted alpha is bit-identical to
        the one-at-a-time loop; only the schedule of evaluations changes.

        Sequential semantics being reproduced, per trial k:
          - Armijo pass at a_k  -> accept a_k;
          - Armijo fail and ||(a_k dx, a_k' ds)|| < eps -> abort
            (signal -2; the a_l pairing with ds reproduces the reference
            formula at pyipm.py:1496 verbatim);
          - else continue to k+1.
        """
        W = cfg.backtrack_chunk
        if N:
            base = jnp.sqrt(jnp.linalg.norm(a_s_in * dx) ** 2 +
                            jnp.linalg.norm(a_l_in * ds) ** 2)
        else:
            base = jnp.linalg.norm(a_s_in * dx)

        ks0 = jnp.arange(W, dtype=jnp.int32)

        def scan_chunk(c):
            ks = c * W + ks0
            shrink = jnp.power(tau, (ks + 1).astype(dtype))
            a_s_k = a_s_in * shrink
            a_l_k = a_l_in * shrink
            passes = jax.vmap(phi_at)(a_s_k) <= jax.vmap(armijo_rhs)(a_s_k)
            abort_k = shrink * base < eps       # step unreliable at trial k
            events = passes | abort_k
            idx = jnp.argmax(events)            # first event in the chunk
            found = jnp.any(events)
            return found, passes[idx], a_s_k[idx], a_l_k[idx]

        def cond_fn(c):
            i, found, _, _, _ = c
            return (~found) & (i * W < cfg.max_backtrack)

        def body_fn(c):
            i, _, _, _, _ = c
            found, passed, a_s, a_l = scan_chunk(i)
            return i + 1, found, passed, a_s, a_l

        _, found, passed, a_s, a_l = lax.while_loop(
            cond_fn, body_fn,
            (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
             jnp.zeros((), jnp.bool_), a_s_in * tau, a_l_in * tau))
        aborted = found & (~passed)
        return a_s, a_l, aborted

    false_ = jnp.zeros((), jnp.bool_)

    def try_soc(a_s):
        """Second-order feasibility correction (pyipm.py:1464-1489 for the
        inequality case, 1516-1536 for the equality-only case).

        Returns (accepted, dz_p, alpha_corr)."""
        xa = x0 + a_s * dx
        sa = s0 + a_s * ds
        c_old = K.con(problem, x0, s0)
        c_new = K.con(problem, xa, sa)
        infeas_up = jnp.sum(jnp.abs(c_new)) > jnp.sum(jnp.abs(c_old))

        def do_soc(_):
            A = K.jaco(problem, x0).T        # (M+N, D+N)
            dz_p = -lstsq_minnorm(A, c_new)  # (D+N,)
            rhs = armijo_rhs(a_s)
            ok1 = K.phi(problem, xa + dz_p[:D], sa + dz_p[D:], mu, nu) <= rhs
            if N:
                a_corr = max_step_ftb(s0, a_s * ds + dz_p[D:], tau)
                ok2 = K.phi(problem,
                            x0 + a_corr * (a_s * dx + dz_p[:D]),
                            s0 + a_corr * (a_s * ds + dz_p[D:]),
                            mu, nu) <= rhs
                accepted = ok1 & ok2
            else:
                a_corr = jnp.ones((), dtype)
                accepted = ok1
            return accepted, dz_p, a_corr

        def no_soc(_):
            return false_, jnp.zeros((D + N,), dtype), jnp.ones((), dtype)

        return lax.cond(infeas_up, do_soc, no_soc, None)

    # ------------------------------------------------------------------
    armijo_pass0 = phi_at(alpha_smax) <= armijo_rhs(alpha_smax)

    def accept_full(_):
        x = x0 + alpha_smax * dx
        s = s0 + alpha_smax * ds
        lda = lda0 + alpha_lmax * dl if problem.ncon else lda0
        return SearchResult(x, s, lda, signal, alpha_smax, false_)

    def on_fail(_):
        if problem.ncon:
            accepted, dz_p, a_corr = try_soc(alpha_smax)
        else:
            accepted = false_
            dz_p = jnp.zeros((D + N,), dtype)
            a_corr = jnp.ones((), dtype)

        def corrected(_):
            x = x0 + a_corr * (alpha_smax * dx + dz_p[:D])
            s = s0 + a_corr * (alpha_smax * ds + dz_p[D:])
            lda = lda0 + alpha_lmax * dl if problem.ncon else lda0
            return SearchResult(x, s, lda, signal, alpha_smax,
                                jnp.ones((), jnp.bool_))

        def backtracked(_):
            a_s, a_l, aborted = backtrack(alpha_smax, alpha_lmax)

            def aborted_fn(_):
                sig = jnp.asarray(-2, signal.dtype)
                return SearchResult(x0, s0, lda0, sig, jnp.zeros((), dtype),
                                    false_)

            def ok_fn(_):
                x = x0 + a_s * dx
                s = s0 + a_s * ds
                lda = lda0 + a_l * dl if problem.ncon else lda0
                return SearchResult(x, s, lda, signal, a_s, false_)

            return lax.cond(aborted, aborted_fn, ok_fn, None)

        return lax.cond(accepted, corrected, backtracked, None)

    return lax.cond(armijo_pass0, accept_full, on_fail, None)
