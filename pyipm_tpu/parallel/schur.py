"""Distributed interior-point solve for block-separable NLPs.

The model-parallel (TP-analog) layer the reference entirely lacks
(SURVEY.md §2, absence table): a single LARGE structured NLP

    min   sum_k f_k(x_k)                          x_k in R^d,  k = 1..K
    s.t.  sum_k A_k x_k = b        (mc coupling equality constraints)
          x_k >= lb_k              (optional per-block bounds)

is partitioned block-by-block across the ``model`` axis of a device mesh.
Per iteration the condensed primal-dual KKT system

    [ H_blk   A^T ] [dx ]   [ rhs ]        H_blk = blockdiag(H_k + Sigma_k)
    [  A       0  ] [dlc] = [ -rc ]

is solved with a **Schur complement over the coupling constraints**:
each device factors its local H_k (Cholesky with a diagonal-shift retry for
nonconvex f_k), forms A_k H_k^{-1} A_k^T, and the small (mc, mc) Schur
matrix is reduced with ``psum`` over the ICI mesh axis; the coupling step
dlc is solved replicated and back-substituted locally.  Slack/bound
multiplier steps are recovered elementwise.  All other solver logic —
fraction-to-the-boundary, l1-merit Armijo backtracking, nu/mu updates, KKT
convergence — follows the reference algorithm (pyipm.py:1567-1814) with
every global scalar reduced via ``psum``.

Everything runs inside one ``shard_map`` over the mesh; control flow is
replicated (all devices see identical psum-reduced scalars), so the whole
solve is a single compiled SPMD program with XLA collectives on the ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from pyipm_tpu.config import IPMConfig


@dataclasses.dataclass(frozen=True, eq=False)
class SeparableNLP:
    """Static description of a block-separable NLP."""
    f_blk: Callable          # (x_k (d,), theta_k) -> scalar
    d: int                   # per-block variable count
    mc: int                  # coupling equality constraints
    has_box: bool = True     # x_k >= lb_k bounds


class SeparableData(NamedTuple):
    """Per-instance data; leading axis K = number of blocks (sharded over
    the ``model`` mesh axis)."""
    theta: jnp.ndarray       # (K, ...) per-block objective params
    A: jnp.ndarray           # (K, mc, d) coupling Jacobian blocks
    b: jnp.ndarray           # (mc,) coupling rhs (replicated)
    lb: jnp.ndarray          # (K, d) lower bounds


class SeparableResult(NamedTuple):
    x: jnp.ndarray           # (K, d)
    s: jnp.ndarray           # (K, d) slacks (zeros if no box)
    z: jnp.ndarray           # (K, d) bound multipliers
    lc: jnp.ndarray          # (mc,) coupling multipliers
    fval: jnp.ndarray
    kkt: jnp.ndarray         # (4,) global KKT norms
    signal: jnp.ndarray
    iter_count: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray


def _psum(v, axis):
    return lax.psum(v, axis_name=axis)


def make_separable_solver(spec: SeparableNLP, mesh,
                          config: Optional[IPMConfig] = None,
                          axis: str = "model"):
    """Build the sharded solve function.

    Returns ``fn(x0 (K, d), data: SeparableData) -> SeparableResult`` jitted
    over ``mesh`` with block-sharded inputs/outputs and replicated coupling
    state.  K must be divisible by the mesh's ``axis`` size.
    """
    cfg = config if config is not None else IPMConfig(float_dtype="float32")
    dtype = cfg.np_dtype
    d, mc = spec.d, spec.mc
    eps = float(np.finfo(dtype).eps)
    tiny = float(np.finfo(dtype).tiny)
    guard = float(np.sqrt(np.finfo(dtype).tiny))  # see core.kkt._eps_of
    box = spec.has_box

    grad_f = jax.vmap(jax.grad(spec.f_blk))          # (Kl,d),(Kl,...)->(Kl,d)
    hess_f = jax.vmap(jax.hessian(spec.f_blk))       # -> (Kl,d,d)
    fsum_l = jax.vmap(spec.f_blk)                    # -> (Kl,)

    # ------------------------------------------------------------------
    # pieces, all on LOCAL slabs (Kl, ...) with psum for global scalars
    def fval(x, th, ax):
        return _psum(jnp.sum(fsum_l(x, th)), ax)

    def ce_res(x, A, b, ax):
        """sum_k A_k x_k - b, replicated (mc,)."""
        return _psum(jnp.einsum("kcd,kd->c", A, x), ax) - b

    def grad_blocks(x, s, z, lc, th, data, mu, ax):
        """Residual blocks: r_x (Kl,d), r_s (Kl,d), r_ce (mc,), r_ci (Kl,d).
        Layout follows the reference composite gradient (pyipm.py:609-668)
        with dci = I for bound constraints."""
        rx = grad_f(x, th) - jnp.einsum("kcd,c->kd", data.A, lc)
        if box:
            rx = rx - z
            rs = z - mu / (s + guard)
            rci = x - data.lb - s
        else:
            rs = jnp.zeros_like(x)
            rci = jnp.zeros_like(x)
        rce = ce_res(x, data.A, data.b, ax)
        return rx, rs, rce, rci

    def kkt_norms(x, s, z, lc, th, data, mu, ax):
        rx, rs, rce, rci = grad_blocks(x, s, z, lc, th, data, mu, ax)
        n1 = jnp.sqrt(_psum(jnp.sum(rx ** 2), ax))
        n2 = jnp.sqrt(_psum(jnp.sum((rs * s) ** 2), ax)) if box \
            else jnp.zeros((), dtype)
        n3 = jnp.linalg.norm(rce)
        n4 = jnp.sqrt(_psum(jnp.sum(rci ** 2), ax)) if box \
            else jnp.zeros((), dtype)
        return jnp.stack([n1, n2, n3, n4])

    def phi(x, s, th, data, mu, nu, ax):
        """l1 merit (reference pyipm.py:670-694), globally reduced."""
        val = fval(x, th, ax)
        val = val + nu * jnp.sum(jnp.abs(ce_res(x, data.A, data.b, ax)))
        if box:
            val = val + nu * _psum(jnp.sum(jnp.abs(x - data.lb - s)), ax)
            val = val - mu * _psum(jnp.sum(jnp.log(s)), ax)
        return val

    # ------------------------------------------------------------------
    def chol_with_shift(H):
        """Per-block Cholesky with diagonal-shift retry (the Schur-path
        analog of reghess, reference pyipm.py:1373-1406): H_k + delta I
        must be PD; escalate delta*10 on breakdown (NaN in the factor)."""
        eye = jnp.eye(d, dtype=dtype)

        def factor(delta):
            L = jnp.linalg.cholesky(H + delta * eye)
            ok = jnp.all(jnp.isfinite(L))
            return L, ok

        L0, ok0 = factor(jnp.zeros((), dtype))

        def cond_fn(c):
            delta, L, ok, t = c
            return (~ok) & (t < cfg.max_reg_retries)

        def body_fn(c):
            delta, L, ok, t = c
            delta = jnp.where(delta == 0, cfg.delta0, delta * 10.0)
            L, ok = factor(delta)
            return delta, L, ok, t + 1

        _, L, _, _ = lax.while_loop(
            cond_fn, body_fn,
            (jnp.zeros((), dtype), L0, ok0, jnp.zeros((), jnp.int32)))
        return L

    def schur_direction(x, s, z, lc, th, data, mu, ax):
        """Condensed-KKT Newton step via the distributed Schur complement.

        Returns (dx (Kl,d), ds, dz, dlc (mc,)) solving
            (W_k + Sigma_k) dx_k - A_k^T dlc = rhs_k
            sum_k A_k dx_k                   = -r_ce
        with Sigma_k = diag(z_k/s_k), then recovering ds, dz elementwise.
        """
        rx, rs, rce, rci = grad_blocks(x, s, z, lc, th, data, mu, ax)
        W = hess_f(x, th)                                    # (Kl, d, d)
        if box:
            sig = z / (s + guard)                              # (Kl, d)
            Wd = W + jax.vmap(jnp.diag)(sig)
            rhs = -(rx + rs + sig * rci)                     # (Kl, d)
        else:
            Wd = W
            rhs = -rx

        L = jax.vmap(chol_with_shift)(Wd)                    # (Kl, d, d)

        def chol_solve(Lk, B):
            y = jax.scipy.linalg.solve_triangular(Lk, B, lower=True)
            return jax.scipy.linalg.solve_triangular(Lk.T, y, lower=False)

        # H^{-1} A^T : (Kl, d, mc);  H^{-1} rhs : (Kl, d)
        HiAT = jax.vmap(chol_solve)(L, jnp.swapaxes(data.A, 1, 2))
        Hir = jax.vmap(chol_solve)(L, rhs[..., None])[..., 0]

        # Schur complement over coupling constraints — the psum that rides
        # the ICI (SURVEY.md §5): S = sum_k A_k H_k^{-1} A_k^T  (mc, mc)
        S = _psum(jnp.einsum("kcd,kde->ce", data.A, HiAT), ax)
        rS = -rce - _psum(jnp.einsum("kcd,kd->c", data.A, Hir), ax)
        # small replicated solve; regularize lightly for rank safety
        S = S + cfg.reg_coef * jnp.eye(mc, dtype=dtype)
        dlc = jnp.linalg.solve(S, rS)

        dx = Hir + jnp.einsum("kdc,c->kd", HiAT, dlc)
        if box:
            ds = dx + rci
            dz = -rs - sig * ds
        else:
            ds = jnp.zeros_like(dx)
            dz = jnp.zeros_like(dx)
        return dx, ds, dz, dlc

    # ------------------------------------------------------------------
    def ftb_alpha(v, dv, ax):
        """Global fraction-to-the-boundary step (closed form + pmin)."""
        neg = dv < 0
        denom = jnp.where(neg, -dv, jnp.ones((), dtype))
        ratio = jnp.where(neg, cfg.tau * v / denom, jnp.inf)
        local = jnp.minimum(jnp.ones((), dtype), jnp.min(ratio))
        return lax.pmin(local, axis_name=ax)

    class Carry(NamedTuple):
        x: jnp.ndarray
        s: jnp.ndarray
        z: jnp.ndarray
        lc: jnp.ndarray
        mu: jnp.ndarray
        nu: jnp.ndarray
        kkt: jnp.ndarray
        signal: jnp.ndarray
        iters: jnp.ndarray
        outer: jnp.ndarray
        inner: jnp.ndarray
        inner_done: jnp.ndarray

    def local_solve(x0, data: SeparableData):
        ax = axis
        th = data.theta
        x = x0.astype(dtype)
        if box:
            s = jnp.maximum(x - data.lb, cfg.Ktol).astype(dtype)
            z = jnp.full_like(s, cfg.Ktol)
            mu0 = jnp.asarray(cfg.mu, dtype)
        else:
            s = jnp.zeros_like(x)
            z = jnp.zeros_like(x)
            mu0 = jnp.asarray(cfg.Ktol, dtype)
        lc = jnp.zeros((mc,), dtype)
        nu0 = jnp.asarray(cfg.nu, dtype)

        def inner_iter(c: Carry) -> Carry:
            dx, ds, dz, dlc = schur_direction(
                c.x, c.s, c.z, c.lc, th, data, c.mu, ax)

            # nu update (reference pyipm.py:1727-1735): barrier-gradient
            # dot with the primal direction over the l1 infeasibility
            con_l1 = jnp.sum(jnp.abs(ce_res(c.x, data.A, data.b, ax)))
            bdot = _psum(jnp.sum(grad_f(c.x, th) * dx), ax)
            if box:
                con_l1 = con_l1 + _psum(
                    jnp.sum(jnp.abs(c.x - data.lb - c.s)), ax)
                bdot = bdot + _psum(
                    jnp.sum(-c.mu / (c.s + guard) * ds), ax)
            nu_thr = bdot / ((1.0 - cfg.rho) * con_l1 + tiny)
            nu = jnp.maximum(c.nu, nu_thr)

            if box:
                a_s = ftb_alpha(c.s, ds, ax)
                a_z = ftb_alpha(c.z, dz, ax)
            else:
                a_s = jnp.ones((), dtype)
                a_z = jnp.ones((), dtype)

            # Armijo backtracking on the merit (reference pyipm.py:1490-1505)
            phi0 = phi(c.x, c.s, th, data, c.mu, nu, ax)
            dphi0 = bdot - nu * con_l1

            def armijo_fail(a):
                return (phi(c.x + a * dx, c.s + a * ds, th, data, c.mu, nu,
                            ax) > phi0 + a * cfg.eta * dphi0)

            def bcond(cc):
                a, t, aborted = cc
                return armijo_fail(a) & (~aborted) & (t < cfg.max_backtrack)

            def bbody(cc):
                a, t, aborted = cc
                step2 = _psum(jnp.sum((a * dx) ** 2)
                              + jnp.sum((a * ds) ** 2), ax)
                aborted = aborted | (jnp.sqrt(step2) < eps)
                a = jnp.where(aborted, a, a * cfg.tau)
                return a, t + 1, aborted

            a0 = a_s
            a, _, aborted = lax.while_loop(
                bcond, bbody,
                (a0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_)))

            def apply_step(c):
                x = c.x + a * dx
                s = c.s + a * ds if box else c.s
                z = c.z + a_z * dz if box else c.z
                lc = c.lc + a_z * dlc if box else c.lc + a * dlc
                return c._replace(x=x, s=s, z=z, lc=lc, nu=nu)

            def abort_step(c):
                return c._replace(signal=jnp.asarray(-2, jnp.int32), nu=nu)

            c = lax.cond(aborted, abort_step, apply_step, c)
            kkt = kkt_norms(c.x, c.s, c.z, c.lc, th, data, c.mu, ax)
            return c._replace(kkt=kkt, iters=c.iters + 1)

        def inner_loop(c: Carry) -> Carry:
            c = c._replace(inner=jnp.zeros((), jnp.int32),
                           inner_done=jnp.zeros((), jnp.bool_))

            def cond_fn(c):
                return ((c.inner < cfg.miter) & (c.signal == 0)
                        & (~c.inner_done))

            def body_fn(c):
                muTol = jnp.maximum(jnp.asarray(cfg.Ktol, dtype), c.mu)
                conv = jnp.all(c.kkt <= muTol)

                def on_conv(c):
                    return c._replace(inner_done=jnp.ones((), jnp.bool_))

                def on_run(c):
                    c = inner_iter(c)
                    return c._replace(inner=c.inner + 1)

                return lax.cond(conv, on_conv, on_run, c)

            return lax.while_loop(cond_fn, body_fn, c)

        def outer_body(c: Carry) -> Carry:
            conv = jnp.all(c.kkt <= cfg.Ktol)

            def on_conv(c):
                return c._replace(signal=jnp.asarray(1, jnp.int32))

            def on_run(c):
                c = inner_loop(c)
                is_last = c.outer >= cfg.niter - 1
                c = c._replace(signal=jnp.where(
                    (c.signal == 0) & is_last,
                    jnp.asarray(-1, jnp.int32), c.signal))
                if box:
                    # centrality-based barrier update (pyipm.py:1804-1814)
                    def mu_upd(c):
                        ntot = _psum(jnp.asarray(c.s.size, dtype), ax)
                        sl = _psum(jnp.sum(c.s * c.z), ax)
                        smin = lax.pmin(jnp.min(c.s * c.z), axis_name=ax)
                        xi = ntot * smin / (sl + eps)
                        mu_new = (0.1 * jnp.minimum(
                            0.05 * (1.0 - xi) / (xi + eps), 2.0) ** 3
                            * sl / ntot)
                        # floored at cfg.mu_floor (see IPMConfig)
                        return c._replace(mu=jnp.maximum(
                            mu_new, jnp.asarray(cfg.mu_floor, dtype)))

                    c = lax.cond(c.signal == 0, mu_upd, lambda c: c, c)
                return c

            c = lax.cond(conv, on_conv, on_run, c)
            return c._replace(outer=c.outer + 1)

        kkt0 = kkt_norms(x, s, z, lc, th, data, mu0, ax)
        c0 = Carry(x=x, s=s, z=z, lc=lc, mu=mu0, nu=nu0, kkt=kkt0,
                   signal=jnp.zeros((), jnp.int32),
                   iters=jnp.zeros((), jnp.int32),
                   outer=jnp.zeros((), jnp.int32),
                   inner=jnp.zeros((), jnp.int32),
                   inner_done=jnp.zeros((), jnp.bool_))

        c = lax.while_loop(
            lambda c: (c.outer < cfg.niter) & (c.signal == 0),
            outer_body, c0)

        return SeparableResult(
            x=c.x, s=c.s, z=c.z, lc=c.lc,
            fval=fval(c.x, th, ax), kkt=c.kkt, signal=c.signal,
            iter_count=c.iters, mu=c.mu, nu=c.nu)

    # ------------------------------------------------------------------
    blk = P(axis)            # leading K axis sharded over blocks
    rep = P()
    data_specs = SeparableData(theta=blk, A=blk, b=rep, lb=blk)
    out_specs = SeparableResult(
        x=blk, s=blk, z=blk, lc=rep, fval=rep, kkt=rep, signal=rep,
        iter_count=rep, mu=rep, nu=rep)

    def local_solve_precise(x0, data):
        # full-f32 matmul passes (see IPMConfig.matmul_precision)
        with jax.default_matmul_precision(cfg.matmul_precision):
            return local_solve(x0, data)

    sharded = jax.shard_map(
        local_solve_precise, mesh=mesh,
        in_specs=(blk, data_specs), out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)


# ----------------------------------------------------------------------
def sample_separable(key, K: int, d: int, mc: int, dtype=jnp.float32):
    """Random block-separable test instance: convex quadratic blocks +
    random coupling, x=lb+1 strictly feasible for the bounds and the
    coupling rhs chosen from a feasible point."""
    kq, kc, ka, kx = jax.random.split(key, 4)
    G = jax.random.normal(kq, (K, d, d), dtype) / np.sqrt(d)
    Q = jnp.einsum("kij,klj->kil", G, G) + jnp.eye(d, dtype=dtype)[None]
    c = jax.random.normal(kc, (K, d), dtype)
    A = jax.random.normal(ka, (K, mc, d), dtype) / np.sqrt(K * d)
    lb = jnp.full((K, d), -2.0, dtype)
    xfeas = jax.random.normal(kx, (K, d), dtype) * 0.1
    b = jnp.einsum("kcd,kd->c", A, xfeas)
    theta = {"Q": Q, "c": c}

    def f_blk(xk, th):
        return 0.5 * xk @ (th["Q"] @ xk) + th["c"] @ xk

    spec = SeparableNLP(f_blk=f_blk, d=d, mc=mc, has_box=True)
    data = SeparableData(theta=theta, A=A, b=b, lb=lb)
    x0 = jnp.zeros((K, d), dtype)
    return spec, data, x0
