"""Distributed interior-point solve for block-separable NLPs.

The model-parallel (TP-analog) layer the reference entirely lacks
(SURVEY.md §2, absence table): a single LARGE structured NLP

    min   sum_k f_k(x_k)                          x_k in R^d,  k = 1..K
    s.t.  sum_k A_k x_k = b        (mc coupling equality constraints)
          ce_k(x_k) = 0            (optional me per-block equalities)
          x_k >= lb_k              (optional per-block bounds)

is partitioned block-by-block across the ``model`` axis of a device mesh.
Per iteration the condensed primal-dual KKT system

    [ M_blk   Ac^T ] [du ]   [ rhs ]     M_k = [[H_k + Sigma_k, Ce_k^T],
    [ Ac       0   ] [dlc] = [ -rc ]            [Ce_k,           0    ]]

is solved with a **Schur complement over the coupling constraints**:
each device factors its local block system (Cholesky with diagonal-shift
retry when me == 0; pivoted LU on the augmented block otherwise), forms
A_k M_k^{-1} A_k^T, and the small (mc, mc) Schur matrix is reduced with
``psum`` over the ICI mesh axis; the coupling step dlc is solved
replicated and back-substituted locally.  Slack/bound multiplier steps
are recovered elementwise.

The iteration machinery is the SAME code as the single-device solver
core: fraction-to-the-boundary (core/linesearch.max_step_ftb with pmin),
the chunk-vectorized Armijo backtracking and accept/SOC/abort policy
(core/linesearch.merit_line_search — one line-search implementation
framework-wide), the nu/mu update formulas (core/updates.py), and the
reference signal taxonomy — composed here with psum-reduced scalars.
The second-order correction reuses the iteration's block factorizations
(the standard same-matrix SOC, Wächter–Biegler; the reference's
always-lstsq min-norm SOC does not distribute, see core/linesearch.py).

Everything runs inside one ``shard_map`` over the mesh; control flow is
replicated (all devices see identical psum-reduced scalars), so the whole
solve is a single compiled SPMD program with XLA collectives on the ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from pyipm_tpu.config import IPMConfig
from pyipm_tpu.core.linesearch import max_step_ftb, merit_line_search
from pyipm_tpu.core.updates import centrality_mu, nu_threshold


@dataclasses.dataclass(frozen=True, eq=False)
class SeparableNLP:
    """Static description of a block-separable NLP."""
    f_blk: Callable          # (x_k (d,), theta_k) -> scalar
    d: int                   # per-block variable count
    mc: int                  # coupling equality constraints
    has_box: bool = True     # x_k >= lb_k bounds
    ce_blk: Optional[Callable] = None   # (x_k, theta_k) -> (me,) per-block
    #                                     equality constraints
    me: int = 0


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
    le: jnp.ndarray          # (K, me) per-block equality multipliers
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
    d, mc, me = spec.d, spec.mc, spec.me
    eps = float(np.finfo(dtype).eps)
    tiny = float(np.finfo(dtype).tiny)
    guard = float(np.sqrt(np.finfo(dtype).tiny))  # see core.kkt._eps_of
    box = spec.has_box
    assert (me > 0) == (spec.ce_blk is not None)

    grad_f = jax.vmap(jax.grad(spec.f_blk))          # (Kl,d),(Kl,...)->(Kl,d)
    fsum_l = jax.vmap(spec.f_blk)                    # -> (Kl,)
    if me:
        ce_l = jax.vmap(spec.ce_blk)                 # -> (Kl, me)
        jac_ce = jax.vmap(jax.jacfwd(spec.ce_blk))   # -> (Kl, me, d)

        def _lag_blk(xk, th, lek):
            return spec.f_blk(xk, th) - lax.stop_gradient(lek) @ \
                spec.ce_blk(xk, th)

        hess_L = jax.vmap(jax.hessian(_lag_blk))     # -> (Kl, d, d)
    else:
        def hess_L(x, th, le):
            return jax.vmap(jax.hessian(spec.f_blk))(x, th)

    # ------------------------------------------------------------------
    # residuals / merit, all on LOCAL slabs (Kl, ...) with psum for
    # global scalars (layouts mirror core/kkt.py — reference
    # pyipm.py:609-694 — with dci = I for bound constraints)
    def fval(x, th, ax):
        return _psum(jnp.sum(fsum_l(x, th)), ax)

    def ce_res(x, A, b, ax):
        """sum_k A_k x_k - b, replicated (mc,)."""
        return _psum(jnp.einsum("kcd,kd->c", A, x), ax) - b

    def con_blocks(x, s, th, data, ax):
        """(rce_c (mc,), rce_blk (Kl, me), rci (Kl, d))."""
        rce_c = ce_res(x, data.A, data.b, ax)
        rce_b = ce_l(x, th) if me else jnp.zeros((x.shape[0], 0), dtype)
        rci = (x - data.lb - s) if box else jnp.zeros_like(x)
        return rce_c, rce_b, rci

    def con_l1(x, s, th, data, ax):
        rce_c, rce_b, rci = con_blocks(x, s, th, data, ax)
        v = jnp.sum(jnp.abs(rce_c))
        if me:
            v = v + _psum(jnp.sum(jnp.abs(rce_b)), ax)
        if box:
            v = v + _psum(jnp.sum(jnp.abs(rci)), ax)
        return v

    def grad_blocks(x, s, z, le, lc, th, data, mu, ax):
        """Residual blocks: r_x (Kl,d), r_s (Kl,d), rce_c, rce_blk, rci."""
        rx = grad_f(x, th) - jnp.einsum("kcd,c->kd", data.A, lc)
        if me:
            rx = rx - jnp.einsum("kmd,km->kd", jac_ce(x, th), le)
        if box:
            rx = rx - z
            rs = z - mu / (s + guard)
        else:
            rs = jnp.zeros_like(x)
        rce_c, rce_b, rci = con_blocks(x, s, th, data, ax)
        return rx, rs, rce_c, rce_b, rci

    def kkt_norms(x, s, z, le, lc, th, data, mu, ax):
        rx, rs, rce_c, rce_b, rci = grad_blocks(
            x, s, z, le, lc, th, data, mu, ax)
        n1 = jnp.sqrt(_psum(jnp.sum(rx ** 2), ax))
        n2 = jnp.sqrt(_psum(jnp.sum((rs * s) ** 2), ax)) if box \
            else jnp.zeros((), dtype)
        n3 = jnp.sqrt(jnp.sum(rce_c ** 2)
                      + (_psum(jnp.sum(rce_b ** 2), ax) if me else 0.0))
        n4 = jnp.sqrt(_psum(jnp.sum(rci ** 2), ax)) if box \
            else jnp.zeros((), dtype)
        return jnp.stack([n1, n2, n3, n4])

    def phi(x, s, th, data, mu, nu, ax):
        """l1 merit (reference pyipm.py:670-694), globally reduced."""
        val = fval(x, th, ax) + nu * con_l1(x, s, th, data, ax)
        if box:
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

    def factorize(Wd, Ce):
        """Per-block factorization of the (possibly eq-augmented) block
        system; returns ``solve(B) -> X`` applying the block inverse to
        (Kl, d+me, nrhs) right-hand sides.  me == 0 keeps the fast
        Cholesky path; otherwise pivoted LU on the indefinite augmented
        matrix M_k = [[Wd_k, Ce_k^T], [Ce_k, -reg I]]."""
        if not me:
            L = jax.vmap(chol_with_shift)(Wd)          # (Kl, d, d)

            def solve(B):
                def one(Lk, Bk):
                    y = jax.scipy.linalg.solve_triangular(
                        Lk, Bk, lower=True)
                    return jax.scipy.linalg.solve_triangular(
                        Lk.T, y, lower=False)
                return jax.vmap(one)(L, B)

            return solve

        reg = cfg.reg_coef * jnp.eye(me, dtype=dtype)
        Kl = Wd.shape[0]
        M = jnp.zeros((Kl, d + me, d + me), dtype)
        M = M.at[:, :d, :d].set(Wd)
        M = M.at[:, :d, d:].set(jnp.swapaxes(Ce, 1, 2))
        M = M.at[:, d:, :d].set(Ce)
        M = M.at[:, d:, d:].set(-reg[None])
        lu, piv = jax.vmap(jax.scipy.linalg.lu_factor)(M)

        def solve(B):
            return jax.vmap(
                lambda lp, pv, Bk: jax.scipy.linalg.lu_solve((lp, pv), Bk)
            )(lu, piv, B)

        return solve

    def schur_direction(x, s, z, le, lc, th, data, mu, ax):
        """Condensed-KKT Newton step via the distributed Schur complement.

        Returns (dx, ds, dz, dle, dlc, resolve) where ``resolve`` reuses
        the block factorizations for the same-matrix SOC:
        resolve(rce_c_new, rce_b_new, rci_new) -> (dx_p, ds_p)."""
        rx, rs, rce_c, rce_b, rci = grad_blocks(
            x, s, z, le, lc, th, data, mu, ax)
        W = hess_L(x, th, le)                                # (Kl, d, d)
        if box:
            sig = z / (s + guard)                            # (Kl, d)
            Wd = W + jax.vmap(jnp.diag)(sig)
        else:
            sig = jnp.zeros_like(x)
            Wd = W
        Ce = jac_ce(x, th) if me else jnp.zeros((x.shape[0], 0, d), dtype)
        solve_blk = factorize(Wd, Ce)

        # augmented coupling Jacobian rows act on the x-part only
        At = jnp.zeros((x.shape[0], d + me, mc), dtype)
        At = At.at[:, :d, :].set(jnp.swapaxes(data.A, 1, 2))
        MiAT = solve_blk(At)                                 # (Kl, d+me, mc)
        # Schur complement over coupling constraints — the psum that rides
        # the ICI (SURVEY.md §5): S = sum_k A_k M_k^{-1} A_k^T  (mc, mc)
        S = _psum(jnp.einsum("kcd,kde->ce", data.A, MiAT[:, :d, :]), ax)
        S = S + cfg.reg_coef * jnp.eye(mc, dtype=dtype)

        def solve_coupled(rhs_u, rS_extra):
            """Solve the full system for block rhs (Kl, d+me) and coupling
            rhs -rS_extra; returns (du (Kl, d+me), dlc (mc,))."""
            Mir = solve_blk(rhs_u[..., None])[..., 0]        # (Kl, d+me)
            rS = rS_extra - _psum(
                jnp.einsum("kcd,kd->c", data.A, Mir[:, :d]), ax)
            dlc = jnp.linalg.solve(S, rS)
            du = Mir + jnp.einsum("kuc,c->ku", MiAT, dlc)
            return du, dlc

        def assemble_rhs(rx_, rs_, rce_b_, rci_):
            rhs = jnp.zeros((x.shape[0], d + me), dtype)
            rhs = rhs.at[:, :d].set(-(rx_ + rs_ + sig * rci_) if box
                                    else -rx_)
            if me:
                rhs = rhs.at[:, d:].set(-rce_b_)
            return rhs

        du, dlc = solve_coupled(assemble_rhs(rx, rs, rce_b, rci), -rce_c)
        dx = du[:, :d]
        dle = -du[:, d:]          # u = -dle in the augmented system
        if box:
            ds = dx + rci
            dz = -rs - sig * ds
        else:
            ds = jnp.zeros_like(dx)
            dz = jnp.zeros_like(dx)

        def resolve(rce_c_new, rce_b_new, rci_new):
            """Same-matrix SOC correction: constraint-only residuals
            through the SAME factorization."""
            zero = jnp.zeros_like(rx)
            du_p, _ = solve_coupled(
                assemble_rhs(zero, zero, rce_b_new, rci_new), -rce_c_new)
            dx_p = du_p[:, :d]
            ds_p = dx_p + rci_new if box else jnp.zeros_like(dx_p)
            return dx_p, ds_p

        return dx, ds, dz, dle, dlc, resolve

    # ------------------------------------------------------------------
    class Carry(NamedTuple):
        x: jnp.ndarray
        s: jnp.ndarray
        z: jnp.ndarray
        le: jnp.ndarray
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
        le = jnp.zeros((x.shape[0], me), dtype)
        lc = jnp.zeros((mc,), dtype)
        nu0 = jnp.asarray(cfg.nu, dtype)

        def inner_iter(c: Carry) -> Carry:
            dx, ds, dz, dle, dlc, resolve = schur_direction(
                c.x, c.s, c.z, c.le, c.lc, th, data, c.mu, ax)

            # nu update (shared formula, core/updates.py; reference
            # pyipm.py:1727-1735): barrier-gradient dot with the direction
            # over the l1 infeasibility
            cl1 = con_l1(c.x, c.s, th, data, ax)
            bdot = _psum(jnp.sum(grad_f(c.x, th) * dx), ax)
            if box:
                bdot = bdot + _psum(
                    jnp.sum(-c.mu / (c.s + guard) * ds), ax)
            nu = jnp.maximum(c.nu, nu_threshold(bdot, cl1, cfg.rho, tiny))

            # global fraction-to-the-boundary (shared closed form + pmin)
            if box:
                a_s = max_step_ftb(c.s, ds, cfg.tau, axis=ax)
                a_l = max_step_ftb(c.z, dz, cfg.tau, axis=ax)
            else:
                a_s = jnp.ones((), dtype)
                a_l = jnp.ones((), dtype)

            phi0 = phi(c.x, c.s, th, data, c.mu, nu, ax)
            dphi0 = bdot - nu * cl1
            # roundoff-aware Armijo slack (see core/linesearch.py)
            slack = 10.0 * eps * (1.0 + jnp.abs(phi0))

            def armijo_rhs(a):
                return phi0 + a * cfg.eta * dphi0 + slack

            def phi_at(a):
                return phi(c.x + a * dx, c.s + a * ds, th, data, c.mu,
                           nu, ax)

            base = jnp.sqrt(_psum(jnp.sum((a_s * dx) ** 2)
                                  + jnp.sum((a_l * ds) ** 2), ax))

            payload_zero = (jnp.zeros_like(dx), jnp.zeros_like(ds),
                            jnp.ones((), dtype))

            def try_soc(a):
                """Second-order correction when infeasibility increased
                (reference pyipm.py:1464-1489), via the same-matrix
                correction reusing the iteration's factorization."""
                xa = c.x + a * dx
                sa = c.s + a * ds
                old_l1 = cl1
                new_l1 = con_l1(xa, sa, th, data, ax)

                def do(_):
                    rc_c, rc_b, rci_n = con_blocks(xa, sa, th, data, ax)
                    dx_p, ds_p = resolve(rc_c, rc_b, rci_n)
                    rhs = armijo_rhs(a)
                    ok1 = phi(xa + dx_p, sa + ds_p, th, data, c.mu,
                              nu, ax) <= rhs
                    if box:
                        a_corr = max_step_ftb(c.s, a * ds + ds_p,
                                              cfg.tau, axis=ax)
                        ok2 = phi(c.x + a_corr * (a * dx + dx_p),
                                  c.s + a_corr * (a * ds + ds_p),
                                  th, data, c.mu, nu, ax) <= rhs
                        return ok1 & ok2, (dx_p, ds_p, a_corr)
                    return ok1, (dx_p, ds_p, jnp.ones((), dtype))

                def dont(_):
                    return jnp.zeros((), jnp.bool_), payload_zero

                return lax.cond(new_l1 > old_l1, do, dont, None)

            def apply(a_sf, a_lf, soc, payload):
                dx_p, ds_p, a_corr = payload
                one = jnp.ones((), dtype)
                corr = jnp.where(soc, a_corr, one)
                gate = jnp.where(soc, one, jnp.zeros((), dtype))
                x = c.x + corr * (a_sf * dx + gate * dx_p)
                s = c.s + corr * (a_sf * ds + gate * ds_p) if box else c.s
                z = c.z + a_lf * dz if box else c.z
                lenew = c.le + a_lf * dle
                lcnew = c.lc + a_lf * dlc
                return c._replace(x=x, s=s, z=z, le=lenew, lc=lcnew, nu=nu)

            def abort():
                return c._replace(signal=jnp.asarray(-2, jnp.int32), nu=nu)

            cn = merit_line_search(
                phi_at, armijo_rhs, base, a_s, a_l,
                try_soc, payload_zero, apply, abort,
                tau=cfg.tau, eps=eps, chunk=cfg.backtrack_chunk,
                max_backtrack=cfg.max_backtrack)
            kkt = kkt_norms(cn.x, cn.s, cn.z, cn.le, cn.lc, th, data,
                            cn.mu, ax)
            return cn._replace(kkt=kkt, iters=cn.iters + 1)

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
                    # centrality-based barrier update (shared formula,
                    # core/updates.py; reference pyipm.py:1804-1814)
                    def mu_upd(c):
                        ntot = _psum(jnp.asarray(c.s.size, dtype), ax)
                        sl = _psum(jnp.sum(c.s * c.z), ax)
                        smin = lax.pmin(jnp.min(c.s * c.z), axis_name=ax)
                        return c._replace(mu=centrality_mu(
                            sl, smin, ntot, eps, cfg.mu_floor, dtype))

                    c = lax.cond(c.signal == 0, mu_upd, lambda c: c, c)
                return c

            c = lax.cond(conv, on_conv, on_run, c)
            return c._replace(outer=c.outer + 1)

        kkt0 = kkt_norms(x, s, z, le, lc, th, data, mu0, ax)
        c0 = Carry(x=x, s=s, z=z, le=le, lc=lc, mu=mu0, nu=nu0, kkt=kkt0,
                   signal=jnp.zeros((), jnp.int32),
                   iters=jnp.zeros((), jnp.int32),
                   outer=jnp.zeros((), jnp.int32),
                   inner=jnp.zeros((), jnp.int32),
                   inner_done=jnp.zeros((), jnp.bool_))

        c = lax.while_loop(
            lambda c: (c.outer < cfg.niter) & (c.signal == 0),
            outer_body, c0)

        return SeparableResult(
            x=c.x, s=c.s, z=c.z, le=c.le, lc=c.lc,
            fval=fval(c.x, th, ax), kkt=c.kkt, signal=c.signal,
            iter_count=c.iters, mu=c.mu, nu=c.nu)

    # ------------------------------------------------------------------
    blk = P(axis)            # leading K axis sharded over blocks
    rep = P()
    data_specs = SeparableData(theta=blk, A=blk, b=rep, lb=blk)
    out_specs = SeparableResult(
        x=blk, s=blk, z=blk, le=blk, lc=rep, fval=rep, kkt=rep, signal=rep,
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


def sample_separable_eq(key, K: int, d: int, mc: int, me: int = 1,
                        dtype=jnp.float32, has_box: bool = True):
    """Block-separable instance WITH per-block equality constraints
    (linear: Ck x_k = ek, chosen feasible at a reference point) on top of
    coupling + optional bounds — the eq-beyond-box structure."""
    kq, kc, ka, kx, ke = jax.random.split(key, 5)
    G = jax.random.normal(kq, (K, d, d), dtype) / np.sqrt(d)
    Q = jnp.einsum("kij,klj->kil", G, G) + jnp.eye(d, dtype=dtype)[None]
    c = jax.random.normal(kc, (K, d), dtype)
    A = jax.random.normal(ka, (K, mc, d), dtype) / np.sqrt(K * d)
    Ck = jax.random.normal(ke, (K, me, d), dtype) / np.sqrt(d)
    lb = jnp.full((K, d), -3.0, dtype)
    xfeas = jax.random.normal(kx, (K, d), dtype) * 0.1
    b = jnp.einsum("kcd,kd->c", A, xfeas)
    ek = jnp.einsum("kmd,kd->km", Ck, xfeas)
    theta = {"Q": Q, "c": c, "C": Ck, "e": ek}

    def f_blk(xk, th):
        return 0.5 * xk @ (th["Q"] @ xk) + th["c"] @ xk

    def ce_blk(xk, th):
        return th["C"] @ xk - th["e"]

    spec = SeparableNLP(f_blk=f_blk, d=d, mc=mc, has_box=has_box,
                        ce_blk=ce_blk, me=me)
    data = SeparableData(theta=theta, A=A, b=b, lb=lb)
    x0 = jnp.zeros((K, d), dtype)
    return spec, data, x0
