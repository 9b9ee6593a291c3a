"""Class facade matching the reference ``IPM`` contract.

Mirrors the reference constructor/solve/KKT surface (reference pyipm.py:23,
311-376, 1567, 958): same keyword names, same defaults, same 5-tuple return
``(x, s, lda, fval, kkt)``, same verbosity semantics for the final report.

Differences (all deliberate, documented):
  - ``f``/``ce``/``ci`` and the optional derivative overrides are plain JAX
    callables, not Aesara symbolic expressions; ``x_dev``/``lambda_dev`` are
    accepted and ignored (no symbolic graph exists to bind them to).
  - ``compile()`` jit-compiles the whole solver instead of per-expression
    Aesara functions; like the reference, ``solve()`` calls it lazily
    (pyipm.py:1593-1594).
  - mu/nu are reinitialized from the constructor values on every solve; the
    reference leaves the device copies in their final state across solves
    and warns users to reset them by hand (pyipm.py:273-275, 1603-1607).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyipm_tpu.config import IPMConfig
from pyipm_tpu.core import kkt as kkt_mod
from pyipm_tpu.core.problem import Problem
from pyipm_tpu.core.solver import make_solver


class IPM:
    """Solve nonlinear, nonconvex programs with a line-search primal-dual
    interior-point method:

        min f(x)  subject to  ce(x) = 0,  ci(x) >= 0

    See the reference docstring (pyipm.py:24-309) for the full parameter
    contract; every hyperparameter keeps its reference default.
    """

    def __init__(self, x0=None, x_dev=None, f=None, df=None, d2f=None,
                 ce=None, dce=None, d2ce=None, ci=None, dci=None, d2ci=None,
                 lda0=None, lambda_dev=None, s0=None, mu=0.2, nu=10.0,
                 rho=0.1, tau=0.995, eta=1.0E-4, beta=0.4, miter=20,
                 niter=10, Xtol=None, Ktol=1.0E-4, Ftol=None, lbfgs=False,
                 lbfgs_zeta=None, float_dtype=np.float64, verbosity=1,
                 linear_solver=None):
        del x_dev, lambda_dev  # symbolic placeholders; meaningless in JAX
        self.x0 = None if x0 is None else np.asarray(x0)
        self.lda0 = None if lda0 is None else np.asarray(lda0)
        self.s0 = None if s0 is None else np.asarray(s0)

        self.f = f
        self.df = df
        self.d2f = d2f
        self.ce = ce
        self.dce = dce
        self.d2ce = d2ce
        self.ci = ci
        self.dci = dci
        self.d2ci = d2ci

        # linear_solver=None defers to the IPMConfig default so the class
        # facade, the functional API, and the CLI all take the same hot path.
        solver_kw = ({} if linear_solver is None
                     else {"linear_solver": linear_solver})
        self.config = IPMConfig(
            mu=mu, nu=nu, rho=rho, tau=tau, eta=eta, beta=beta,
            miter=int(miter), niter=int(niter), Xtol=Xtol, Ktol=Ktol,
            Ftol=Ftol, lbfgs=int(lbfgs) if lbfgs else 0,
            lbfgs_zeta=lbfgs_zeta,
            float_dtype=np.dtype(float_dtype).name, verbosity=verbosity,
            **solver_kw,
        )
        self.float_dtype = np.dtype(float_dtype).type
        self.verbosity = verbosity

        self.nvar = None
        self.neq = None
        self.nineq = None
        self.problem: Optional[Problem] = None
        self.compiled = False
        self._solvers = {}

        # populated by solve() (reference pyipm.py:1816-1821)
        self.x = None
        self.s = None
        self.lda = None
        self.kkt = None
        self.fval = None
        self.signal = None

    # ------------------------------------------------------------------
    def validate(self):
        """Input validation (reference pyipm.py:385-408); hyperparameter
        ranges are validated eagerly by IPMConfig."""
        assert self.f is not None
        assert (self.ce is not None) or (self.dce is None and self.d2ce is None)
        assert (self.ci is not None) or (self.dci is None and self.d2ci is None)

    def compile(self, nvar=None, neq=None, nineq=None):
        """Build the Problem (inferring constraint counts) and jit the
        solver (reference compile(), pyipm.py:410-956 — collapsed to ~10
        lines because jit/grad compose over plain callables)."""
        if nvar is not None:
            self.nvar = int(nvar)
        elif self.x0 is not None:
            self.nvar = int(self.x0.size)
        assert self.nvar is not None, "nvar unknown: supply x0 or nvar"
        self.validate()
        self.problem = Problem(
            f=self.f, nvar=self.nvar,
            neq=self._count(self.ce, neq), nineq=self._count(self.ci, nineq),
            ce=self.ce, ci=self.ci, df=self.df, d2f=self.d2f,
            dce=self.dce, d2ce=self.d2ce, dci=self.dci, d2ci=self.d2ci,
        )
        self.neq = self.problem.neq
        self.nineq = self.problem.nineq
        self._solvers = {}
        self.compiled = True

    def _count(self, fn, override):
        if fn is None:
            return 0
        if override is not None:
            return int(override)
        import jax
        probe = jax.ShapeDtypeStruct((self.nvar,), self.config.np_dtype)
        out = jax.eval_shape(fn, probe)
        return int(np.prod(out.shape)) if out.shape else 1

    # ------------------------------------------------------------------
    def _solver(self, with_s0, with_lda0):
        key = (with_s0, with_lda0)
        if key not in self._solvers:
            self._solvers[key] = make_solver(
                self.problem, self.config,
                with_s0=with_s0, with_lda0=with_lda0)
        return self._solvers[key]

    def solve(self, x0=None, s0=None, lda0=None, force_recompile=False):
        """Run the solver (reference IPM.solve, pyipm.py:1567-1863).

        Returns (x, s, lda, fval, kkt) with kkt = [kkt1, kkt2, kkt3, kkt4]
        (absent blocks are scalar 0, reference pyipm.py:958-991).
        """
        if x0 is not None:
            self.x0 = np.asarray(x0)
        if s0 is not None:
            self.s0 = np.asarray(s0)
        if lda0 is not None:
            self.lda0 = np.asarray(lda0)
        assert self.x0 is not None and self.x0.size > 0
        assert self.x0.ndim == 1
        if (not self.compiled or force_recompile
                or self.nvar != self.x0.size):
            self.nvar = int(self.x0.size)
            self.compile()

        with_s0 = self.s0 is not None and self.problem.nineq > 0
        with_lda0 = self.lda0 is not None and self.problem.ncon > 0
        fn = self._solver(with_s0, with_lda0)
        args = [self.x0.astype(self.config.np_dtype)]
        if with_s0:
            args.append(self.s0.astype(self.config.np_dtype))
        if with_lda0:
            args.append(self.lda0.astype(self.config.np_dtype))
        res = fn(*args)

        self.x = np.asarray(res.x)
        self.s = np.asarray(res.s)
        self.lda = np.asarray(res.lda)
        self.fval = float(res.fval)
        self.signal = int(res.signal)
        self.kkt = self.KKT(self.x, self.s, self.lda, mu=float(res.mu))
        self._report(res)
        return self.x, self.s, self.lda, self.fval, self.kkt

    # ------------------------------------------------------------------
    def KKT(self, x, s, lda, mu=None):
        """First-order KKT conditions at (x, s, lda) (reference IPM.KKT,
        pyipm.py:958-991).  ``mu`` defaults to the configured barrier init
        (the reference evaluates at the current device value)."""
        if self.problem is None:
            self.nvar = int(np.asarray(x).size)
            self.compile()
        if mu is None:
            mu = self.config.mu if self.problem.nineq else self.config.Ktol
        import jax.numpy as jnp
        dtype = self.config.np_dtype
        blocks = kkt_mod.kkt_blocks(
            self.problem,
            jnp.asarray(x, dtype), jnp.asarray(s, dtype),
            jnp.asarray(lda, dtype), jnp.asarray(mu, dtype))
        return [np.asarray(b) for b in blocks]

    # ------------------------------------------------------------------
    def _report(self, res):
        """Final convergence report (reference pyipm.py:1823-1860)."""
        if self.verbosity < 0:
            return
        kktn = np.asarray(res.kkt)
        msg = []
        if self.signal == -2:
            msg.append('Terminated due to bad direction in backtracking '
                       'line search')
        elif np.all(kktn <= self.config.Ktol):
            msg.append('Converged to Ktol tolerance')
        elif self.signal == 2:
            msg.append('Converged to Ftol tolerance')
        else:
            msg.append('Maximum iterations reached')
        outer = int(res.outer)
        inner = int(res.inner)
        total = int(res.iter_count)
        if self.problem.nineq:
            if outer > 1:
                msg.append('after {} outer'.format(outer - 1))
                msg.append('iterations' if outer > 2 else 'iteration')
                msg.append('and')
            else:
                msg.append('after')
            msg.append('{} inner'.format(inner))
            msg.append('iterations' if inner > 1 else 'iteration')
            msg.append('({} total).'.format(total))
        else:
            msg.append('after {}'.format(total))
            msg.append('iterations.' if total > 1 else 'iteration.')
        print(' '.join(msg))
        if self.verbosity > 1:
            line = ['FINAL: f(x) = {}'.format(self.fval)]
            if self.verbosity > 2:
                line.append('|dL/dx| = {}'.format(kktn[0]))
                line.append('|dL/ds| = {}'.format(kktn[1]))
                line.append('|ce| = {}'.format(kktn[2]))
                line.append('|ci-s| = {}'.format(kktn[3]))
            print(', '.join(line))
