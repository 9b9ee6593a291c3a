"""Problem specification and derivative derivation.

Replaces the reference's Aesara symbolic-expression layer and its dual
precompiled/symbolic code paths (reference pyipm.py:410-956, the ``compile``
method and the ``precompile`` branching at pyipm.py:426-440): in JAX,
``jit``/``grad`` compose over plain callables, so the whole compile lifecycle
collapses into this module.

Users supply pure JAX callables ``f(x) -> scalar``, ``ce(x) -> (M,)``,
``ci(x) -> (N,)``.  Optional user-supplied derivatives are honored with the
reference's conventions (reference pyipm.py:223-225 note 2):

  - ``df(x) -> (D,)``            gradient of f
  - ``d2f(x) -> (D, D)``         Hessian of f
  - ``dce(x) -> (D, M)``         TRANSPOSED Jacobian of ce
  - ``d2ce(x, lda) -> (D, D)``   multiplier-contracted Hessian sum_j ce_j*lda[j]
  - ``dci(x) -> (D, N)``         TRANSPOSED Jacobian of ci
  - ``d2ci(x, lda) -> (D, D)``   multiplier-contracted Hessian sum_j ci_j*lda[M+j]

When absent they are derived by autodiff exactly as the reference does with
``T.grad``/``jacobian``/``hessian`` (reference pyipm.py:473-509).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True, eq=False)
class Problem:
    """Static problem description.

    ``eq=False`` keeps the dataclass hashable by identity so it can be a
    static argument to ``jax.jit`` (re-jitting per distinct problem object).

    Dimensions: D = nvar weights, M = neq equality constraints, N = nineq
    inequality constraints.  The composite primal-dual vector layout matches
    the reference (pyipm.py:654-668):

        z = [x (D) ; s (N) ; lda_e (M) ; lda_i (N)]      total K = D + 2N + M
    """

    f: Callable
    nvar: int
    neq: int = 0
    nineq: int = 0
    ce: Optional[Callable] = None
    ci: Optional[Callable] = None
    df: Optional[Callable] = None
    d2f: Optional[Callable] = None
    dce: Optional[Callable] = None
    d2ce: Optional[Callable] = None
    dci: Optional[Callable] = None
    d2ci: Optional[Callable] = None

    def __post_init__(self):
        # Input validation mirroring reference pyipm.py:385-393.
        assert self.f is not None
        assert (self.ce is not None) or (self.dce is None and self.d2ce is None)
        assert (self.ci is not None) or (self.dci is None and self.d2ci is None)
        assert self.nvar > 0
        assert (self.neq > 0) == (self.ce is not None)
        assert (self.nineq > 0) == (self.ci is not None)

    # ------------------------------------------------------------------
    # derived sizes
    @property
    def nslack(self) -> int:
        return self.nineq

    @property
    def ntot(self) -> int:
        """Length of the composite primal-dual vector (pyipm.py:655)."""
        return self.nvar + 2 * self.nineq + self.neq

    @property
    def ncon(self) -> int:
        return self.neq + self.nineq

    # ------------------------------------------------------------------
    # normalized evaluations
    def f_val(self, x):
        return jnp.reshape(jnp.asarray(self.f(x)), ())

    def ce_val(self, x):
        """Equality constraints, shape (M,)."""
        return jnp.reshape(jnp.asarray(self.ce(x)), (self.neq,))

    def ci_val(self, x):
        """Inequality constraints, shape (N,)."""
        return jnp.reshape(jnp.asarray(self.ci(x)), (self.nineq,))

    # ------------------------------------------------------------------
    # first derivatives (user override or autodiff, pyipm.py:473-509)
    def grad_f(self, x):
        if self.df is not None:
            return jnp.reshape(jnp.asarray(self.df(x)), (self.nvar,))
        return jax.grad(self.f_val)(x)

    def jac_ce(self, x):
        """TRANSPOSED equality Jacobian, shape (D, M) (pyipm.py:485-489)."""
        if self.dce is not None:
            return jnp.reshape(jnp.asarray(self.dce(x)), (self.nvar, self.neq))
        return jax.jacfwd(self.ce_val)(x).T

    def jac_ci(self, x):
        """TRANSPOSED inequality Jacobian, shape (D, N) (pyipm.py:499-503)."""
        if self.dci is not None:
            return jnp.reshape(jnp.asarray(self.dci(x)), (self.nvar, self.nineq))
        return jax.jacfwd(self.ci_val)(x).T

    # ------------------------------------------------------------------
    # second derivatives (exact-Hessian mode only)
    def hess_f(self, x):
        if self.d2f is not None:
            return jnp.reshape(jnp.asarray(self.d2f(x)), (self.nvar, self.nvar))
        return jax.hessian(self.f_val)(x)

    def hess_ce(self, x, lda):
        """Multiplier-contracted Hessian of ce: hessian(sum(ce * lda[:M]))
        (reference pyipm.py:492-493).  ``lda`` is the FULL multiplier vector.
        """
        if self.d2ce is not None:
            return jnp.reshape(jnp.asarray(self.d2ce(x, lda)), (self.nvar, self.nvar))
        lam = jax.lax.stop_gradient(lda[: self.neq])
        return jax.hessian(lambda xx: jnp.sum(self.ce_val(xx) * lam))(x)

    def hess_ci(self, x, lda):
        """Multiplier-contracted Hessian of ci (reference pyipm.py:506-507)."""
        if self.d2ci is not None:
            return jnp.reshape(jnp.asarray(self.d2ci(x, lda)), (self.nvar, self.nvar))
        lam = jax.lax.stop_gradient(lda[self.neq:])
        return jax.hessian(lambda xx: jnp.sum(self.ci_val(xx) * lam))(x)

    def hess_lagrangian(self, x, lda):
        """d2L = d2f - d2ce - d2ci — note the minus signs: the Lagrangian is
        L = f - lda.ce - lda.(ci - s) (reference pyipm.py:40, 816-821)."""
        H = self.hess_f(x)
        if self.neq:
            H = H - self.hess_ce(x, lda)
        if self.nineq:
            H = H - self.hess_ci(x, lda)
        return H


def make_problem(
    f: Callable,
    nvar: int,
    ce: Optional[Callable] = None,
    ci: Optional[Callable] = None,
    *,
    df=None,
    d2f=None,
    dce=None,
    d2ce=None,
    dci=None,
    d2ci=None,
    dtype=np.float64,
) -> Problem:
    """Build a :class:`Problem`, inferring M and N via abstract evaluation.

    The reference infers constraint counts by *running* ce/ci at x0
    (pyipm.py:442-467); ``jax.eval_shape`` does the same without touching
    real data or devices.
    """
    probe = jax.ShapeDtypeStruct((nvar,), np.dtype(dtype))

    def _count(fn):
        if fn is None:
            return 0
        out = jax.eval_shape(fn, probe)
        return int(np.prod(out.shape)) if out.shape else 1

    neq = _count(ce)
    nineq = _count(ci)
    return Problem(
        f=f, nvar=int(nvar), neq=neq, nineq=nineq, ce=ce, ci=ci,
        df=df, d2f=d2f, dce=dce, d2ce=d2ce, dci=dci, d2ci=d2ci,
    )
