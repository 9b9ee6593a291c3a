"""IPM class facade contract tests (reference pyipm.py:23-1863)."""

import numpy as np
import pytest

from pyipm_tpu import IPM
from pyipm_tpu.models import REFERENCE_PROBLEMS


def test_solve_returns_reference_tuple():
    spec = REFERENCE_PROBLEMS[7]
    rng = np.random.default_rng(42)
    p = IPM(x0=spec.sample_x0(rng), f=spec.f, ce=spec.ce, ci=spec.ci,
            Ftol=1e-8, verbosity=-1)
    out = p.solve()
    assert len(out) == 5
    x, s, lda, fval, kkt = out
    assert x.shape == (3,)
    assert s.shape == (3,)
    assert lda.shape == (4,)
    assert isinstance(fval, float)
    assert len(kkt) == 4
    assert spec.distance_to_truth(x) <= 1e-3
    # solutions stored on the instance (reference pyipm.py:1816-1821)
    np.testing.assert_array_equal(p.x, x)
    np.testing.assert_array_equal(p.lda, lda)
    assert p.fval == fval


def test_kkt_blocks_shapes():
    spec = REFERENCE_PROBLEMS[10]
    rng = np.random.default_rng(0)
    p = IPM(x0=spec.sample_x0(rng), f=spec.f, ce=spec.ce, ci=spec.ci,
            verbosity=-1)
    x, s, lda, fval, kkt = p.solve()
    kkt1, kkt2, kkt3, kkt4 = kkt
    assert kkt1.shape == (3,)
    assert kkt2.shape == (1,)
    assert kkt3.shape == (1,)
    assert kkt4.shape == (1,)


def test_kkt_absent_blocks_scalar_zero():
    spec = REFERENCE_PROBLEMS[1]
    rng = np.random.default_rng(0)
    p = IPM(x0=spec.sample_x0(rng), f=spec.f, verbosity=-1)
    x, s, lda, fval, kkt = p.solve()
    assert s.shape == (0,)
    assert lda.shape == (0,)
    # absent blocks come back as scalar zeros (reference pyipm.py:975-989)
    assert float(kkt[1]) == 0.0
    assert float(kkt[2]) == 0.0
    assert float(kkt[3]) == 0.0


def test_x_dev_accepted_and_ignored():
    spec = REFERENCE_PROBLEMS[1]
    rng = np.random.default_rng(0)
    p = IPM(x0=spec.sample_x0(rng), x_dev=object(), lambda_dev=object(),
            f=spec.f, verbosity=-1)
    x, *_ = p.solve()
    assert spec.distance_to_truth(x) <= 1e-3


def test_solve_with_new_x0_recompiles_on_dim_change():
    import jax.numpy as jnp

    p = IPM(f=lambda x: jnp.sum((x - 1.0) ** 2), verbosity=-1)
    x2, *_ = p.solve(x0=np.zeros(2))
    assert x2.shape == (2,)
    x3, *_ = p.solve(x0=np.zeros(3))
    assert x3.shape == (3,)
    np.testing.assert_allclose(x3, np.ones(3), atol=1e-6)


def test_validation_rejects_orphan_derivative():
    with pytest.raises(AssertionError):
        p = IPM(x0=np.zeros(2), f=lambda x: x @ x,
                dce=lambda x: np.zeros((2, 1)), verbosity=-1)
        p.solve()


def test_lbfgs_facade():
    spec = REFERENCE_PROBLEMS[5]
    rng = np.random.default_rng(42)
    p = IPM(x0=spec.sample_x0(rng), f=spec.f, ci=spec.ci,
            Ftol=1e-8, lbfgs=4, verbosity=-1)
    x, s, lda, fval, kkt = p.solve()
    assert spec.distance_to_truth(x) <= 1e-3


def test_kkt_default_mu_is_final_mu_after_solve():
    """Standalone KKT() after a solve must evaluate at the FINAL barrier
    value, matching the reference which uses the current device mu
    (reference pyipm.py:968) — not the constructor initial mu."""
    spec = REFERENCE_PROBLEMS[7]
    rng = np.random.default_rng(42)
    p = IPM(x0=spec.sample_x0(rng), f=spec.f, ce=spec.ce, ci=spec.ci,
            Ftol=1e-8, verbosity=-1)
    x, s, lda, fval, kkt = p.solve()
    assert p.mu is not None and p.mu < p.config.mu  # barrier decreased
    # default-mu call reproduces the solve()'s own kkt (evaluated at final
    # mu); an explicit initial-mu call must differ in the complementarity
    # block for this inequality-constrained problem
    k_default = p.KKT(x, s, lda)
    for a, b in zip(k_default, kkt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    k_init = p.KKT(x, s, lda, mu=p.config.mu)
    assert not np.allclose(np.asarray(k_init[1]), np.asarray(kkt[1]))


def test_xtol_validated_never_read():
    """Xtol contract (VERDICT r4 missing #2): accepted and validated for
    reference parity (pyipm.py:183-186) but NEVER read — the closed-form
    fraction-to-the-boundary step has no search tolerance to apply
    (core/linesearch.py vs the reference's golden section,
    pyipm.py:1429-1432).  Two solves differing only in Xtol must be
    BIT-IDENTICAL; an Xtol below machine eps must be rejected."""
    from pyipm_tpu import IPMConfig

    spec = REFERENCE_PROBLEMS[7]
    rng = np.random.default_rng(3)
    x0 = spec.sample_x0(rng)
    outs = []
    for xtol in (None, 1e-3):
        p = IPM(x0=x0, f=spec.f, ce=spec.ce, ci=spec.ci, Xtol=xtol,
                Ftol=1e-8, verbosity=-1)
        outs.append(p.solve())
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    assert outs[0][3] == outs[1][3]
    # validation still enforces the reference's Xtol >= eps range
    with pytest.raises(AssertionError):
        IPMConfig(Xtol=1e-20)
    assert IPMConfig(Xtol=1e-3).xtol == 1e-3
    assert IPMConfig().xtol == np.finfo(np.float64).eps


def test_mu0_nu0_warm_start_override():
    """solve(mu0=, nu0=) (VERDICT r4 missing #3): explicit opt-in to the
    reference's stateful mu/nu warm-start semantics (pyipm.py:273-275).
    A second solve fed the first solve's final mu/nu must converge, and
    seeding the INITIAL state with those values must actually change the
    starting barrier (visible in iteration counts or final mu)."""
    spec = REFERENCE_PROBLEMS[5]
    rng = np.random.default_rng(7)
    x0 = spec.sample_x0(rng)
    p = IPM(x0=x0, f=spec.f, ci=spec.ci, Ftol=1e-8, verbosity=-1)
    x1, *_ = p.solve()
    mu_f, nu_f = p.mu, p.nu
    assert mu_f is not None and nu_f is not None and mu_f < p.config.mu
    # warm re-solve from the solution with the final barrier state
    x2, s2, lda2, fval2, _ = p.solve(x0=x1, mu0=mu_f, nu0=nu_f)
    assert p.signal in (1, 2)
    assert spec.distance_to_truth(x2) <= 1e-3
    # runtime override: no recompile across values — same cached solver
    n_solvers = len(p._solvers)
    p.solve(x0=x1, mu0=2 * mu_f, nu0=nu_f)
    assert len(p._solvers) == n_solvers
