"""Distributed block-separable Schur-complement solver tests
(the TP-analog layer, SURVEY.md §2) on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyipm_tpu.config import IPMConfig
from pyipm_tpu.parallel.schur import (
    SeparableData, make_separable_solver, sample_separable,
)


def _mesh(n):
    return jax.sharding.Mesh(
        np.asarray(jax.devices()[:n]), ("model",),
        axis_types=(jax.sharding.AxisType.Auto,))


def test_separable_converges_and_satisfies_constraints():
    K, d, mc = 8, 4, 3
    spec, data, x0 = sample_separable(jax.random.key(0), K, d, mc,
                                      dtype=jnp.float64)
    cfg = IPMConfig(float_dtype="float64", verbosity=0, niter=8, miter=20)
    fn = make_separable_solver(spec, _mesh(8), cfg)
    res = fn(x0, data)
    kkt = np.asarray(res.kkt)
    assert int(res.signal) == 1, f"kkt={kkt} signal={int(res.signal)}"
    assert np.all(kkt <= cfg.Ktol * (1 + 1e-9))
    # coupling constraints satisfied
    ce = np.einsum("kcd,kd->c", np.asarray(data.A), np.asarray(res.x)) \
        - np.asarray(data.b)
    assert np.linalg.norm(ce) <= 1e-4
    # bounds respected
    assert np.all(np.asarray(res.x) >= np.asarray(data.lb) - 1e-8)


@pytest.mark.slow
def test_separable_matches_global_kkt():
    """The distributed solution must satisfy the GLOBAL first-order
    conditions of the assembled problem (cross-check against a dense
    single-device formulation)."""
    K, d, mc = 4, 3, 2
    spec, data, x0 = sample_separable(jax.random.key(1), K, d, mc,
                                      dtype=jnp.float64)
    cfg = IPMConfig(float_dtype="float64", verbosity=0, niter=8, miter=20)
    fn = make_separable_solver(spec, _mesh(4), cfg)
    res = fn(x0, data)
    assert int(res.signal) == 1

    x = np.asarray(res.x)          # (K, d)
    z = np.asarray(res.z)
    lc = np.asarray(res.lc)
    Q = np.asarray(data.theta["Q"])
    c = np.asarray(data.theta["c"])
    A = np.asarray(data.A)
    # stationarity: Q_k x_k + c_k - A_k^T lc - z_k = 0
    r = np.einsum("kij,kj->ki", Q, x) + c \
        - np.einsum("kcd,c->kd", A, lc) - z
    assert np.linalg.norm(r.ravel()) <= 2e-4


@pytest.mark.slow
def test_separable_invariant_to_mesh_size():
    """Same problem, 2-device vs 8-device mesh: identical solution (the
    Schur psum is the only cross-device coupling)."""
    K, d, mc = 8, 3, 2
    spec, data, x0 = sample_separable(jax.random.key(2), K, d, mc,
                                      dtype=jnp.float64)
    cfg = IPMConfig(float_dtype="float64", verbosity=0, niter=6, miter=15)
    r2 = make_separable_solver(spec, _mesh(2), cfg)(x0, data)
    r8 = make_separable_solver(spec, _mesh(8), cfg)(x0, data)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r8.x),
                               rtol=1e-8, atol=1e-8)
    assert int(r2.iter_count) == int(r8.iter_count)


def test_separable_with_blockwise_equalities():
    """Eq-beyond-box structure: per-block equality constraints ce_k(x_k)=0
    on top of coupling + bounds.  The distributed solve must converge and
    satisfy ALL constraint classes plus global stationarity."""
    from pyipm_tpu.parallel.schur import sample_separable_eq

    K, d, mc, me = 8, 4, 2, 1
    spec, data, x0 = sample_separable_eq(jax.random.key(3), K, d, mc,
                                         me=me, dtype=jnp.float64)
    cfg = IPMConfig(float_dtype="float64", verbosity=0, niter=8, miter=20)
    fn = make_separable_solver(spec, _mesh(8), cfg)
    res = fn(x0, data)
    kkt = np.asarray(res.kkt)
    assert int(res.signal) == 1, f"kkt={kkt} signal={int(res.signal)}"
    assert np.all(kkt <= cfg.Ktol * (1 + 1e-9))

    x = np.asarray(res.x)
    z = np.asarray(res.z)
    le = np.asarray(res.le)
    lc = np.asarray(res.lc)
    Q = np.asarray(data.theta["Q"])
    c = np.asarray(data.theta["c"])
    C = np.asarray(data.theta["C"])
    e = np.asarray(data.theta["e"])
    A = np.asarray(data.A)
    # per-block equalities satisfied
    ceb = np.einsum("kmd,kd->km", C, x) - e
    assert np.linalg.norm(ceb.ravel()) <= 1e-4, ceb
    # coupling satisfied
    cec = np.einsum("kcd,kd->c", A, x) - np.asarray(data.b)
    assert np.linalg.norm(cec) <= 1e-4
    # bounds respected
    assert np.all(x >= np.asarray(data.lb) - 1e-8)
    # global stationarity: Q x + c - A^T lc - C^T le - z = 0
    r = (np.einsum("kij,kj->ki", Q, x) + c
         - np.einsum("kcd,c->kd", A, lc)
         - np.einsum("kmd,km->kd", C, le) - z)
    assert np.linalg.norm(r.ravel()) <= 2e-4, np.linalg.norm(r.ravel())


def test_separable_eq_without_box():
    """Pure-equality separable problem (no bounds): per-block + coupling
    equalities only."""
    from pyipm_tpu.parallel.schur import sample_separable_eq

    K, d, mc, me = 4, 3, 2, 1
    spec, data, x0 = sample_separable_eq(jax.random.key(4), K, d, mc,
                                         me=me, dtype=jnp.float64,
                                         has_box=False)
    cfg = IPMConfig(float_dtype="float64", verbosity=0, niter=8, miter=20)
    fn = make_separable_solver(spec, _mesh(4), cfg)
    res = fn(x0, data)
    assert int(res.signal) == 1, np.asarray(res.kkt)
    x = np.asarray(res.x)
    C = np.asarray(data.theta["C"])
    e = np.asarray(data.theta["e"])
    ceb = np.einsum("kmd,kd->km", C, x) - e
    assert np.linalg.norm(ceb.ravel()) <= 1e-4
