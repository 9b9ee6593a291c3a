"""Batched (vmap) and sharded scenario solving.

The reference has no batching or multi-device story; these tests cover the
TPU-native layers: batch-consistency (batched result == loop of single
solves, SURVEY.md §4) and sharding over an 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pyipm_tpu import IPMConfig, solve, solve_batch
from pyipm_tpu.models import REFERENCE_PROBLEMS
from pyipm_tpu.parallel.batch import make_batch_solver
import pytest

CFG = IPMConfig(Ftol=1e-8, verbosity=0)


@pytest.mark.slow
def test_batch_matches_single_solves():
    spec = REFERENCE_PROBLEMS[7]
    prob = spec.make()
    rng = np.random.default_rng(42)
    B = 5
    x0s = np.stack([spec.sample_x0(rng) for _ in range(B)])
    batched = solve_batch(prob, x0s, CFG)
    for i in range(B):
        single = solve(prob, x0s[i], CFG)
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x),
                                   rtol=1e-9, atol=1e-9)
        assert int(batched.signal[i]) == int(single.signal)
        assert int(batched.iter_count[i]) == int(single.iter_count)


@pytest.mark.slow
def test_batch_mixed_convergence():
    """Instances converge independently; per-instance signals/iters differ."""
    spec = REFERENCE_PROBLEMS[5]
    prob = spec.make()
    rng = np.random.default_rng(1)
    B = 16
    x0s = np.stack([spec.sample_x0(rng) * (1 + 5 * i / B)
                    for i in range(B)])
    res = solve_batch(prob, x0s, CFG)
    sigs = np.asarray(res.signal)
    assert np.all(np.isin(sigs, [1, 2, -1, -2]))
    # the vast majority must converge
    assert np.mean(np.isin(sigs, [1, 2])) >= 0.9
    for i in range(B):
        if sigs[i] in (1, 2):
            assert spec.distance_to_truth(res.x[i]) <= 1e-3


@pytest.mark.slow
def test_batch_sharded_over_mesh():
    """Shard the instance axis over all 8 virtual devices; results must
    match the unsharded batch exactly."""
    spec = REFERENCE_PROBLEMS[7]
    prob = spec.make()
    rng = np.random.default_rng(3)
    ndev = len(jax.devices())
    B = 2 * ndev
    x0s = np.stack([spec.sample_x0(rng) for _ in range(B)])

    from pyipm_tpu.parallel.mesh import make_batch_mesh

    mesh = make_batch_mesh()
    fn = make_batch_solver(prob, CFG, mesh=mesh)
    res_sharded = fn(jnp.asarray(x0s))
    res_plain = solve_batch(prob, x0s, CFG)
    np.testing.assert_allclose(np.asarray(res_sharded.x),
                               np.asarray(res_plain.x),
                               rtol=1e-9, atol=1e-9)
    # outputs carry the batch sharding
    shard_devs = {d for s in res_sharded.x.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == ndev
