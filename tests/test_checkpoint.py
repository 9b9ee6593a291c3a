"""Checkpoint/resume of the SolverState pytree (SURVEY.md §5)."""

import numpy as np

from pyipm_tpu import IPMConfig
from pyipm_tpu.core.solver import make_solver
from pyipm_tpu.models import REFERENCE_PROBLEMS
from pyipm_tpu.utils.checkpoint import restore_state, save_state
import pytest


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    spec = REFERENCE_PROBLEMS[7]
    prob = spec.make()
    cfg = IPMConfig(verbosity=0)
    fn = make_solver(prob, cfg)
    rng = np.random.default_rng(42)
    x0 = spec.sample_x0(rng)
    st = fn.init_state(x0)
    path = str(tmp_path / "ckpt")
    save_state(path, st)
    st2 = restore_state(path, fn.init_state(np.zeros_like(x0)))
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st2.x))
    np.testing.assert_array_equal(np.asarray(st.s), np.asarray(st2.s))
    np.testing.assert_array_equal(np.asarray(st.lda), np.asarray(st2.lda))


@pytest.mark.slow
def test_resume_from_checkpointed_state(tmp_path):
    """Truncated run -> checkpoint -> resume completes to the same answer
    as an uninterrupted run (the reference's only resume path is manual
    warm-starting, pyipm.py:1567-1578)."""
    spec = REFERENCE_PROBLEMS[5]
    prob = spec.make()
    rng = np.random.default_rng(42)
    x0 = spec.sample_x0(rng)

    full = make_solver(prob, IPMConfig(verbosity=0, Ftol=1e-8))(x0)

    short_cfg = IPMConfig(verbosity=0, niter=1, miter=3)
    short = make_solver(prob, short_cfg)
    partial = short(x0)
    path = str(tmp_path / "mid")
    save_state(path, partial)
    restored = restore_state(path, partial)

    resumed = make_solver(
        prob, IPMConfig(verbosity=0, Ftol=1e-8),
        with_s0=True, with_lda0=True)(
            np.asarray(restored.x), np.asarray(restored.s),
            np.asarray(restored.lda))
    assert int(resumed.signal) in (1, 2)
    assert spec.distance_to_truth(resumed.x) <= 1e-3
    assert spec.distance_to_truth(full.x) <= 1e-3
