"""Checkpoint / resume: pause a solve mid-flight, serialize the
SolverState pytree, restore it in a "new process", and finish — the
result is bit-identical to an uninterrupted solve.

The reference has no checkpointing (its de-facto resume is warm-starting
x0/s0/lda0, reference pyipm.py:1567-1578, losing mu/nu/delta/L-BFGS
state); here the ENTIRE iteration state is one immutable pytree that is
both the ``lax.while_loop`` carry and the checkpoint unit.

    python examples/checkpoint_resume.py
"""

import tempfile

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np                          # noqa: E402

from pyipm_tpu import IPMConfig             # noqa: E402
from pyipm_tpu.core.solver import make_solver  # noqa: E402
from pyipm_tpu.models.reference_problems import get_problem  # noqa: E402
from pyipm_tpu.utils.checkpoint import restore_state, save_state  # noqa: E402


def main():
    spec = get_problem(10)                  # mixed eq+ineq problem
    prob = spec.make(dtype=np.float64)
    cfg = IPMConfig(verbosity=0)
    solver = make_solver(prob, cfg)
    x0 = np.zeros(3)

    # uninterrupted solve, for comparison
    full = solver.finalize(solver.run(solver.init_state(x0)))

    # run 3 iterations, checkpoint, "crash"
    st = solver.run_budget(solver.init_state(x0), 3)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ckpt"
        save_state(path, st)
        # ... new process: rebuild the solver, restore, finish
        st2 = restore_state(path, solver.init_state(x0))
        res = solver.finalize(solver.run(st2))

    print("resumed  x =", np.asarray(res.x), "signal", int(res.signal))
    print("straight x =", np.asarray(full.x), "signal", int(full.signal))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(full.x))
    assert int(res.iter_count) == int(full.iter_count)
    print("bit-identical after resume:",
          int(res.iter_count), "total iterations")


if __name__ == "__main__":
    main()
