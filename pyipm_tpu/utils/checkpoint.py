"""Checkpoint/resume for solver state.

The reference has no checkpointing; its de-facto resume mechanism is the
warm-start arguments of solve() plus mutable members left on the instance
(reference pyipm.py:273-275, 1567-1578, 1816-1821).  Here the
:class:`~pyipm_tpu.core.solver.SolverState` pytree IS the checkpoint unit:
save it mid-run (or the result of a bounded-iteration run) and resume by
feeding x/s/lda back as warm starts, or by continuing the while_loop from
the restored carry via ``make_solver(...).run``.

Serialization uses orbax when available, with a NumPy .npz fallback so the
subsystem has no hard dependency.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_state(path: str, state: Any) -> None:
    """Save any solver pytree (SolverState, SolverResult, batched or not)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    leaves, _ = _flatten(state)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             *[np.asarray(l) for l in leaves])


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`; ``like`` supplies the
    structure (e.g. a freshly-built init state)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like)
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves, treedef = _flatten(like)
    new_leaves = [np.asarray(data[f"arr_{i}"]) for i in range(len(leaves))]
    import jax.numpy as jnp
    new_leaves = [jnp.asarray(nl, l.dtype) for nl, l in
                  zip(new_leaves, leaves)]
    return jax.tree.unflatten(treedef, new_leaves)
