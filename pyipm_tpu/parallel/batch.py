"""Scenario batching: many independent NLP instances solved in lockstep.

The reference has no batching story at all (single host loop, reference
pyipm.py:1658); this is the DP-analog layer of the TPU-native design
(SURVEY.md §2): one jitted solver, ``vmap`` over a leading instance axis,
optionally sharded over the ``batch`` axis of a device mesh so XLA splits
instances across chips with zero collectives (embarrassingly parallel).

Because the solver core is a fixed-bound ``lax.while_loop``, vmap handles
per-instance convergence automatically: finished instances are masked while
stragglers iterate, and the batch retires when the last instance exits.
Per-instance status (``signal``) and iteration counts come back in the
batched :class:`SolverResult`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pyipm_tpu.config import IPMConfig
from pyipm_tpu.core.problem import Problem
from pyipm_tpu.core.solver import SolverResult, make_solver


def make_batch_solver(problem: Problem, config: Optional[IPMConfig] = None,
                      *, with_s0: bool = False, with_lda0: bool = False,
                      mesh: Optional[jax.sharding.Mesh] = None,
                      batch_axis: str = "batch"):
    """vmapped (and optionally mesh-sharded) solver.

    Returns ``fn(x0_batch[, s0_batch][, lda0_batch]) -> SolverResult`` with a
    leading batch axis on every output.  With ``mesh``, inputs/outputs are
    sharded over ``batch_axis`` via NamedSharding so instances parallelize
    across devices.
    """
    cfg = config if config is not None else IPMConfig()
    if cfg.verbosity > 0:
        # per-iteration debug prints are meaningless interleaved across a
        # batch; silence them (final reporting happens host-side).
        cfg = cfg.replace(verbosity=0)
    base = make_solver(problem, cfg, with_s0=with_s0, with_lda0=with_lda0,
                       jit=False)
    vmapped = jax.vmap(base)
    if mesh is None:
        return jax.jit(vmapped)
    batch_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(batch_axis))
    replicated = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())

    nargs = 1 + int(with_s0) + int(with_lda0)
    jitted = jax.jit(vmapped, in_shardings=(batch_sharding,) * nargs)

    def fn(*args):
        args = tuple(jax.device_put(a, batch_sharding) for a in args)
        return jitted(*args)

    return fn


def solve_batch(problem: Problem, x0_batch, config: Optional[IPMConfig] = None,
                s0=None, lda0=None,
                mesh: Optional[jax.sharding.Mesh] = None) -> SolverResult:
    """One-shot batched solve over a leading instance axis of ``x0_batch``."""
    fn = make_batch_solver(problem, config, with_s0=s0 is not None,
                           with_lda0=lda0 is not None, mesh=mesh)
    args = [jnp.asarray(x0_batch)]
    if s0 is not None:
        args.append(jnp.asarray(s0))
    if lda0 is not None:
        args.append(jnp.asarray(lda0))
    return fn(*args)
