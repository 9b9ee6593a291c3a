"""Device-mesh construction helpers.

The framework uses two logical mesh axes (SURVEY.md §2):
  - ``batch``: independent NLP instances (the DP analog) — zero collectives;
  - ``model``: partitioned blocks of a single large block-separable NLP
    (the TP analog) — Schur-complement psum over coupling constraints.

Meshes are built with AUTO axis types: the solver relies on XLA's sharding
propagation (GSPMD) rather than explicit-sharding arithmetic, so batch
shardings stay on the instance axis instead of propagating into stacked
per-instance intermediates.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def _auto_types(n: int):
    return (jax.sharding.AxisType.Auto,) * n


def make_batch_mesh(n_devices: Optional[int] = None) -> jax.sharding.Mesh:
    """1-D mesh over all (or the first n) devices with a ``batch`` axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.asarray(devs), ("batch",),
                             axis_types=_auto_types(1))


def make_solver_mesh(batch: int, model: int,
                     devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    """2-D (batch, model) mesh: instances × blocks-of-one-instance."""
    devs = list(jax.devices() if devices is None else devices)
    assert batch * model <= len(devs), (
        f"need {batch * model} devices, have {len(devs)}")
    arr = np.asarray(devs[: batch * model]).reshape(batch, model)
    return jax.sharding.Mesh(arr, ("batch", "model"),
                             axis_types=_auto_types(2))
