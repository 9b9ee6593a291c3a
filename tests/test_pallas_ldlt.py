"""Pallas lane-batched LDL^T kernels vs the plain-JAX reference
implementation (SURVEY.md §4: Pallas-kernel-vs-jax.numpy equivalence).

On CPU the kernels run in interpret mode for bit-level checking; the
custom_vmap dispatch itself falls back to XLA off-TPU, so these tests
exercise the kernel bodies explicitly via interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pyipm_tpu.ops import pallas_ldlt as pk
from pyipm_tpu.ops.linalg import ldlt_solve, ldlt_unblocked


def _rand_sym(rng, B, n):
    A = rng.standard_normal((B, n, n))
    A = (A + np.swapaxes(A, 1, 2)) / 2 + np.eye(n) * (n / 4)
    return jnp.asarray(A, jnp.float32)


@pytest.mark.parametrize("B,n", [(128, 16), (256, 24), (130, 8),
                                 (128, 48), (128, 64)])
def test_batched_factor_matches_reference(rng, B, n):
    A = _rand_sym(rng, B, n)
    with pltpu.force_tpu_interpret_mode():
        L, d = pk.batched_ldlt_factor(A)
    Lr, dr = jax.vmap(ldlt_unblocked)(A)
    # right-looking (kernel) vs left-looking (reference) agree to f32
    # roundoff accumulation; the hard criterion is reconstruction
    np.testing.assert_allclose(np.asarray(d), np.asarray(dr),
                               rtol=5e-3, atol=1e-3)
    rec = np.einsum("bij,bj,bkj->bik", np.asarray(L), np.asarray(d),
                    np.asarray(L))
    scale = np.max(np.abs(np.asarray(A)))
    np.testing.assert_allclose(rec, np.asarray(A),
                               atol=5e-5 * scale * n, rtol=1e-4)
    # inertia (the quantity the solver reads off d) must agree exactly
    np.testing.assert_array_equal(np.asarray(d) < 0, np.asarray(dr) < 0)


@pytest.mark.parametrize("B,n", [(128, 16), (129, 12), (128, 48),
                                 (128, 64)])
def test_batched_solve_matches_reference(rng, B, n):
    A = _rand_sym(rng, B, n)
    b = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    Lr, dr = jax.vmap(ldlt_unblocked)(A)
    with pltpu.force_tpu_interpret_mode():
        x = pk.batched_ldlt_solve(Lr, dr, b)
    xr = jax.vmap(ldlt_solve)(Lr, dr, b)
    # kernel reductions accumulate in a different order than the XLA loop
    np.testing.assert_allclose(np.asarray(x), np.asarray(xr),
                               rtol=2e-3, atol=6e-3)
    # and it actually solves the system (scale-relative residual)
    res = np.einsum("bij,bj->bi", np.asarray(A), np.asarray(x)) \
        - np.asarray(b)
    scale = np.max(np.abs(np.asarray(A))) * np.max(np.abs(np.asarray(x)))
    assert np.max(np.abs(res)) < 1e-4 * scale * n


@pytest.mark.parametrize("n", [64, 128])
def test_panel_kernel_matches_reference(rng, n):
    A = _rand_sym(rng, 1, n)[0]
    with pltpu.force_tpu_interpret_mode():
        L, d = pk.panel_ldlt(A)
    Lr, dr = ldlt_unblocked(A)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dr),
                               rtol=5e-3, atol=1e-3)
    rec = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    scale = float(np.max(np.abs(np.asarray(A))))
    np.testing.assert_allclose(rec, np.asarray(A),
                               atol=5e-5 * scale * n, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(d) < 0, np.asarray(dr) < 0)


def test_custom_vmap_dispatch_unbatched(rng):
    """Unbatched calls produce a valid factorization (the unrolled
    right-looking form differs from the left-looking loop only in f32
    accumulation order)."""
    A = _rand_sym(rng, 1, 16)[0]
    L, d = pk.ldlt_factor_small(A)
    Lr, dr = ldlt_unblocked(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lr), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dr), rtol=1e-4)
    rec = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    np.testing.assert_allclose(rec, np.asarray(A), atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(d) < 0, np.asarray(dr) < 0)


def test_custom_vmap_dispatch_batched_cpu_fallback(rng):
    """vmapped calls dispatch to the batched unrolled implementation and
    agree with the loop reference to f32 accumulation order."""
    A = _rand_sym(rng, 8, 16)
    L, d = jax.vmap(pk.ldlt_factor_small)(A)
    Lr, dr = jax.vmap(ldlt_unblocked)(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lr), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dr), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(d) < 0, np.asarray(dr) < 0)


@pytest.mark.slow
@pytest.mark.parametrize("B,n", [(4, 16), (4, 24), (3, 48), (2, 130)])
def test_unrolled_factor_blocked(rng, B, n):
    """Blocked unrolled factorization (panel inverse + matmul trailing
    updates) reconstructs A and gets the inertia right at every size."""
    from pyipm_tpu.ops.linalg import ldlt_factor_unrolled

    A = _rand_sym(rng, B, n)
    # make some instances indefinite so inertia is non-trivial
    A = A.at[0].add(-np.float32(n) * jnp.eye(n, dtype=jnp.float32))
    L, d = ldlt_factor_unrolled(A)
    rec = np.einsum("bij,bj,bkj->bik", np.asarray(L), np.asarray(d),
                    np.asarray(L))
    scale = np.max(np.abs(np.asarray(A)))
    np.testing.assert_allclose(rec, np.asarray(A),
                               atol=1e-4 * scale * n, rtol=1e-3)
    w = np.linalg.eigvalsh(np.asarray(A).astype(np.float64))
    np.testing.assert_array_equal(
        (np.asarray(d) < 0).sum(-1), (w < 0).sum(-1))


def test_unit_lower_inverse_exact(rng):
    from pyipm_tpu.ops.linalg import unit_lower_inverse

    for n in (5, 16, 33):
        L = np.tril(rng.standard_normal((n, n)), -1) + np.eye(n)
        Linv = np.asarray(unit_lower_inverse(jnp.asarray(L)))
        np.testing.assert_allclose(Linv @ L, np.eye(n), atol=1e-10)


def test_ldlt_solve_inv_matches_substitution(rng):
    from pyipm_tpu.ops.linalg import ldlt_solve_inv

    A = _rand_sym(rng, 6, 20)
    b = jnp.asarray(rng.standard_normal((6, 20)), jnp.float32)
    L, d = jax.vmap(ldlt_unblocked)(A)
    x = np.asarray(ldlt_solve_inv(L, d, b))
    xr = np.linalg.solve(np.asarray(A).astype(np.float64),
                         np.asarray(b).astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, xr, rtol=1e-3, atol=1e-4)


# ----------------------------------------------------------------------
# panel-level backward sweep (r5 solve path of reg_solve_kkt)
def _panel_factors(rng, n, block=128, group=8):
    from pyipm_tpu.ops.linalg import ldlt_factor_panels

    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2 + n * np.eye(n)
    b = rng.standard_normal(n)
    Lp, dp, invp, yf = ldlt_factor_panels(
        jnp.asarray(A, jnp.float32), block=block, group=group,
        rhs=jnp.asarray(b, jnp.float32))
    return A, b, Lp, dp, invp, yf


@pytest.mark.parametrize("n", [300, 1100, 1500])
def test_panel_sweep_xla_solves(rng, n):
    """fwd+bwd XLA panel sweeps against dense numpy solve (the CPU/vmap
    fallback of the r5 want_solver=False reg_solve_kkt path)."""
    from pyipm_tpu.ops.linalg import ldlt_solve_panels, ldlt_solve_panels_bwd

    A, b, Lp, dp, invp, yf = _panel_factors(rng, n)
    ref = np.linalg.solve(A, b)
    # full solve from scratch
    x1 = np.asarray(ldlt_solve_panels(Lp, dp, invp, jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(x1, ref, rtol=5e-4, atol=5e-4)
    # folded-forward variant
    x2 = np.asarray(ldlt_solve_panels_bwd(Lp, dp, invp, yf))[:n]
    np.testing.assert_allclose(x2, ref, rtol=5e-4, atol=5e-4)


def test_panel_sweep_kernel_interpret_matches_xla(rng):
    """The Pallas streaming panel-sweep kernel (interpret mode) against
    the XLA fori fallback, at a geometry with multiple streamed chunks,
    several superblocks, and a diagonal-only last superblock."""
    from pyipm_tpu.ops.linalg import _bwd_sweep_panels_xla

    n = 1900                      # pads to 2048 = 2 superblocks of 1024
    A, b, Lp, dp, invp, yf = _panel_factors(rng, n)
    safe = jnp.where(jnp.abs(dp) > 0, dp, 1.0)
    z = yf / safe
    ref = np.asarray(_bwd_sweep_panels_xla(Lp, z, invp))
    for SB, R in ((1024, 512), (1024, 256), (512, 128)):
        with pltpu.force_tpu_interpret_mode():
            x = pk._bwd_sweep_panels_pallas(Lp, z, invp, SB, R)
        np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-5,
                                   atol=2e-5,
                                   err_msg=f"geometry SB={SB} R={R}")


def test_panel_sweep_custom_vmap_batched_fallback(rng):
    """vmapped bwd_sweep_panels routes through the XLA rule."""
    from pyipm_tpu.ops.linalg import _bwd_sweep_panels_xla

    n = 300
    _, _, Lp, dp, invp, yf = _panel_factors(rng, n, group=2)
    safe = jnp.where(jnp.abs(dp) > 0, dp, 1.0)
    z = ((yf / safe)[None, :].repeat(3, axis=0)
         * jnp.asarray([1., 2., 3.], jnp.float32)[:, None])
    out = jax.vmap(pk.bwd_sweep_panels, in_axes=(None, 0, None))(Lp, z, invp)
    ref = jax.vmap(_bwd_sweep_panels_xla, in_axes=(None, 0, None))(Lp, z, invp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
