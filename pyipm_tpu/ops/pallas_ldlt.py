"""Pallas TPU kernels for the batched small-KKT hot path.

The headline workload (BASELINE.md config 3) factors tens of thousands of
SMALL symmetric systems per solver iteration.  XLA's lowering of the
vmapped factorization is a sequence of per-column masked matvecs over a
(B, n, n) batch — correct, but each column step is a separate fusion with
the batch striding through sublanes.

These kernels use the classic lane-batched layout instead: the operand is
transposed to (n, n, B) so the LAST axis (TPU lanes, 128 wide) runs across
problem instances, and every operation of the factorization/substitution
becomes a fully lane-parallel VPU op.  One grid step processes 128
instances resident in VMEM with zero intermediate HBM traffic.

A single-panel (B, B) kernel is also provided for the LARGE-n blocked
factorization (ops/linalg.py): XLA lowers the unblocked panel loop as B
sequential fusions whose dispatch latency dominates; in-kernel the whole
panel stays in VMEM.

All kernels use masked whole-array extraction/update instead of dynamic
slicing — Mosaic does not lower ``lax.dynamic_slice`` on values, and the
masked forms are plain VPU elementwise work.

Integration is via ``jax.custom_batching.custom_vmap``: unbatched calls
lower to the plain JAX implementation (ops/linalg.py), while ``vmap`` —
i.e. exactly the batched-scenario path — dispatches to the kernels on TPU
(CPU and other backends keep the XLA fallback).  The solver code does not
change at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyipm_tpu.ops import linalg as _lin

LANE = 128
# largest per-instance system handled by the lane-batched kernels; above
# this the blocked XLA path (MXU matmuls) wins anyway
MAX_N = 128


# ----------------------------------------------------------------------
# lane-batched kernels (operands shaped (n, n, LANE) / (n, LANE))
def _factor_kernel(a_ref, l_ref, d_ref):
    """Right-looking unpivoted LDL^T, vectorized across lanes.

    Per column j: pivot d_j = A[j,j,:], scaled column becomes L[:,j,:],
    rank-1 trailing update A -= col x col * d — all (n, n, LANE)
    elementwise VPU work, no cross-lane traffic.

    L is built IN PLACE in A's storage (each finished column j is
    overwritten with L[:, j]; the rank-1 update is masked to the strictly
    trailing block so finished columns stay intact).  Carrying one
    (n, n, LANE) buffer instead of two halves the scoped-VMEM footprint,
    which is what bounds the lane-kernel system size."""
    A = a_ref[:]
    n = A.shape[0]
    dtype = A.dtype
    rows3 = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    cols3 = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    rows2 = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def body(j, carry):
        A, dv = carry
        rm = (rows3 == j).astype(dtype)
        cm = (cols3 == j).astype(dtype)
        dj = jnp.sum(A * rm * cm, axis=(0, 1))                 # (LANE,)
        safe = jnp.where(jnp.abs(dj) > 0, dj, jnp.ones((), dtype))
        colj = jnp.sum(A * cm, axis=1)                         # (n, LANE)
        col = jnp.where(rows2 > j, colj / safe[None, :],
                        jnp.zeros((), dtype))
        Lcol = col + jnp.where(rows2 == j, jnp.ones((), dtype),
                               jnp.zeros((), dtype))
        dv = jnp.where(rows2 == j, dj[None, :], dv)            # dv (n, LANE)
        upd = col[:, None, :] * col[None, :, :] * dj[None, None, :]
        trailing = ((rows3 > j) & (cols3 > j)).astype(dtype)
        A = A - upd * trailing
        A = jnp.where(cols3 == j, Lcol[:, None, :], A)
        return A, dv

    d0 = jnp.zeros((n, A.shape[2]), dtype)
    L, dv = lax.fori_loop(0, n, body, (A, d0))
    l_ref[:] = L
    d_ref[:] = dv


def _solve_kernel(l_ref, d_ref, b_ref, x_ref):
    """(L diag(d) L^T) x = b by lane-parallel forward/backward
    substitution."""
    L = l_ref[:]
    dv = d_ref[:]
    b = b_ref[:]
    n = L.shape[0]
    dtype = L.dtype
    rows3 = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    cols3 = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    rows2 = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def fwd(j, y):
        rm = (rows3 == j).astype(dtype)
        Lrow = jnp.sum(L * rm, axis=0)                         # (n, LANE)
        Lrow = jnp.where(rows2 < j, Lrow, jnp.zeros((), dtype))
        bj = jnp.sum(b * (rows2 == j).astype(dtype), axis=0)   # (LANE,)
        yj = bj - jnp.sum(Lrow * y, axis=0)
        return jnp.where(rows2 == j, yj[None, :], y)

    y = lax.fori_loop(0, n, fwd, jnp.zeros_like(b))
    safe = jnp.where(jnp.abs(dv) > 0, dv, jnp.ones((), dtype))
    z = y / safe

    def bwd(t, x):
        j = n - 1 - t
        cm = (cols3 == j).astype(dtype)
        Lcol = jnp.sum(L * cm, axis=1)                         # (n, LANE)
        Lcol = jnp.where(rows2 > j, Lcol, jnp.zeros((), dtype))
        zj = jnp.sum(z * (rows2 == j).astype(dtype), axis=0)
        xj = zj - jnp.sum(Lcol * x, axis=0)
        return jnp.where(rows2 == j, xj[None, :], x)

    x = lax.fori_loop(0, n, bwd, jnp.zeros_like(b))
    x_ref[:] = x


# ----------------------------------------------------------------------
# lane-batched wrappers over (B, n, n) / (B, n)
def _pad_lanes(B):
    return -(-B // LANE) * LANE


def batched_ldlt_factor(A):
    """A (B, n, n) -> (L (B, n, n), d (B, n)) via the lane-batched kernel."""
    B, n, _ = A.shape
    Bp = _pad_lanes(B)
    At = jnp.moveaxis(A, 0, -1)                        # (n, n, B)
    if Bp != B:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Bp - B)))
        # padded instances factor the zero matrix — harmless
    grid = Bp // LANE
    L, d = pl.pallas_call(
        _factor_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n, Bp), A.dtype),
            jax.ShapeDtypeStruct((n, Bp), A.dtype),
        ],
    )(At)
    L = jnp.moveaxis(L[:, :, :B], -1, 0)
    d = jnp.moveaxis(d[:, :B], -1, 0)
    return L, d


def batched_ldlt_solve(L, d, b):
    """(B, n, n), (B, n), (B, n) -> (B, n)."""
    B, n, _ = L.shape
    Bp = _pad_lanes(B)
    Lt = jnp.moveaxis(L, 0, -1)
    dt = jnp.moveaxis(d, 0, -1)
    bt = jnp.moveaxis(b, 0, -1)
    if Bp != B:
        pad = ((0, 0), (0, 0), (0, Bp - B))
        Lt = jnp.pad(Lt, pad)
        dt = jnp.pad(dt, ((0, 0), (0, Bp - B)))
        bt = jnp.pad(bt, ((0, 0), (0, Bp - B)))
    grid = Bp // LANE
    x = pl.pallas_call(
        _solve_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), L.dtype),
    )(Lt, dt, bt)
    return jnp.moveaxis(x[:, :B], -1, 0)


# ----------------------------------------------------------------------
# single-panel kernel for the large-n blocked factorization
def _panel_kernel(a_ref, lt_ref, d_ref):
    A = a_ref[:]
    n = A.shape[0]
    dtype = A.dtype
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(j, carry):
        A, Lt, dv = carry
        rc = ((rows == j) & (cols == j)).astype(dtype)
        dj = jnp.sum(A * rc)
        safe = jnp.where(jnp.abs(dj) > 0, dj, jnp.ones((), dtype))
        colj = jnp.sum(A * (cols == j).astype(dtype), axis=1,
                       keepdims=True)                          # (n, 1)
        col = jnp.where(rows > j, colj / safe, jnp.zeros((), dtype))
        # store L's column j as ROW j of Lt (sublane-contiguous write)
        newrow = col.T + jnp.where(cols == j, jnp.ones((), dtype),
                                   jnp.zeros((), dtype))
        Lt = jnp.where(rows == j, newrow, Lt)
        dv = jnp.where(cols == j, dj, dv)                      # dv (1, n)
        # rank-1 trailing update A_ik -= col_i * col_k * d (col already
        # masked to rows > j)
        A = A - (col * safe) * col.T
        return A, Lt, dv

    L0 = jnp.zeros_like(A)
    d0 = jnp.zeros((1, n), dtype)
    _, Lt, dv = lax.fori_loop(0, n, body, (A, L0, d0))
    lt_ref[:] = Lt
    d_ref[:] = dv


def panel_ldlt(A):
    """(B, B) LDL^T via one Pallas program; returns (L, d)."""
    n = A.shape[0]
    Lt, d = pl.pallas_call(
        _panel_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, n), A.dtype),
            jax.ShapeDtypeStruct((1, n), A.dtype),
        ],
    )(A)
    return Lt.T, d[0]


# Trace-time opt-out for computations staged onto a non-default backend
# (e.g. a virtual CPU mesh in a process whose default backend is the TPU):
# jax.default_backend() reflects the process default, not the placement of
# the computation being traced, so callers targeting another platform flip
# this via disable_pallas().
_FORCE_DISABLE = False


class disable_pallas:
    """Context manager: force the plain-XLA fallback for code traced inside."""

    def __enter__(self):
        global _FORCE_DISABLE
        self._prev = _FORCE_DISABLE
        _FORCE_DISABLE = True
        return self

    def __exit__(self, *exc):
        global _FORCE_DISABLE
        _FORCE_DISABLE = self._prev
        return False


def _use_pallas(n: int) -> bool:
    if _FORCE_DISABLE:
        return False
    try:
        return n <= MAX_N and jax.default_backend() == "tpu"
    except Exception:
        return False


# ----------------------------------------------------------------------
# small-system dispatch — measurement-backed per shape.
#
# benchmarks/bench_lane_kernels.py, v5e f32, factor+solve wall (ms):
#
#     (B, n)        xla_unrolled   pallas_lane   winner
#     (2048, 16)          5.96          2.67     lane   (2.2x)
#     (8192, 16)         22.14          2.64     lane   (8.4x)
#     ( 128, 32)          2.82          2.52     lane
#     ( 512, 32)          4.27          2.48     lane   (1.7x)
#     (2048, 32)          8.90          2.73     lane   (3.3x)
#     (8192, 32)         45.57          4.44     lane  (10.3x)
#     ( 512, 36)          4.86          2.91     lane   (1.7x)
#     (2048, 36)         12.63          3.20     lane   (3.9x)
#     (8192, 36)         67.48          5.99     lane  (11.3x)
#     (2048, 40)         12.73          3.71     lane   (3.4x)
#     ( 512, 48)          4.86          2.96     lane   (1.6x)
#     (8192, 48)         68.71         10.25     lane   (6.7x)
#     ( 512, 64)             —          OOM      xla    (f32[64,64,128]
#                        blocks blow the 16M scoped-VMEM stack limit)
#
# The lane kernels win wherever they fit in scoped VMEM (n <= 48; n = 64
# overflows the 16M stack limit) and the batch fills at least one
# 128-lane grid step; the statically-unrolled XLA factorization +
# log-depth-inverse solve (ops/linalg.ldlt_factor_unrolled /
# ldlt_solve_inv) remain the fallback at larger n and on every other
# backend/dtype.  Dispatch below encodes exactly that crossover.
LANE_MAX_N = 64          # scoped-VMEM-safe lane-kernel system size
#   (was 48: the factor kernel carried separate A and L buffers; r3's
#   in-place variant halves the carry — n=64 compiles and is verified
#   accurate at B up to 2048; n=96 still exceeds the scoped-VMEM bound)
LANE_ALWAYS_N = 48       # measured always-wins bound (r03 lane sweep:
#   lane wins every batch size for n <= 48; at n = 64 it wins only for
#   very large batches — B=8192: 20.9 vs 24.3 ms; B=512-2048 the
#   unrolled XLA form is faster)
LANE_MIN_BATCH = LANE    # at least one full 128-lane grid step
LANE_N64_MIN_BATCH = 4096


def _lane_dispatch(n: int, batch: int, dtype) -> bool:
    if _FORCE_DISABLE:
        return False
    try:
        if dtype != jnp.float32 or jax.default_backend() != "tpu":
            return False
        if n <= LANE_ALWAYS_N:
            return batch >= LANE_MIN_BATCH
        return n <= LANE_MAX_N and batch >= LANE_N64_MIN_BATCH
    except Exception:
        return False


@jax.custom_batching.custom_vmap
def ldlt_factor_small(A):
    """LDL^T for n <= 128; single instances take the unrolled XLA form,
    batched (vmapped) calls dispatch per the measured crossover above."""
    L, d = _lin.ldlt_factor_unrolled(A[None])
    return L[0], d[0]


@ldlt_factor_small.def_vmap
def _factor_vmap_rule(axis_size, in_batched, A):
    (a_batched,) = in_batched
    assert a_batched
    if _lane_dispatch(A.shape[-1], axis_size, A.dtype):
        L, d = batched_ldlt_factor(A)
    else:
        L, d = _lin.ldlt_factor_unrolled(A)
    return (L, d), (True, True)


@jax.custom_batching.custom_vmap
def ldlt_solve_small(L, d, b):
    return _lin.ldlt_solve_inv(L, d, b)


@ldlt_solve_small.def_vmap
def _solve_vmap_rule(axis_size, in_batched, L, d, b):
    lb, db, bb = in_batched
    # broadcast any unbatched operand (shouldn't occur in the solver)
    if not (lb and db and bb):
        f = jax.vmap(
            _lin.ldlt_solve_inv,
            in_axes=tuple(0 if x else None for x in (lb, db, bb)))
        return f(L, d, b), True
    if _lane_dispatch(L.shape[-1], axis_size, L.dtype):
        return batched_ldlt_solve(L, d, b), True
    return _lin.ldlt_solve_inv(L, d, b), True


# ----------------------------------------------------------------------
# streaming backward block-substitution sweep (large unbatched systems)
#
# ldlt_solve_blocks' XLA form runs the superblock sweep as a fori_loop of
# separate fusions: measured ~1.3-1.5 ms of solve tax per reg_solve_kkt
# at K=4352 against a ~0.12 ms DMA floor (the sweep reads the factor
# once).  This kernel runs the WHOLE backward sweep as one pallas_call:
# the grid iterates (superblock k descending, row-chunk c ascending) —
# sequential on TPU — streaming (R, SB) slabs of the factor through VMEM
# while the rhs/solution vectors and the running accumulator stay
# resident.  Per step k:
#
#     x[k] = invb[k]^T (z[k] - sum_{rows >= (k+1) SB} Lp[rows, k-cols]^T x[rows])
#
# with the inner sum accumulated chunk by chunk.  R divides SB, so
# chunks are never partially masked.
def _bwd_sweep_kernel(z_ref, lp_ref, invb_ref, x_ref, acc_ref, *,
                      R, SB, nb, nchunk):
    k_rev = pl.program_id(0)
    c = pl.program_id(1)
    k = nb - 1 - k_rev
    # chunk row index after the clamped remap of the slab index_map:
    # only chunks at or above the first sub-diagonal row do real work;
    # the rest re-visit the same block (no DMA) and skip compute
    c0 = (k + 1) * (SB // R)
    row_chunk = jnp.minimum(c + c0, nchunk - 1)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(c + c0 <= nchunk - 1)
    def _accum():
        xc = x_ref[:, pl.ds(row_chunk * R, R)]      # (1, R) written by
        #                                             earlier (larger) k
        acc_ref[:] += jax.lax.dot_general(
            xc, lp_ref[:],                           # (1,R) x (R,SB)
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_ref.dtype)

    @pl.when(c == nchunk - 1)
    def _finish():
        t = z_ref[:, pl.ds(k * SB, SB)] - acc_ref[:]    # (1, SB)
        # invb[k]^T t  ==  (t @ invb[k])^T
        xk = jax.lax.dot_general(
            t, invb_ref[0],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=t.dtype)
        x_ref[:, pl.ds(k * SB, SB)] = xk


def _use_bwd_sweep(npad: int, sb: int, dtype) -> bool:
    if _FORCE_DISABLE:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if dtype != jnp.float32:
        return False
    R = _sweep_chunk(npad, sb)
    if R is None:
        return False
    return True


def _sweep_chunk(npad: int, sb: int):
    """Largest row-chunk height R (grid-step count is the latency driver)
    whose double-buffered slab + invb block + resident vectors fit VMEM."""
    for R in (1024, 512, 256, 128):
        if npad % R or sb % R:
            continue
        vm = 2 * sb * sb * 4 + 2 * R * sb * 4 + (3 * npad + sb) * 4
        if vm < 14 * 1024 * 1024:
            return R
    return None


@jax.custom_batching.custom_vmap
def bwd_sweep_blocks(Lp, z, invb):
    """Backward superblock substitution x with (L^T-part) x = z given the
    superblock inverses: the Pallas streaming sweep on TPU, the XLA
    fori_loop sweep elsewhere.  ``z`` is the already diagonal-scaled
    forward-substituted rhs (npad,); returns x (npad,)."""
    import functools

    nb, sb, _ = invb.shape
    npad = Lp.shape[0]
    if not _use_bwd_sweep(npad, sb, Lp.dtype):
        return _lin._bwd_sweep_xla(Lp, z, invb)
    R = _sweep_chunk(npad, sb)
    nchunk = npad // R
    kern = functools.partial(_bwd_sweep_kernel, R=R, SB=sb, nb=nb,
                             nchunk=nchunk)

    def slab_index(k, c, nb=nb, nchunk=nchunk, cpr=sb // R):
        # clamped remap: grid step (k, c) reads row chunk c + c0 where
        # c0 is the first sub-diagonal chunk of superblock nb-1-k;
        # steps past the end re-visit the last chunk (no fresh DMA) and
        # skip compute in the kernel — below-diagonal slabs are never
        # fetched at all
        kk = nb - 1 - k
        c0 = (kk + 1) * cpr
        return (jnp.minimum(c + c0, nchunk - 1), kk)

    x2 = pl.pallas_call(
        kern,
        grid=(nb, nchunk),
        in_specs=[
            # z resident (1, npad)
            pl.BlockSpec((1, npad), lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
            # factor column slab (row-chunk remapped, see slab_index)
            pl.BlockSpec((R, sb), slab_index,
                         memory_space=pltpu.VMEM),
            # superblock inverse for k
            pl.BlockSpec((1, sb, sb),
                         lambda k, c, nb=nb: (nb - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad), lambda k, c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), Lp.dtype),
        scratch_shapes=[pltpu.VMEM((1, sb), Lp.dtype)],
    )(z.reshape(1, npad), Lp, invb)
    return x2[0]


@bwd_sweep_blocks.def_vmap
def _bwd_sweep_vmap_rule(axis_size, in_batched, Lp, z, invb):
    axes = tuple(0 if b else None for b in in_batched)
    return jax.vmap(_lin._bwd_sweep_xla, in_axes=axes)(Lp, z, invb), True


# ----------------------------------------------------------------------
# streaming PANEL-level backward sweep (large unbatched systems)
#
# bwd_sweep_blocks consumes the assembled SUPERBLOCK inverses — whose
# blocked-triangular assembly costs ~112 tiny (nb2, 128, 128) einsums,
# measured ~1.2 ms per reg_solve_kkt call at K=4352 under 'highest'
# matmul precision (r5), i.e. far more than the sweep it feeds.  This
# kernel needs only the PANEL (128) inverses, which come from one
# batched log-depth chain (~0.2 ms): the within-superblock substitution
# that the superblock inverse pre-solved is instead performed ON-CHIP at
# finish time — g statically-unrolled (1,SB)x(SB,128) + (1,128)x(128,128)
# dots against the diagonal superblock held in a VMEM scratch.  The grid
# streams row chunks exactly like _bwd_sweep_kernel, except chunks of
# the DIAGONAL superblock are copied into the scratch instead of being
# accumulated (their contribution is resolved by the in-kernel
# substitution, where later panels' solutions exist).
def _bwd_sweep_panels_kernel(z_ref, lp_ref, invp_ref, x_ref, acc_ref,
                             diag_ref, *, R, SB, nsb, nchunk, block):
    k_rev = pl.program_id(0)
    c = pl.program_id(1)
    k = nsb - 1 - k_rev
    cpr = SB // R
    g = SB // block
    c0 = k * cpr                    # first chunk: the diagonal superblock
    rc = jnp.minimum(c + c0, nchunk - 1)

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # diagonal-superblock chunks: stash for the in-kernel substitution
    @pl.when(c < cpr)
    def _stash():
        diag_ref[pl.ds(c * R, R), :] = lp_ref[:]

    # strictly-below chunks: accumulate cross-superblock contributions
    @pl.when((c >= cpr) & (c + c0 <= nchunk - 1))
    def _accum():
        xc = x_ref[:, pl.ds(rc * R, R)]          # written by larger k
        acc_ref[:] += jax.lax.dot_general(
            xc, lp_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=acc_ref.dtype)

    @pl.when(c + c0 == nchunk - 1)
    def _finish():
        # within-superblock backward substitution, statically unrolled:
        # after solving panel j, its contribution L[j, :j]^T x_j is
        # subtracted from the REMAINING prefix of the rhs (all static
        # slices/concats — Mosaic has no scatter for value updates)
        cur = z_ref[:, pl.ds(k * SB, SB)] - acc_ref[:]   # (1, SB)
        parts = []
        for j in range(g - 1, -1, -1):
            tj = cur[:, j * block:(j + 1) * block]
            # x_j = invp_j^T t_j  (row form: t_j @ invp_j)
            xj = jax.lax.dot_general(
                tj, invp_ref[j], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=cur.dtype)
            parts.insert(0, xj)
            if j > 0:
                contrib = jax.lax.dot_general(
                    xj, diag_ref[j * block:(j + 1) * block, :j * block],
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=cur.dtype)
                cur = jnp.concatenate(
                    [cur[:, :j * block] - contrib, cur[:, j * block:]],
                    axis=1)
        x_ref[:, pl.ds(k * SB, SB)] = jnp.concatenate(parts, axis=1)


def _panel_sweep_geometry(npad: int, block: int):
    """(SB, R) for the panel sweep: the largest superblock width whose
    diagonal scratch + double-buffered slab + panel-inverse block fit the
    ~16 MB VMEM budget, and the largest row chunk under it."""
    for SB in (1024, 512, 256):
        if npad % SB or SB % block:
            continue
        for R in (512, 256, 128):
            if SB % R or npad % R:
                continue
            g = SB // block
            vm = (2 * R * SB * 4            # slab, double-buffered
                  + SB * SB * 4             # diagonal scratch
                  + 2 * g * block * block * 4   # invp block, buffered
                  + (3 * npad + SB) * 4)
            if vm < 14 * 1024 * 1024:
                return SB, R
    return None, None


def _use_panel_sweep(npad: int, block: int, dtype) -> bool:
    if _FORCE_DISABLE:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if dtype != jnp.float32:
        return False
    return _panel_sweep_geometry(npad, block)[0] is not None


def _bwd_sweep_panels_pallas(Lp, z, invp, SB, R):
    """The pallas_call form of the panel sweep at explicit geometry
    (separated from the dispatching wrapper so interpret-mode tests can
    drive the kernel body off-TPU)."""
    import functools

    nbp, block, _ = invp.shape
    npad = Lp.shape[0]
    nsb = npad // SB
    nchunk = npad // R
    g = SB // block
    kern = functools.partial(_bwd_sweep_panels_kernel, R=R, SB=SB,
                             nsb=nsb, nchunk=nchunk, block=block)

    def slab_index(k, c, nsb=nsb, nchunk=nchunk, cpr=SB // R):
        kk = nsb - 1 - k
        return (jnp.minimum(c + kk * cpr, nchunk - 1), kk)

    x2 = pl.pallas_call(
        kern,
        grid=(nsb, nchunk),
        in_specs=[
            pl.BlockSpec((1, npad), lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, SB), slab_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, block, block),
                         lambda k, c, nsb=nsb: (nsb - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad), lambda k, c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), Lp.dtype),
        scratch_shapes=[pltpu.VMEM((1, SB), Lp.dtype),
                        pltpu.VMEM((SB, SB), Lp.dtype)],
    )(z.reshape(1, npad), Lp, invp)
    return x2[0]


@jax.custom_batching.custom_vmap
def bwd_sweep_panels(Lp, z, invp):
    """Backward substitution x with (L^T-part) x = z given only the PANEL
    inverses invp (nbp, block, block): the Pallas streaming sweep on TPU,
    the XLA block-level fori sweep elsewhere.  ``z`` is the already
    diagonal-scaled forward-substituted rhs (npad,); returns x (npad,)."""
    nbp, block, _ = invp.shape
    npad = Lp.shape[0]
    assert nbp * block == npad
    if not _use_panel_sweep(npad, block, Lp.dtype):
        return _lin._bwd_sweep_panels_xla(Lp, z, invp)
    SB, R = _panel_sweep_geometry(npad, block)
    return _bwd_sweep_panels_pallas(Lp, z, invp, SB, R)


@bwd_sweep_panels.def_vmap
def _bwd_sweep_panels_vmap_rule(axis_size, in_batched, Lp, z, invp):
    axes = tuple(0 if b else None for b in in_batched)
    return (jax.vmap(_lin._bwd_sweep_panels_xla, in_axes=axes)(Lp, z, invp),
            True)
