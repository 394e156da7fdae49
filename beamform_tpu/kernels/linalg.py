"""Batched small-matrix linear algebra tuned for TPU.

XLA lowers ``jnp.linalg.inv`` through LAPACK-style pivoted LU + triangular
solves — hundreds of ms for tens of thousands of 16x16 matrices on TPU
(row pivoting serializes). The MVDR/LCMV matrices are Hermitian positive
(semi)definite after the reference's 1.001 diagonal loading (mvdr.cpp:87),
so an unpivoted Gauss-Jordan elimination is numerically safe and fully
vectorizes over the batch: M steps of rank-1 updates, every step a handful
of (B, M, M) elementwise ops (complex supported natively by the VPU).

Singular inputs (the cold-start covariance) produce inf/NaN like the
reference's Eigen ``.inverse()`` garbage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gauss_jordan_inv(a):
    """Batched matrix inverse via unpivoted Gauss-Jordan.

    a: (..., M, M) real or complex, diagonally dominant / HPD.
    ~100x faster than jnp.linalg.inv for large batches of small matrices
    on TPU; matches it to ~1e-6 relative on well-conditioned inputs.
    """
    m = a.shape[-1]
    inv0 = jnp.broadcast_to(jnp.eye(m, dtype=a.dtype), a.shape)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def step(i, carry):
        mat, inv = carry
        prow = jax.lax.dynamic_slice_in_dim(mat, i, 1, axis=-2)
        pirow = jax.lax.dynamic_slice_in_dim(inv, i, 1, axis=-2)
        piv = jax.lax.dynamic_slice_in_dim(prow, i, 1, axis=-1)
        prow = prow / piv
        pirow = pirow / piv
        col = jax.lax.dynamic_slice_in_dim(mat, i, 1, axis=-1)  # (.., M, 1)
        is_pivot_row = row_ids == i                             # (M, 1)
        factor = jnp.where(is_pivot_row, 0, col)
        mat = mat - factor * prow
        inv = inv - factor * pirow
        mat = jnp.where(is_pivot_row, prow, mat)
        inv = jnp.where(is_pivot_row, pirow, inv)
        return mat, inv

    _, inv = jax.lax.fori_loop(0, m, step, (a, inv0))
    return inv


# ---------------------------------------------------------------------------
# Pallas batched complex Gauss-Jordan: matrices live batch-on-lanes so the
# whole elimination stays in VMEM/registers. The jnp version above reads and
# writes the full (B, M, M) tensors from HBM on every elimination step
# (~2*M passes); this kernel reads each matrix once and writes its inverse
# once — ~M x less HBM traffic, which is the entire cost at these sizes.
# Layout: (M, M, B) real + imag planes; each (i, j) entry is a lane vector
# of TILE matrices, so every elimination step is pure elementwise VPU work
# with static indexing (no Mosaic relayouts).
# ---------------------------------------------------------------------------

_GJ_TILE = 512


def _gj_kernel(ar_ref, ai_ref, or_ref, oi_ref, mr_ref, mi_ref, *, m: int,
               polish: bool = True):
    # State lives in refs: Mosaic cannot row-slice a *computed* value with a
    # broadcast-derived layout, but slicing VMEM refs is always legal.
    tile = ar_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, m, tile), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, m, tile), 1)
    mr_ref[:] = ar_ref[:]
    mi_ref[:] = ai_ref[:]
    or_ref[:] = jnp.where(rows == cols, 1.0, 0.0).astype(ar_ref.dtype)
    oi_ref[:] = jnp.zeros((m, m, tile), dtype=ar_ref.dtype)

    for i in range(m):
        vr = mr_ref[i:i + 1, i:i + 1, :]
        vi = mi_ref[i:i + 1, i:i + 1, :]
        inv_den = 1.0 / (vr * vr + vi * vi)
        # normalized pivot rows: row_i / pivot (complex division)
        prr = (mr_ref[i:i + 1] * vr + mi_ref[i:i + 1] * vi) * inv_den
        pri = (mi_ref[i:i + 1] * vr - mr_ref[i:i + 1] * vi) * inv_den
        qrr = (or_ref[i:i + 1] * vr + oi_ref[i:i + 1] * vi) * inv_den
        qri = (oi_ref[i:i + 1] * vr - or_ref[i:i + 1] * vi) * inv_den

        is_piv = rows == i
        fr = jnp.where(is_piv, 0.0, mr_ref[:, i:i + 1, :])
        fi = jnp.where(is_piv, 0.0, mi_ref[:, i:i + 1, :])
        # mat -= factor * pivot_row  (complex), pivot row := normalized
        mr_ref[:] = jnp.where(is_piv, prr,
                              mr_ref[:] - (fr * prr - fi * pri))
        mi_ref[:] = jnp.where(is_piv, pri,
                              mi_ref[:] - (fr * pri + fi * prr))
        or_ref[:] = jnp.where(is_piv, qrr,
                              or_ref[:] - (fr * qrr - fi * qri))
        oi_ref[:] = jnp.where(is_piv, qri,
                              oi_ref[:] - (fr * qri + fi * qrr))

    # Newton-Schulz polish in-kernel (X <- X (2I - A X)): per-matrix matmuls
    # as k-loops of ref-sliced rank-1 updates — everything stays in VMEM.
    # Skipped when the caller refines at the application site instead
    # (x = X d; x += X (d - A x) is algebraically X(2I-AX) d at M^2 cost).
    if not polish:
        return
    tr = jnp.where(rows == cols, 2.0, 0.0).astype(ar_ref.dtype)
    ti = jnp.zeros((m, m, tile), dtype=ar_ref.dtype)
    for kk in range(m):
        acr = ar_ref[:, kk:kk + 1, :]
        aci = ai_ref[:, kk:kk + 1, :]
        xrr = or_ref[kk:kk + 1, :, :]
        xri = oi_ref[kk:kk + 1, :, :]
        tr = tr - (acr * xrr - aci * xri)
        ti = ti - (acr * xri + aci * xrr)
    mr_ref[:] = tr     # reuse the elimination scratch for T = 2I - A X
    mi_ref[:] = ti
    xr = jnp.zeros((m, m, tile), dtype=ar_ref.dtype)
    xi = jnp.zeros((m, m, tile), dtype=ar_ref.dtype)
    for kk in range(m):
        xcr = or_ref[:, kk:kk + 1, :]
        xci = oi_ref[:, kk:kk + 1, :]
        trr = mr_ref[kk:kk + 1, :, :]
        tri = mi_ref[kk:kk + 1, :, :]
        xr = xr + (xcr * trr - xci * tri)
        xi = xi + (xcr * tri + xci * trr)
    or_ref[:] = xr
    oi_ref[:] = xi


def gj_inverse_pallas_native(a, tile: int = _GJ_TILE,
                             interpret: bool = False, polish: bool = True):
    """Batched complex inverse in the kernel's native (M, M, B) layout —
    producers that already emit batch-on-lanes skip the big transposes.

    ``polish=False`` skips the in-kernel Newton step (two M^3 matmuls);
    callers that apply the inverse to a right-hand side get the identical
    result from one M^2 refinement step at the application site.
    """
    m, _, b = a.shape
    bp = -(-b // tile) * tile
    ar, ai = a.real, a.imag
    if bp != b:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=ar.dtype)[:, :, None],
                               (m, m, bp - b))
        ar = jnp.concatenate([ar, eye], axis=-1)
        ai = jnp.concatenate([ai, jnp.zeros_like(eye)], axis=-1)
    kernel = functools.partial(_gj_kernel, m=m, polish=polish)
    spec = pl.BlockSpec((m, m, tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((m, m, bp), ar.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((m, m, tile), jnp.float32)] * 2,
        interpret=interpret,
    )(ar, ai)
    return jax.lax.complex(outr[:, :, :b], outi[:, :, :b])


def gj_inverse_pallas(a, tile: int = _GJ_TILE, interpret: bool = False,
                      polish: bool = True):
    """Batched complex inverse on TPU: a (B, M, M) complex64 -> (B, M, M).

    Pads B to a tile multiple (identity padding keeps the padded lanes
    numerically quiet) and runs the lane-parallel Gauss-Jordan kernel.
    ``polish=False``: see :func:`gj_inverse_pallas_native`.
    """
    b, m, _ = a.shape
    bp = -(-b // tile) * tile
    ar = jnp.moveaxis(a.real, 0, -1)
    ai = jnp.moveaxis(a.imag, 0, -1)           # (M, M, B)
    if bp != b:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=ar.dtype)[:, :, None],
                               (m, m, bp - b))
        ar = jnp.concatenate([ar, eye], axis=-1)
        ai = jnp.concatenate([ai, jnp.zeros_like(eye)], axis=-1)

    kernel = functools.partial(_gj_kernel, m=m, polish=polish)
    spec = pl.BlockSpec((m, m, tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        kernel,
        grid=(bp // tile,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((m, m, bp), ar.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((m, m, tile), jnp.float32)] * 2,
        interpret=interpret,
    )(ar, ai)
    out = jax.lax.complex(outr[:, :, :b], outi[:, :, :b])
    return jnp.moveaxis(out, -1, 0)
