"""Batched Gauss-Jordan inverse kernels (kernels/linalg.py).

The Pallas kernels replace Eigen's per-bin ``.inverse()`` (mvdr.cpp:88,
lcmv.cpp:116); run here in interpret mode on the CPU mesh.
"""

import numpy as np
import jax.numpy as jnp

from beamform_tpu.kernels.linalg import (
    gauss_jordan_inv, gj_inverse_pallas, gj_inverse_pallas_native)


def make_hpd(b, m, seed=0, cond_boost=2.0):
    rng = np.random.default_rng(seed)
    a = (rng.standard_normal((b, m, m))
         + 1j * rng.standard_normal((b, m, m)))
    h = a @ a.conj().transpose(0, 2, 1) / m
    return (h + cond_boost * np.eye(m)).astype(np.complex64)


def test_gauss_jordan_inv_f64_matches_numpy():
    a = make_hpd(32, 16, seed=1).astype(np.complex128)
    inv = np.asarray(gauss_jordan_inv(jnp.asarray(a)))
    ref = np.linalg.inv(a)
    assert np.max(np.abs(inv - ref)) < 1e-10


def test_gj_pallas_polished_inverse():
    a = make_hpd(700, 16, seed=2)          # forces tile padding (700 < 512*2)
    inv = np.asarray(gj_inverse_pallas(jnp.asarray(a), interpret=True))
    prod = np.einsum("bmk,bkn->bmn", a, inv)
    eye = np.eye(16)[None]
    assert np.max(np.abs(prod - eye)) < 1e-4


def test_gj_pallas_native_layout_matches_batch_first():
    a = make_hpd(512, 8, seed=3)
    inv_bf = np.asarray(gj_inverse_pallas(jnp.asarray(a), interpret=True))
    an = jnp.moveaxis(jnp.asarray(a), 0, -1)           # (M, M, B)
    inv_nat = np.asarray(gj_inverse_pallas_native(an, interpret=True))
    assert np.max(np.abs(np.moveaxis(inv_nat, -1, 0) - inv_bf)) < 1e-6


def test_rhs_refinement_equals_newton_polish():
    """x = X d; x += X (d - A x) must reproduce X(2I - AX) d — the identity
    that lets mvdr_solve/lcmv_solve skip the in-kernel M^3 Newton step."""
    a = make_hpd(512, 16, seed=4, cond_boost=0.05)     # poorly conditioned
    aj = jnp.asarray(a)
    rng = np.random.default_rng(5)
    d = (rng.standard_normal((512, 16))
         + 1j * rng.standard_normal((512, 16))).astype(np.complex64)
    dj = jnp.asarray(d)

    polished = gj_inverse_pallas(aj, interpret=True, polish=True)
    x_newton = np.asarray(jnp.einsum("bmk,bk->bm", polished, dj))

    raw = gj_inverse_pallas(aj, interpret=True, polish=False)
    x0 = jnp.einsum("bmk,bk->bm", raw, dj)
    resid = dj - jnp.einsum("bmk,bk->bm", aj, x0)
    x_refined = np.asarray(x0 + jnp.einsum("bmk,bk->bm", raw, resid))

    scale = np.max(np.abs(x_newton))
    assert np.max(np.abs(x_refined - x_newton)) < 1e-5 * scale
    # and the refined solution is a genuine solve of the system
    x_ref64 = np.linalg.solve(a.astype(np.complex128),
                              d.astype(np.complex128)[..., None])[..., 0]
    assert np.max(np.abs(x_refined - x_ref64)) < 1e-4 * scale
